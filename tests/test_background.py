"""Plane background model (--bgmodel plane): unit oracles + CLI cycle.

Reference: mvs_utils.py:379-407 (ray-plane cross), set_bg
(mvs_points_volumetric_model.py:305-343), fill_invalid blending
(neural_points_volumetric_model.py:175-177), create_all_bg
(run/train_ft.py:559-586). The reference path itself is unrunnable there
(needs the unshipped dtu_ft dataset + dtu_test_ground.txt), so these pin
our implementation with geometric/synthetic oracles instead of module
parity.
"""
import os
import subprocess
import sys
import types

import numpy as np
import pytest

from tests.test_dtu_dataset import dtu_tree, _opt  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rayplane_cross_geometry():
    from sgnerf_tpu.models.background import rayplane_cross
    rng = np.random.default_rng(0)
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    p_co = np.array([0.1, -0.2, 2.0], np.float32)
    p_no = np.array([0.1, 0.2, 0.95], np.float32)     # not normalized
    raydir = rng.normal(size=(64, 3)).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    out = np.asarray(rayplane_cross(campos, raydir, p_co, p_no))
    dot = (raydir * p_no).sum(-1)
    hit = dot >= 1e-3
    assert hit.any() and (~hit).any()
    # rays facing away from / parallel to the plane return zeros
    # (reference one-sided test, mvs_utils.py:398)
    np.testing.assert_array_equal(out[~hit], 0.0)
    # hits lie ON the plane and ALONG their ray
    on_plane = ((out[hit] - p_co) * p_no).sum(-1)
    np.testing.assert_allclose(on_plane, 0.0, atol=1e-4)
    t = ((out[hit] - campos) * raydir[hit]).sum(-1)
    recon = campos + raydir[hit] * t[:, None]
    np.testing.assert_allclose(recon, out[hit], atol=1e-4)


def test_plane_bg_colors_synthetic_view():
    """One source view with a plane-colored image: in-frame plane points
    pick up the plane color; a differently-colored region fails the fit
    filter; pixels covered by the neural cloud are suppressed."""
    from sgnerf_tpu.models.background import plane_bg_colors
    H, W = 32, 40
    plane_color = np.array([0.6, 0.4, 0.2], np.float32)
    img = np.broadcast_to(plane_color, (H, W, 3)).copy()
    img[:, :12] = 0.95                     # a non-plane-colored band
    intr = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]],
                    np.float32)
    w2c = np.eye(4, dtype=np.float32)      # camera at origin looking +z

    pts = np.array([
        [0.0, 0.0, 2.0],                   # center -> plane color
        [-1.1, 0.0, 2.0],                  # lands in the 0.95 band -> 0
        [0.5, 0.3, 2.0],                   # fg-suppressed below
        [9.0, 9.0, 2.0],                   # far out of frame -> 0
        [0.0, 0.0, 0.0],                   # "no intersection" row -> 0
    ], np.float32)
    # a cloud point projecting onto pts[2]'s pixel
    fg_xyz = pts[2:3] + np.array([[0, 0, 0.001]], np.float32)

    out = np.asarray(plane_bg_colors(
        pts, img[None], w2c[None], intr[None], plane_color, fg_xyz=fg_xyz))
    np.testing.assert_allclose(out[0], plane_color, atol=1e-3)
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[2], 0.0)
    np.testing.assert_array_equal(out[3], 0.0)
    np.testing.assert_array_equal(out[4], 0.0)

    # without the fg cloud, pts[2] picks up the plane color
    out2 = np.asarray(plane_bg_colors(
        pts, img[None], w2c[None], intr[None], plane_color))
    np.testing.assert_allclose(out2[2], plane_color, atol=1e-3)


def test_dtu_ft_plane_params(dtu_tree):  # noqa: F811
    """DtuFtDataset attaches the vendored plane table when --bgmodel plane
    (pointnerf/data/dtu_ft_dataset.py:732-735,894-899) with the index from
    data_root/dtu_test_ground.txt."""
    from sgnerf_tpu.data.dtu_ft_dataset import DtuFtDataset, _PLANE_PNT

    o = _opt(dtu_tree)
    o.bgmodel = "no"
    item = DtuFtDataset(o).get_item(0)
    assert "plane_pnt" not in item

    o.bgmodel = "plane"
    item = DtuFtDataset(o).get_item(0)
    np.testing.assert_allclose(item["plane_pnt"], _PLANE_PNT[0])
    assert item["plane_color"].shape == (3,)

    with open(os.path.join(dtu_tree, "dtu_test_ground.txt"), "w") as f:
        f.write("scan7 2\nscan1 1\n")
    item = DtuFtDataset(o).get_item(0)
    np.testing.assert_allclose(item["plane_pnt"], _PLANE_PNT[1])


def _run(script, args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run", script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


DTU_COMMON = [
    "--scan", "scan1", "--dataset_name", "dtu_ft",
    "--img_wh", "64", "48", "--train_step", "5",
    "--random_sample", "random", "--random_sample_size", "8",
    "--which_ray_generation", "near_far_linear",
    "--which_render_func", "radiance", "--which_blend_func", "alpha",
    "--which_tonemap_func", "off",
    "--near_plane", "2.0", "--far_plane", "4.0",
    "--z_depth_dim", "32", "--SR", "4", "--K", "2", "--P", "8",
    "--max_o", "40000", "--vsize", "0.1", "0.1", "0.1",
    "--vscale", "2", "2", "2", "--kernel_size", "3", "3", "3",
    "--radius_limit_scale", "4", "--agg_dist_pers", "20",
    "--agg_distance_kernel", "linear", "--agg_intrp_order", "2",
    "--point_features_dim", "32", "--num_feat_freqs", "3",
    "--dist_xyz_freq", "5", "--num_viewdir_freqs", "4",
    "--act_type", "LeakyReLU", "--shading_color_mlp_layer", "4",
    "--shading_feature_mlp_layer1", "2", "--act_super", "1",
    "--color_loss_items", "ray_masked_coarse_raycolor", "coarse_raycolor",
    "--color_loss_weights", "1.0", "0.0",
    "--lr", "0.001", "--plr", "0.002",
    "--lr_policy", "iter_exponential_decay",
    "--lr_decay_iters", "1000000", "--raydist_mode_unit", "1",
    "--bg_color", "black", "--vox_res", "0", "--load_points", "2",
    "--ranges", "-10", "-10", "-10", "10", "10", "10",
    "--wcoord_query", "1", "--bgmodel", "plane", "--dir_norm", "1",
]


@pytest.mark.slow
def test_train_ft_cli_plane_background(dtu_tree, tmp_path):  # noqa: F811
    """--bgmodel plane end-to-end on the DTU layout: per-frame backgrounds
    precomputed, bg_ray threads into the train step, and test_ft renders
    with the per-ray background swap."""
    args = ["--name", "plane", "--data_root", dtu_tree,
            "--checkpoints_dir", str(tmp_path),
            "--maximum_step", "4", "--save_iter_freq", "4",
            "--test_freq", "0", "--print_freq", "2", "--test_num", "1",
            ] + DTU_COMMON
    r = _run("train_ft.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "[bgmodel] plane backgrounds" in r.stdout, r.stdout[-2000:]
    assert "training done" in r.stdout

    r2 = _run("test_ft.py", [
        "--name", "plane", "--data_root", dtu_tree,
        "--checkpoints_dir", str(tmp_path), "--resume_iter", "latest",
        "--test_num_step", "1"] + DTU_COMMON)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mean psnr" in r2.stdout
