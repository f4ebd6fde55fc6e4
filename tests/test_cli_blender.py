"""NeRF-synthetic (blender loader) CLI e2e with the perspective querier
(--wcoord_query 0) — the reference's default for its nerfsynth configs
(neural_points.py:426 selects query_point_indices.py when wcoord_query==0).
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lego_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("nerf") / "lego"
    root.mkdir()
    rng = np.random.default_rng(3)
    # cameras all on +z looking at the origin (identity rotation = OpenGL
    # -z forward), so every view sees the cloud
    for split, n in (("train", 3), ("test", 2)):
        frames = []
        (root / split).mkdir()
        for i in range(n):
            pose = np.eye(4)
            pose[:3, 3] = [0.08 * i, 0.05 * i, 4.0]
            fname = f"./{split}/r_{i}"
            img = (rng.uniform(0, 255, size=(32, 32, 4))).astype(np.uint8)
            Image.fromarray(img, "RGBA").save(root / split / f"r_{i}.png")
            frames.append({"file_path": fname,
                           "transform_matrix": pose.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    # pickled init cloud (reference load_blender_cloud format)
    xyz = rng.normal(size=(600, 3)).astype(np.float32)
    xyz = 0.6 * xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    with open(root / "cloud.pkl", "wb") as f:
        pickle.dump({"point_xyz": xyz}, f)
    return str(root.parent)


def _run(script, args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run", script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


@pytest.mark.slow
def test_train_ft_blender_perspective(lego_dir, tmp_path):
    common = [
        "--scan", "lego", "--dataset_name", "nerf_synth_ft",
        "--data_root", lego_dir, "--checkpoints_dir", str(tmp_path),
        "--cloud_path", os.path.join(lego_dir, "lego", "cloud.pkl"),
        "--num_point", "600",
        "--img_wh", "32", "32", "--random_sample", "random",
        "--random_sample_size", "8",
        "--which_ray_generation", "near_far_linear",
        "--which_render_func", "radiance", "--which_blend_func", "alpha",
        "--which_tonemap_func", "off",
        "--near_plane", "2.0", "--far_plane", "6.0",
        "--z_depth_dim", "40", "--SR", "4", "--K", "2", "--P", "10",
        "--max_o", "40000", "--vsize", "0.02", "0.02", "0.02",
        "--vscale", "2", "2", "2", "--kernel_size", "3", "3", "3",
        "--radius_limit_scale", "4", "--agg_dist_pers", "20",
        "--agg_distance_kernel", "linear", "--agg_intrp_order", "2",
        "--point_features_dim", "32", "--num_feat_freqs", "3",
        "--dist_xyz_freq", "5", "--num_viewdir_freqs", "4",
        "--act_type", "LeakyReLU", "--shading_color_mlp_layer", "4",
        "--shading_feature_mlp_layer1", "2", "--act_super", "1",
        "--color_loss_items", "ray_masked_coarse_raycolor",
        "ray_miss_coarse_raycolor", "coarse_raycolor",
        "--color_loss_weights", "1.0", "0.0", "0.0",
        "--zero_one_loss_items", "conf_coefficient",
        "--zero_one_loss_weights", "0.0001",
        "--lr", "0.001", "--plr", "0.002",
        "--lr_policy", "iter_exponential_decay",
        "--lr_decay_iters", "1000000", "--raydist_mode_unit", "1",
        "--bg_color", "white", "--vox_res", "0",
        "--ranges", "-10", "-10", "-10", "10", "10", "10",
        "--wcoord_query", "0", "--shpnt_jitter", "uniform",
    ]
    import re
    r = _run("train_ft.py", ["--name", "lego_pers",
                             "--maximum_step", "4", "--save_iter_freq", "4",
                             "--test_freq", "0", "--print_freq", "1",
                             "--test_num", "1"] + common)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "perspective frustum grid" in r.stdout
    assert "training done" in r.stdout
    masked = [float(m.group(1)) for m in re.finditer(
        r"ray_masked_coarse_raycolor: ([0-9.]+)", r.stdout)]
    assert masked and any(v > 0 for v in masked), r.stdout[-2000:]

    r2 = _run("test_ft.py", ["--name", "lego_pers", "--resume_iter",
                             "latest", "--test_num_step", "3"] + common)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mean psnr" in r2.stdout
