"""CLI surface tests: the actual run/ scripts execute end-to-end on the
synthetic scene (subprocess, CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_e2e_scannet import scene_dir  # noqa: F401  (fixture reuse)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run", script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


COMMON = [
    "--scan", "scene_test", "--dataset_name", "scannet_ft",
    "--img_wh", "48", "36", "--train_step", "2",
    "--random_sample", "random", "--random_sample_size", "8",
    "--which_ray_generation", "near_far_linear",
    "--which_render_func", "radiance", "--which_blend_func", "alpha",
    "--which_tonemap_func", "off",
    "--near_plane", "1.0", "--far_plane", "5.0",
    "--z_depth_dim", "32", "--SR", "4", "--K", "2", "--P", "8",
    "--max_o", "40000", "--vsize", "0.08", "0.08", "0.08",
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
    "--bg_color", "white", "--edge_filter", "2", "--vox_res", "0",
    "--ranges", "-10", "-10", "-10", "10", "10", "10",
    "--wcoord_query", "1",
]


@pytest.mark.slow
def test_train_ft_cli_then_test_ft_cli(scene_dir, tmp_path):  # noqa: F811
    args = ["--name", "cli", "--data_root", scene_dir,
            "--checkpoints_dir", str(tmp_path),
            "--maximum_step", "4", "--save_iter_freq", "4",
            "--test_freq", "0", "--print_freq", "2", "--test_num", "1",
            ] + COMMON
    r = _run("train_ft.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "training done" in r.stdout

    ckpts = [f for f in os.listdir(tmp_path / "cli")
             if f.endswith("_net_ray_marching.npz")]
    assert ckpts, os.listdir(tmp_path / "cli")

    r2 = _run("test_ft.py", [
        "--name", "cli", "--data_root", scene_dir,
        "--checkpoints_dir", str(tmp_path), "--resume_iter", "latest",
        "--test_num_step", "3"] + COMMON)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mean psnr" in r2.stdout
    # scores.txt written by report_metrics
    import glob
    assert glob.glob(str(tmp_path / "cli" / "images" / "test_*" /
                         "scores.txt"))


@pytest.mark.slow
def test_train_ft_cli_ray_shards_matches_unsharded(scene_dir, tmp_path):  # noqa: F811
    """--ray_shards routes training through parallel/sharded.py (ray-DP over
    the 8-device CPU mesh); with the deterministic loader (--n_threads 0)
    the printed losses match the unsharded run (SURVEY §2.6 /
    neural_points_volumetric_model.py:238-245)."""
    import re

    def losses_of(stdout):
        return [float(m.group(1))
                for m in re.finditer(r"total: ([0-9.]+)", stdout)]

    base = ["--data_root", scene_dir, "--maximum_step", "4",
            "--save_iter_freq", "4", "--test_freq", "0", "--print_freq", "1",
            "--test_num", "0", "--n_threads", "0"] + COMMON
    r1 = _run("train_ft.py", ["--name", "dp0",
                              "--checkpoints_dir", str(tmp_path)] + base)
    assert r1.returncode == 0, r1.stderr[-3000:]
    r2 = _run("train_ft.py", ["--name", "dp8",
                              "--checkpoints_dir", str(tmp_path),
                              "--ray_shards", "-1"] + base)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "[ray_shards] rays shard over 8 devices" in r2.stdout
    l1, l2 = losses_of(r1.stdout), losses_of(r2.stdout)
    assert len(l1) == len(l2) == 4
    np.testing.assert_allclose(l1, l2, rtol=2e-4)


@pytest.mark.slow
def test_train_ft_cli_perspective_querier(scene_dir, tmp_path):  # noqa: F811
    """--wcoord_query 0 routes train+eval through the perspective-space
    querier (reference query_point_indices.py via neural_points.py:426);
    the run must actually hit points (ray_masked loss active), not fall
    back to background."""
    import re
    args = ["--name", "pers", "--data_root", scene_dir,
            "--checkpoints_dir", str(tmp_path),
            "--maximum_step", "4", "--save_iter_freq", "4",
            "--test_freq", "0", "--print_freq", "1", "--test_num", "1",
            ] + COMMON + ["--wcoord_query", "0"]
    r = _run("train_ft.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "perspective frustum grid" in r.stdout
    assert "training done" in r.stdout
    masked = [float(m.group(1)) for m in re.finditer(
        r"ray_masked_coarse_raycolor: ([0-9.]+)", r.stdout)]
    assert masked and any(v > 0 for v in masked)

    r2 = _run("test_ft.py", [
        "--name", "pers", "--data_root", scene_dir,
        "--checkpoints_dir", str(tmp_path), "--resume_iter", "latest",
        "--test_num_step", "3"] + COMMON + ["--wcoord_query", "0"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mean psnr" in r2.stdout


@pytest.mark.slow
def test_train_ft_cli_yuze_variant(scene_dir, tmp_path):  # noqa: F811
    """--which_agg_model viewmlp_yuze trains and evaluates end-to-end: the
    yuze aggregator variant (point_aggregators_yuze.py — block4 angle
    features, alpha from feat_branch) is live through options ->
    configs_from_opt -> train step -> checkpoint -> test_ft."""
    args = ["--name", "yuze", "--data_root", scene_dir,
            "--checkpoints_dir", str(tmp_path),
            "--maximum_step", "4", "--save_iter_freq", "4",
            "--test_freq", "0", "--print_freq", "2", "--test_num", "1",
            "--which_agg_model", "viewmlp_yuze",
            "--shading_feature_mlp_layer4", "1",
            "--shading_feature_mlp_linear", "1",
            "--point_conf_mode", "1", "--point_color_mode", "1",
            "--point_dir_mode", "1",
            ] + COMMON
    r = _run("train_ft.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "training done" in r.stdout

    r2 = _run("test_ft.py", [
        "--name", "yuze", "--data_root", scene_dir,
        "--checkpoints_dir", str(tmp_path), "--resume_iter", "latest",
        "--test_num_step", "3",
        "--which_agg_model", "viewmlp_yuze",
        "--shading_feature_mlp_layer4", "1",
        "--shading_feature_mlp_linear", "1",
        "--point_conf_mode", "1", "--point_color_mode", "1",
        "--point_dir_mode", "1"] + COMMON)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mean psnr" in r2.stdout
