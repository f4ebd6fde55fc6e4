"""TPU CLI smoke: the actual run/train_ft.py + run/test_ft.py subprocesses
on the REAL TPU backend (the pytest CLI suite forces JAX_PLATFORMS=cpu).

Catches TPU-only breakage of shipped defaults — e.g. --attr_dedup auto
resolves to 512 on TPU and routes every eval render through the dedup'd
two-level gather; fused_mlp/fused_bwd/knn auto-resolve to the Pallas
kernels. A tiny synthetic ScanNet-layout scene keeps compiles quick.
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = "/root/repo"
sys.path.insert(0, REPO)


def build_scene(root):
    from PIL import Image
    from sgnerf_tpu.utils.ply import write_ply

    rng = np.random.default_rng(0)
    scan = os.path.join(root, "scene_test", "exported")
    for sub in ("color", "pose", "label", "intrinsic", "depth"):
        os.makedirs(os.path.join(scan, sub), exist_ok=True)
    W, H = 48, 36
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    for f in ("intrinsic_color.txt", "intrinsic_depth.txt"):
        np.savetxt(os.path.join(scan, "intrinsic", f),
                   np.eye(4) + np.pad(intr - np.eye(3), ((0, 1), (0, 1))))
    n = 800
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgb = np.clip(xyz * 0.5 + 0.5, 0, 1)
    write_ply(os.path.join(scan, "pcd.ply"),
              {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
               "red": (rgb[:, 0] * 255).astype(np.uint8),
               "green": (rgb[:, 1] * 255).astype(np.uint8),
               "blue": (rgb[:, 2] * 255).astype(np.uint8)})
    for i in range(6):
        ang = 2 * np.pi * i / 6
        campos = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)],
                          np.float32)
        fwd = -campos / np.linalg.norm(campos)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (right, upv, fwd,
                                                          campos)
        np.savetxt(os.path.join(scan, f"pose/{i}.txt"), c2w)
        img = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scan, f"color/{i}.jpg"))
        lbl = rng.integers(0, 40, size=(H, W)).astype(np.int32)
        Image.fromarray(lbl, mode="I").save(
            os.path.join(scan, f"label/{i}.png"))
        depth_mm = (np.full((H, W), 2.0, np.float32) * 1000).astype(
            np.uint16)
        Image.fromarray(depth_mm).save(os.path.join(scan, f"depth/{i}.png"))


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


def run(script, args, timeout=2400):
    env = dict(os.environ)          # PYTHONPATH keeps /root/.axon_site
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run", script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    print(f"--- {script} rc={r.returncode}")
    print(r.stdout[-1500:])
    if r.returncode != 0:
        print("STDERR:", r.stderr[-3000:])
        sys.exit(1)
    return r


tmp = tempfile.mkdtemp(prefix="tpu_cli_")
data = os.path.join(tmp, "scans") + "/"
os.makedirs(data, exist_ok=True)
build_scene(data)

run("train_ft.py", ["--name", "tpu_smoke", "--data_root", data,
                    "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                    "--maximum_step", "8", "--save_iter_freq", "8",
                    "--test_freq", "0", "--print_freq", "4",
                    # in-process probe growing (runtime/growing.py) on the
                    # real backend — round-5 session-2 fix coverage
                    "--prob_freq", "4", "--prob_num_step", "1",
                    "--prob_kernel_size", "3", "3", "3",
                    "--prob_tiers", "100",
                    "--test_num", "1"] + COMMON)
r2 = run("test_ft.py", ["--name", "tpu_smoke", "--data_root", data,
                        "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                        "--resume_iter", "latest",
                        "--test_num_step", "3"] + COMMON)
assert "mean psnr" in r2.stdout, "test_ft produced no psnr line"

run("render_vid.py", ["--name", "tpu_smoke", "--data_root", data,
                      "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                      "--resume_iter", "latest"] + COMMON)

# semantic training on the real backend (BPNet forward + the
# device-resident devoxelize + semantic-guided query)
run("train_ft.py", ["--name", "tpu_sem", "--data_root", data,
                    "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                    "--maximum_step", "4", "--save_iter_freq", "4",
                    "--test_freq", "0", "--print_freq", "2",
                    "--test_num", "0", "--predict_semantic", "1",
                    "--semantic_guidance", "1", "--classes", "20",
                    "--layers_2d", "18", "--bpnet_refresh_every", "2"]
    + COMMON)

# editing on the real backend with a PER-PART ROTATION (the per-neighbor
# Rw2c table gather + composed transform — VERDICT-r3 item 6; reference
# run/editing.py:123-237)
rot_txt = os.path.join(tmp, "ckpt", "tpu_smoke", "rot.txt")
th = 0.4
np.savetxt(rot_txt, np.array(
    [[np.cos(th), -np.sin(th), 0, 0.05], [np.sin(th), np.cos(th), 0, 0],
     [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
run("editing.py", ["--name", "tpu_smoke", "--data_root", data,
                   "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                   "--resume_iter", "latest",
                   "--resume_dir", os.path.join(tmp, "ckpt", "tpu_smoke"),
                   "--neural_points_names", "8_net_ray_marching.pth",
                   "--Transformation_names", "rot.txt",
                   "--render_stride", "6", "--test_num", "1"] + COMMON)

# feed-forward training (run/train.py: MVS nets generate the cloud INSIDE
# the autograd graph; MVSNet + premlp + aggregator train jointly)
run("train.py", ["--name", "tpu_ff", "--data_root", data,
                 "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                 "--maximum_step", "4", "--save_iter_freq", "4",
                 "--print_freq", "2", "--feedforward", "1"]
    + [a for a in COMMON] + ["--ranges", "-3", "-3", "-3", "3", "3", "3",
                             "--color_loss_items", "coarse_raycolor",
                             "--color_loss_weights", "1.0"])

# yuze aggregator variant (block4 angle features + block_linear + alpha
# from feat_branch; the un-fused XLA shading path on TPU)
run("train_ft.py", ["--name", "tpu_yuze", "--data_root", data,
                    "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                    "--maximum_step", "4", "--save_iter_freq", "4",
                    "--test_freq", "0", "--print_freq", "2",
                    "--test_num", "1",
                    "--which_agg_model", "viewmlp_yuze",
                    "--shading_feature_mlp_layer4", "1",
                    "--shading_feature_mlp_linear", "1",
                    "--point_conf_mode", "1", "--point_color_mode", "1",
                    "--point_dir_mode", "1"] + COMMON)

# MVS bootstrap branch B (train_ft --load_points 0: MVSNet depth
# inference -> cross-view filter -> per-view embedding; random-init nets,
# so the confidence/consistency filters are relaxed to keep points)
run("train_ft.py", ["--name", "tpu_mvs", "--data_root", data,
                    "--checkpoints_dir", os.path.join(tmp, "ckpt"),
                    "--maximum_step", "2", "--save_iter_freq", "2",
                    "--test_freq", "0", "--print_freq", "1",
                    "--test_num", "0", "--load_points", "0",
                    "--manual_depth_view", "1", "--init_view_num", "3",
                    "--depth_grid", "32", "--depth_conf_thresh", "0.0",
                    "--geo_cnsst_num", "0"] + COMMON)
print("TPU CLI SMOKE OK")
