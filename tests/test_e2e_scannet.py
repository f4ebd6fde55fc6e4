"""End-to-end integration: synthetic ScanNet-format scene on disk ->
train_ft a few steps -> checkpoint -> test_ft-style eval -> reference .pth
export round-trip."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Build a tiny ScanNet-export-layout scene: a colored sphere cloud and
    cameras looking at it."""
    from PIL import Image
    from sgnerf_tpu.utils.ply import write_ply

    root = tmp_path_factory.mktemp("scans")
    scan = root / "scene_test" / "exported"
    for sub in ("color", "pose", "label", "intrinsic", "depth"):
        (scan / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    W, H = 48, 36
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    np.savetxt(scan / "intrinsic/intrinsic_color.txt", np.eye(4) * 1.0
               + np.pad(intr - np.eye(3), ((0, 1), (0, 1))))
    np.savetxt(scan / "intrinsic/intrinsic_depth.txt", np.eye(4) * 1.0
               + np.pad(intr - np.eye(3), ((0, 1), (0, 1))))

    n = 800
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgb = np.clip(xyz * 0.5 + 0.5, 0, 1)
    write_ply(str(scan / "pcd.ply"),
              {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
               "red": (rgb[:, 0] * 255).astype(np.uint8),
               "green": (rgb[:, 1] * 255).astype(np.uint8),
               "blue": (rgb[:, 2] * 255).astype(np.uint8)})

    n_views = 6
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        campos = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)],
                          np.float32)
        fwd = -campos / np.linalg.norm(campos)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, upv, fwd, campos
        np.savetxt(scan / f"pose/{i}.txt", c2w)
        img = (rng.uniform(0, 1, size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / f"color/{i}.jpg")
        lbl = rng.integers(0, 40, size=(H, W)).astype(np.int32)
        Image.fromarray(lbl, mode="I").save(scan / f"label/{i}.png")
        # depth in millimetres: roughly the sphere distance from this camera
        depth_m = np.full((H, W), 3.0, np.float32) - 1.0
        depth_mm = (depth_m * 1000).astype(np.uint16)
        Image.fromarray(depth_mm).save(scan / f"depth/{i}.png")
    return str(root) + "/"


def _opt(scene_dir, tmpdir, extra=()):
    sys.path.insert(0, os.path.join(REPO, "run"))
    from sgnerf_tpu.options import TrainOptions
    args = [
        "--name", "e2e", "--data_root", scene_dir, "--scan", "scene_test",
        "--dataset_name", "scannet_ft", "--checkpoints_dir", str(tmpdir),
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
        "--maximum_step", "6", "--save_iter_freq", "6",
        "--test_freq", "0", "--print_freq", "3",
        "--bg_color", "white", "--edge_filter", "2", "--vox_res", "0",
        "--ranges", "-10", "-10", "-10", "10", "10", "10",
        "--wcoord_query", "1",
    ] + list(extra)
    return TrainOptions().parse(args)


def test_train_and_eval_cycle(scene_dir, tmp_path):
    from sgnerf_tpu.data import create_dataset
    from sgnerf_tpu.runtime import SceneModel
    import run.train_ft as train_ft
    import jax

    opt = _opt(scene_dir, tmp_path)
    dataset = create_dataset(opt)
    assert len(dataset) == 3  # 6 views, every 2nd

    model = SceneModel(opt)
    assert model.resolve_resume() is None
    xyz, feats, labels = dataset.load_init_points()
    assert len(xyz) == 800 and feats is not None
    model.setup_from_points(xyz, feats, labels, dataset=dataset)

    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    losses0 = None
    for step in range(6):
        item = dataset.get_item(int(rng.integers(len(dataset))), rng=rng)
        batch = train_ft.make_batch(item)
        key, k = jax.random.split(key)
        losses = model.optimize(batch, k)
        if losses0 is None:
            losses0 = {k2: float(v) for k2, v in losses.items()}
    assert np.isfinite(float(losses["total"]))
    model.save_checkpoint(int(model.state.step))
    model.export_reference(int(model.state.step))

    # ---- reload native checkpoint into a fresh model and render a frame
    opt2 = _opt(scene_dir, tmp_path)
    opt2.split = "test"
    opt2.random_sample = "no_crop"
    test_ds = create_dataset(opt2)
    model2 = SceneModel(opt2)
    ckpt = model2.resolve_resume()
    assert ckpt and ckpt.endswith(".npz")
    model2.load_checkpoint(ckpt)
    item = test_ds.get_item(0, full_img=True)
    col = model2.render_image(item, chunk_rays=512)
    assert col.shape[1] == 3 and np.isfinite(col).all()

    # ---- the exported reference .pth reloads identically
    from sgnerf_tpu.models.checkpoint_io import (load_torch_state_dict,
                                                 convert_reference_checkpoint)
    pth = [f for f in os.listdir(model.expr_dir)
           if f.endswith("_net_ray_marching.pth")][0]
    sd = load_torch_state_dict(os.path.join(model.expr_dir, pth))
    params, pts = convert_reference_checkpoint(sd)
    act = np.asarray(model.state.cloud.active)
    np.testing.assert_allclose(pts["xyz"],
                               np.asarray(model.state.cloud.xyz)[act],
                               atol=1e-6)
    w_native = np.asarray(model.state.params["block1"][0]["w"])
    np.testing.assert_allclose(params["block1"][0]["w"], w_native, atol=1e-6)

    # ---- export writes the {iter}_states.pth companion (base_model.py:
    # 100-102) and it round-trips through our own reader
    from sgnerf_tpu.models.checkpoint_io import load_reference_states
    it = int(model.state.step)
    states_path = os.path.join(model.expr_dir, f"{it}_states.pth")
    assert os.path.exists(states_path)
    st = load_reference_states(states_path)
    assert int(st["total_steps"]) == it
    assert {"best_PSNR", "best_iter", "epoch_count"} <= set(st)


def test_growing_cycle(scene_dir, tmp_path):
    from sgnerf_tpu.data import create_dataset
    from sgnerf_tpu.runtime import SceneModel
    from sgnerf_tpu.runtime.growing import probe_and_grow
    import jax

    opt = _opt(scene_dir, tmp_path, extra=["--prob_num_step", "1",
                                           "--prob_mul", "0.5"])
    dataset = create_dataset(opt)
    model = SceneModel(opt)
    xyz, feats, labels = dataset.load_init_points()
    model.setup_from_points(xyz, feats, labels, dataset=dataset)
    n0 = int(model.state.cloud.n_active)
    grown = probe_and_grow(model, dataset, opt, jax.random.key(1),
                           opacity_thresh=0.0)
    n1 = int(model.state.cloud.n_active)
    assert n1 == n0 + grown
    # model still trains after growing
    import run.train_ft as train_ft
    item = dataset.get_item(0)
    losses = model.optimize(train_ft.make_batch(item), jax.random.key(2))
    assert np.isfinite(float(losses["total"]))


def test_semantic_training_cycle(scene_dir, tmp_path):
    """train_ft with predict_semantic=1: BPNet runs over the cloud, feeds
    per-point semantics + pixel labels into the semantic-guided step."""
    from sgnerf_tpu.data import create_dataset
    from sgnerf_tpu.runtime import SceneModel
    from sgnerf_tpu.runtime.semantic import SemanticDriver
    import run.train_ft as train_ft
    import jax

    opt = _opt(scene_dir, tmp_path, extra=[
        "--predict_semantic", "1", "--semantic_guidance", "1",
        "--shading_feature_mlp_layer2_bpnet", "1"])
    dataset = create_dataset(opt)
    model = SceneModel(opt)
    xyz, feats, labels = dataset.load_init_points()
    model.setup_from_points(xyz, feats, labels, dataset=dataset)

    sem = SemanticDriver(opt, key=jax.random.key(0))
    item = dataset.get_item(0, rng=np.random.default_rng(0))
    sem.maybe_refresh(model, dataset, item)
    pl = sem.pixel_labels_for(item)
    assert pl is not None and pl.shape == (64,)
    item["pixel_label"] = pl
    assert np.abs(np.asarray(model.state.cloud.sem_embedding)).sum() > 0

    batch = train_ft.make_batch(item)
    losses = model.optimize(batch, jax.random.key(1))
    assert np.isfinite(float(losses["total"]))


def test_get_init_item(scene_dir, tmp_path):
    from sgnerf_tpu.data import create_dataset
    opt = _opt(scene_dir, tmp_path, extra=["--init_view_num", "3"])
    ds = create_dataset(opt)
    item = ds.get_init_item(0)
    assert item["images"].shape == (3, 36, 48, 3)
    assert item["c2ws"].shape == (3, 4, 4)
    assert item["view_ids"][0] == ds.id_list[0]
    assert "gt_depth" in item
    # neighbor views are the spatially closest cameras
    ref = item["c2ws"][0][:3, 3]
    d1 = np.linalg.norm(item["c2ws"][1][:3, 3] - ref)
    others = [np.loadtxt(ds._pose_path(v)).astype(np.float32)[:3, 3]
              for v in ds.id_list if v != item["view_ids"][0]]
    dmin = min(np.linalg.norm(o - ref) for o in others)
    assert abs(d1 - dmin) < 1e-5


def test_semantic_background_refresh(scene_dir, tmp_path):
    """Refreshes after the first run on a background thread (SURVEY §7 host
    pipeline): due ticks launch a worker, training continues, and the result
    is applied on a later call — no per-step BPNet stall."""
    from sgnerf_tpu.data import create_dataset
    from sgnerf_tpu.runtime import SceneModel
    from sgnerf_tpu.runtime.semantic import SemanticDriver
    import run.train_ft as train_ft
    import jax

    opt = _opt(scene_dir, tmp_path, extra=[
        "--predict_semantic", "1", "--semantic_guidance", "1",
        "--shading_feature_mlp_layer2_bpnet", "1",
        "--bpnet_refresh_every", "2"])
    dataset = create_dataset(opt)
    model = SceneModel(opt)
    xyz, feats, labels = dataset.load_init_points()
    model.setup_from_points(xyz, feats, labels, dataset=dataset)

    sem = SemanticDriver(opt, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    for s in range(5):
        item = dataset.get_item(s % len(dataset), rng=rng)
        sem.maybe_refresh(model, dataset, item)
        pl = sem.pixel_labels_for(item)
        assert pl is not None            # first refresh is synchronous
        item["pixel_label"] = pl
        key, k = jax.random.split(key)
        losses = model.optimize(train_ft.make_batch(item), k)
        assert np.isfinite(float(losses["total"]))
    sem.flush(model)
    # steps 0..4 with refresh_every=2: sync first at step 0, background
    # launches due at steps 2/4 (4's may be skipped if 2's is in flight)
    assert sem.n_background >= 1
    assert sem.n_applied >= 2
    assert np.abs(np.asarray(model.state.cloud.sem_embedding)).sum() > 0


def test_attr_dedup_overflow_rerender_exact(scene_dir, tmp_path):
    """VERDICT-r3 item 5: render_image with an overflowing --attr_dedup cap
    must produce the EXACT plain-gather image (overflowed chunk groups are
    re-rendered through attr_dedup=0, never shipped degraded)."""
    from sgnerf_tpu.data import create_dataset
    from sgnerf_tpu.runtime import SceneModel
    import jax
    import run.train_ft as train_ft

    opt = _opt(scene_dir, tmp_path, extra=["--attr_dedup", "2",
                                           "--attr_tile", "8"])
    dataset = create_dataset(opt)
    model = SceneModel(opt)
    xyz, feats, labels = dataset.load_init_points()
    model.setup_from_points(xyz, feats, labels, dataset=dataset)
    # two steps so the render is not of an all-default cloud
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    for _ in range(2):
        item = dataset.get_item(int(rng.integers(len(dataset))), rng=rng)
        key, k = jax.random.split(key)
        model.optimize(train_ft.make_batch(item), k)
    model.save_checkpoint(2)

    opt_t = _opt(scene_dir, tmp_path, extra=["--attr_dedup", "2",
                                             "--attr_tile", "8"])
    opt_t.split = "test"
    opt_t.random_sample = "no_crop"
    test_ds = create_dataset(opt_t)
    item = test_ds.get_item(0, full_img=True)

    col_dedup = model.render_image(item, chunk_rays=128)
    assert getattr(model, "_warned_attr_over", False), \
        "cap 2 must overflow on this scene (else the test is vacuous)"

    opt2 = _opt(scene_dir, tmp_path, extra=["--attr_dedup", "0"])
    model2 = SceneModel(opt2)
    model2.load_checkpoint(model2.resolve_resume())
    col_plain = model2.render_image(item, chunk_rays=128)
    np.testing.assert_array_equal(col_dedup, col_plain)
