"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnerf_tpu.models.aggregator import AggregatorConfig, init_aggregator_params
from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig
from sgnerf_tpu.models.train import TrainConfig, create_train_state, train_step
from sgnerf_tpu.parallel import make_mesh, sharded_train_step, shard_batch


def _scene():
    rng = np.random.default_rng(0)
    n = 600
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
    cloud = make_point_cloud(xyz, emb, color=(xyz * .5 + .5), dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.1] * 3, vscale=[1, 1, 1],
                               kernel_size=[3, 3, 3], max_o=4096, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=32, SR=6, K=4,
                       vsize=(0.1, 0.1, 0.1))
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    return cloud, grid, cfg, params


def _batch(R):
    rng = np.random.default_rng(1)
    d = rng.normal(size=(1, R, 3)).astype(np.float32) * 0.25
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "campos": jnp.asarray([[0.0, 0.0, -3.0]]),
        "raydir": jnp.asarray(d),
        "camrotc2w": jnp.eye(3)[None],
        "near": jnp.asarray(1.0),
        "far": jnp.asarray(5.0),
        "bg_color": jnp.ones(3),
        "gt_image": jnp.asarray(
            rng.uniform(0.2, 0.8, size=(1, R, 3)).astype(np.float32)),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device():
    cloud, grid, cfg, params = _scene()
    tcfg = TrainConfig()
    batch = _batch(R=64)
    key = jax.random.key(7)

    s1 = create_train_state(params, cloud, tcfg)
    s1, losses1 = train_step(s1, grid, cfg, tcfg, batch, key)

    cloud2, grid2, cfg2, params2 = _scene()
    mesh = make_mesh(8)
    s2 = create_train_state(params2, cloud2, tcfg)
    s2, losses2 = sharded_train_step(s2, grid2, cfg2, tcfg, batch, key, mesh)

    np.testing.assert_allclose(
        float(losses1["total"]), float(losses2["total"]), rtol=1e-4)
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_sharding_layout():
    mesh = make_mesh(8)
    batch = shard_batch(_batch(R=64), mesh)
    shard_shapes = [s.data.shape for s in batch["raydir"].addressable_shards]
    assert all(s == (1, 8, 3) for s in shard_shapes)
    assert len(shard_shapes) == 8


def test_sharded_train_step_perspective_matches_single_device():
    """--wcoord_query 0 + --ray_shards (round-3 lift of the single-device
    restriction): the perspective-querier train step under GSPMD ray
    sharding matches the unsharded step (frustum grid build replicates,
    query shards by rays)."""
    from sgnerf_tpu.ops.query_pers import perspective_spec_from_camera
    cloud, grid, cfg, params = _scene()
    tcfg = TrainConfig()
    batch = _batch(R=64)
    key = jax.random.key(9)
    intr = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]],
                    np.float32)
    pspec = perspective_spec_from_camera(
        intr, 32, 24, 1.0, 5.0, [0.1] * 3, [1, 1, 1], [3, 3, 3], 4096, 16)

    s1 = create_train_state(params, cloud, tcfg)
    s1, losses1 = train_step(s1, grid, cfg, tcfg, batch, key, pspec=pspec)

    cloud2, grid2, cfg2, params2 = _scene()
    mesh = make_mesh(8)
    s2 = create_train_state(params2, cloud2, tcfg)
    s2, losses2 = sharded_train_step(s2, grid2, cfg2, tcfg, batch, key,
                                     mesh, pspec=pspec)

    assert float(losses1["total"]) > 0
    np.testing.assert_allclose(
        float(losses1["total"]), float(losses2["total"]), rtol=1e-4)
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_scene_model_perspective_ray_shards_wiring(tmp_path):
    """SceneModel accepts --wcoord_query 0 + --ray_shards together and
    optimize() routes the pspec through the sharded step."""
    from sgnerf_tpu.options import TrainOptions
    from sgnerf_tpu.runtime import SceneModel

    opt = TrainOptions().parse(args=[
        "--name", "prs", "--checkpoints_dir", str(tmp_path),
        "--ray_shards", "8", "--wcoord_query", "0",
        "--img_wh", "32", "24",
        "--z_depth_dim", "24", "--SR", "4", "--K", "4", "--P", "8",
        "--max_o", "4096", "--vsize", "0.1", "0.1", "0.1",
        "--vscale", "1", "1", "1", "--kernel_size", "3", "3", "3",
        "--act_type", "LeakyReLU", "--num_feat_freqs", "3",
        "--dist_xyz_freq", "5", "--agg_dist_pers", "20",
        "--agg_distance_kernel", "linear", "--agg_intrp_order", "2",
        "--color_loss_items", "ray_masked_coarse_raycolor",
        "--color_loss_weights", "1.0",
        "--which_render_func", "radiance",
        "--ranges", "-3", "-3", "-3", "3", "3", "3"])
    model = SceneModel(opt)
    assert model.ray_mesh is not None and model.perspective
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(800, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    model.setup_from_points(xyz, None, None)
    intr = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]],
                    np.float32)
    model.ensure_pspec({"intrinsic": intr, "near": 1.0, "far": 5.0})
    batch = _batch(R=64)
    l0 = float(model.optimize(dict(batch), jax.random.key(0))["total"])
    l1 = float(model.optimize(dict(batch), jax.random.key(1))["total"])
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0


def test_ray_dp_render_with_attr_dedup_matches_unsharded():
    """Eval render with the tile-dedup'd attribute gather under ray-DP
    (rays GSPMD-sharded over the 8-device mesh): dedup tiles are
    consecutive-ray blocks, so shard boundaries that divide attr_tile
    leave the result identical to the unsharded dedup render."""
    import dataclasses
    from sgnerf_tpu.models.renderer import render_rays
    from sgnerf_tpu.parallel import make_mesh, ray_sharding, replicated

    cloud, grid, cfg, params = _scene()
    cfg = dataclasses.replace(cfg, attr_dedup=8 * cfg.SR * cfg.K,
                              attr_tile=8)
    batch = _batch(R=512)

    def render(params_, cloud_, grid_, rd):
        return render_rays(
            params_, cloud_, grid_, cfg, campos=batch["campos"],
            raydir=rd, camrotc2w=batch["camrotc2w"], near=1.0, far=5.0,
            bg_color=batch["bg_color"])["coarse_raycolor"]

    base = np.asarray(render(params, cloud, grid, batch["raydir"]))

    mesh = make_mesh(8)
    rep = replicated(mesh)
    rs = ray_sharding(mesh, ray_axis=1)
    out = render(jax.device_put(params, rep), jax.device_put(cloud, rep),
                 jax.device_put(grid, rep),
                 jax.device_put(batch["raydir"], rs))
    np.testing.assert_allclose(np.asarray(out), base, atol=1e-5)


def test_sharded_train_step_multi_matches_sequential():
    """--steps_per_dispatch composes with --ray_shards: G scanned steps
    with the render inside shard_map (train_step_multi ray_mesh) equal G
    sequential sharded steps."""
    import jax.numpy as jnp
    from sgnerf_tpu.models.train import train_step_multi
    from sgnerf_tpu.parallel.sharded import replicate_tree, shard_batch as sb

    cloud, grid, cfg, params = _scene()
    tcfg = TrainConfig()
    G = 3
    batches = [_batch(R=64) for _ in range(G)]
    keys = jax.random.split(jax.random.key(11), G)

    s1 = create_train_state(params, cloud, tcfg)
    for i in range(G):
        s1, losses1 = train_step(s1, grid, cfg, tcfg, batches[i], keys[i])

    cloud2, grid2, cfg2, params2 = _scene()
    mesh = make_mesh(8)
    s2 = create_train_state(params2, cloud2, tcfg)
    s2 = replicate_tree(s2, mesh)
    grid2 = replicate_tree(grid2, mesh)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    from sgnerf_tpu.parallel.mesh import ray_sharding, replicated
    rs = ray_sharding(mesh, ray_axis=2)
    rep = replicated(mesh)
    from sgnerf_tpu.parallel.sharded import _RAY_KEYS
    stacked = {k: jax.device_put(v, rs if k in _RAY_KEYS else rep)
               for k, v in stacked.items()}
    s2, losses2 = train_step_multi(s2, grid2, cfg2, tcfg, stacked, keys,
                                   ray_mesh=mesh)

    np.testing.assert_allclose(
        float(losses1["total"]),
        float(jax.tree.map(lambda a: a[G - 1], losses2)["total"]),
        rtol=1e-4)
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_render_guidance_with_key_matches_unsharded():
    """Ray-DP + semantic guidance + a PRNG key: the stochastic acceptance
    draws match the unsharded render bit-for-bit (guide_u pre-drawn at
    global shape by draw_render_noise; raygen jitter rides along since
    cfg.jitter defaults on)."""
    import dataclasses
    import jax.numpy as jnp
    from sgnerf_tpu.models.renderer import render_rays
    from sgnerf_tpu.parallel.sharded import (render_rays_sharded,
                                             replicate_tree)

    cloud, grid, cfg, params = _scene()
    rng = np.random.default_rng(13)
    n = cloud.xyz.shape[0]
    cloud = dataclasses.replace(
        cloud,
        label=jnp.asarray(rng.integers(0, 5, n).astype(np.int32)),
        label_prob=jnp.asarray(
            rng.dirichlet(np.ones(20), n).astype(np.float32)))
    scfg = dataclasses.replace(cfg, semantic_guidance=1)
    batch = _batch(R=64)
    pixel_label = jnp.asarray(rng.integers(0, 5, (1, 64)).astype(np.int32))
    key = jax.random.key(21)

    ref = render_rays(params, cloud, grid, scfg, campos=batch["campos"],
                      raydir=batch["raydir"], camrotc2w=batch["camrotc2w"],
                      near=1.0, far=5.0, bg_color=batch["bg_color"],
                      pixel_label=pixel_label, key=key, is_train=True)

    mesh = make_mesh(8)
    from sgnerf_tpu.parallel.mesh import ray_sharding
    out = render_rays_sharded(
        replicate_tree(params, mesh), replicate_tree(cloud, mesh),
        replicate_tree(grid, mesh), scfg, mesh,
        campos=batch["campos"],
        raydir=jax.device_put(batch["raydir"], ray_sharding(mesh)),
        camrotc2w=batch["camrotc2w"], near=1.0, far=5.0,
        bg_color=batch["bg_color"],
        pixel_label=jax.device_put(pixel_label, ray_sharding(mesh)),
        key=key, is_train=True)

    np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                               np.asarray(ref["coarse_raycolor"]),
                               atol=2e-5, rtol=1e-4)
    # the guidance path really drew: a different key flips acceptances
    ref2 = render_rays(params, cloud, grid, scfg, campos=batch["campos"],
                       raydir=batch["raydir"], camrotc2w=batch["camrotc2w"],
                       near=1.0, far=5.0, bg_color=batch["bg_color"],
                       pixel_label=pixel_label, key=jax.random.key(99),
                       is_train=True)
    assert np.abs(np.asarray(ref2["coarse_raycolor"])
                  - np.asarray(ref["coarse_raycolor"])).max() > 0


def test_sharded_train_step_raydedup_overflow_scalar():
    """--gather_vjp raydedup under --ray_shards: the gvjp_overflow SCALAR
    output psums across ray shards instead of crashing eval_shape with an
    unbound-axis error (round-5 review finding)."""
    import dataclasses

    cloud, grid, cfg, params = _scene()
    cfg = dataclasses.replace(cfg, gather_vjp="raydedup")
    tcfg = TrainConfig()
    batch = _batch(R=64)
    key = jax.random.key(7)

    s1 = create_train_state(params, cloud, tcfg)
    s1, losses1 = train_step(s1, grid, cfg, tcfg, batch, key)
    assert "gvjp_overflow" in losses1

    cloud2, grid2, cfg2, params2 = _scene()
    cfg2 = dataclasses.replace(cfg2, gather_vjp="raydedup")
    mesh = make_mesh(8)
    s2 = create_train_state(params2, cloud2, tcfg)
    s2, losses2 = sharded_train_step(s2, grid2, cfg2, tcfg, batch, key, mesh)
    np.testing.assert_allclose(
        float(losses1["gvjp_overflow"]), float(losses2["gvjp_overflow"]))
    np.testing.assert_allclose(
        float(losses1["total"]), float(losses2["total"]), rtol=1e-4)


def test_sharded_render_attr_dedup_overflow_scalar():
    """attr_dedup eval render through render_rays_sharded: runs (scalar
    overflow psum inside shard_map) and matches the unsharded dedup render;
    overflow counts agree."""
    import dataclasses
    from sgnerf_tpu.models.renderer import render_rays
    from sgnerf_tpu.parallel.sharded import (render_rays_sharded,
                                             replicate_tree)
    from sgnerf_tpu.parallel.mesh import ray_sharding

    cloud, grid, cfg, params = _scene()
    # R=512: 64 local rays per shard = one attr tile (dedup asserts
    # tile-divisibility of the LOCAL ray count)
    cfg = dataclasses.replace(cfg, attr_dedup=256)
    batch = _batch(R=512)

    ref = render_rays(params, cloud, grid, cfg, campos=batch["campos"],
                      raydir=batch["raydir"], camrotc2w=batch["camrotc2w"],
                      near=1.0, far=5.0, bg_color=batch["bg_color"])
    mesh = make_mesh(8)
    out = render_rays_sharded(
        replicate_tree(params, mesh), replicate_tree(cloud, mesh),
        replicate_tree(grid, mesh), cfg, mesh,
        campos=batch["campos"],
        raydir=jax.device_put(batch["raydir"], ray_sharding(mesh)),
        camrotc2w=batch["camrotc2w"], near=1.0, far=5.0,
        bg_color=batch["bg_color"])
    np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                               np.asarray(ref["coarse_raycolor"]),
                               atol=2e-5, rtol=1e-4)
    assert float(out["attr_dedup_overflow"]) == float(
        ref["attr_dedup_overflow"])


def test_sharded_train_step_perspective_shade_jitter_matches():
    """Perspective path + shpnt_jitter=uniform + key under ray-DP: the
    shade_u draw matches the unsharded step (draw_render_noise resplit
    sequence)."""
    import dataclasses
    from sgnerf_tpu.ops.query_pers import perspective_spec_from_camera

    cloud, grid, cfg, params = _scene()
    cfg = dataclasses.replace(cfg, shpnt_jitter="uniform")
    tcfg = TrainConfig()
    batch = _batch(R=64)
    key = jax.random.key(9)
    intr = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]],
                    np.float32)
    pspec = perspective_spec_from_camera(
        intr, 32, 24, 1.0, 5.0, [0.1] * 3, [1, 1, 1], [3, 3, 3], 4096, 16)

    s1 = create_train_state(params, cloud, tcfg)
    s1, losses1 = train_step(s1, grid, cfg, tcfg, batch, key, pspec=pspec)

    cloud2, grid2, cfg2, params2 = _scene()
    cfg2 = dataclasses.replace(cfg2, shpnt_jitter="uniform")
    mesh = make_mesh(8)
    s2 = create_train_state(params2, cloud2, tcfg)
    s2, losses2 = sharded_train_step(s2, grid2, cfg2, tcfg, batch, key,
                                     mesh, pspec=pspec)
    np.testing.assert_allclose(
        float(losses1["total"]), float(losses2["total"]), rtol=1e-4)
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_probe_render_maps_sharded_matches_unsharded():
    """--ray_shards point-growing probe renders (runtime/growing.py) run
    inside shard_map and reproduce the unsharded maps exactly.

    Regression for the round-5 review finding: render_probe_maps called
    plain render_rays on the mesh-replicated state, which cannot compile
    Mosaic kernels on real multi-chip TPU ("Mosaic kernels cannot be
    automatically partitioned") — training with --ray_shards and active
    point growing (reference probe_hole, run/train_ft.py:425-540) crashed
    at the first grow step on real hardware."""
    from types import SimpleNamespace
    from sgnerf_tpu.runtime.growing import render_probe_maps

    cloud, grid, cfg, params = _scene()
    H = W = 8
    rng = np.random.default_rng(3)
    d = rng.normal(size=(H * W, 3)).astype(np.float32) * 0.25
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    item = {
        "raydir": d,
        "pixel_idx": np.stack([xx.ravel(), yy.ravel()], -1),
        "h": H, "w": W,
        "campos": np.array([0.0, 0.0, -3.0], np.float32),
        "camrotc2w": np.eye(3, dtype=np.float32),
        "near": 1.0, "far": 5.0,
        "bg_color": np.ones(3, np.float32),
    }
    st = SimpleNamespace(params=params, cloud=cloud)
    base = SimpleNamespace(state=st, grid=grid, cfg=cfg, ray_mesh=None)
    ref = render_probe_maps(base, item, chunk_rays=16)
    assert ref, "probe render produced no maps"
    sh = SimpleNamespace(state=st, grid=grid, cfg=cfg, ray_mesh=make_mesh(8))
    got = render_probe_maps(sh, item, chunk_rays=16)
    assert set(ref) == set(got)
    for k in ref:
        # tiny float drift from different XLA fusion at the shard boundary
        # (same 6e-08 scale as the dryrun's semantic-guidance leg)
        np.testing.assert_allclose(ref[k], got[k], atol=1e-6, err_msg=k)
