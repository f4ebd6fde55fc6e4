"""End-to-end render smoke tests on a synthetic point cloud."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnerf_tpu.models.aggregator import AggregatorConfig, init_aggregator_params
from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    n = 2000
    # points on a unit sphere at origin
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
    cloud = make_point_cloud(
        xyz, emb, color=(xyz * 0.5 + 0.5).astype(np.float32),
        dir=xyz, capacity=2048)
    spec = grid_spec_for_cloud(cloud, vsize=[0.05] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=8192, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(
        agg=AggregatorConfig(act_type="LeakyReLU"),
        z_depth_dim=80, SR=8, K=4, vsize=(0.05, 0.05, 0.05),
    )
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    return cloud, grid, cfg, params


def _cam(R=64):
    rng = np.random.default_rng(1)
    campos = jnp.asarray([[0.0, 0.0, -3.0]])
    # rays toward the sphere + a few that miss entirely
    d = rng.normal(size=(1, R, 3)).astype(np.float32) * 0.2
    d[..., 2] = 1.0
    d[:, :4, 1] += 10.0  # these rays miss
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rot = jnp.eye(3)[None]
    return campos, jnp.asarray(d), rot


def test_render_shapes_and_finite(scene):
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam()
    bg = jnp.asarray([1.0, 1.0, 1.0])
    out = render_rays(params, cloud, grid, cfg, campos=campos, raydir=raydir,
                      camrotc2w=rot, near=1.0, far=5.0, bg_color=bg)
    B, R = raydir.shape[:2]
    assert out["coarse_raycolor"].shape == (B, R, 3)
    assert out["ray_mask"].shape == (B, R)
    assert np.isfinite(np.asarray(out["coarse_raycolor"])).all()
    # some rays hit, some missed
    rm = np.asarray(out["ray_mask"])
    assert rm.any() and not rm.all()


def test_missed_rays_render_background(scene):
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam()
    bg = jnp.asarray([0.25, 0.5, 0.75])
    out = render_rays(params, cloud, grid, cfg, campos=campos, raydir=raydir,
                      camrotc2w=rot, near=1.0, far=5.0, bg_color=bg)
    rm = np.asarray(out["ray_mask"])
    col = np.asarray(out["coarse_raycolor"])
    missed = col[~rm]
    np.testing.assert_allclose(missed, np.broadcast_to(np.asarray(bg), missed.shape),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["coarse_is_background"])[~rm][:, 0], 1.0, atol=1e-6)


def test_render_is_differentiable(scene):
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam(R=16)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    target = jnp.zeros((1, 16, 3))

    def loss_fn(p, c):
        out = render_rays(p, c, grid, cfg, campos=campos, raydir=raydir,
                          camrotc2w=rot, near=1.0, far=5.0, bg_color=bg)
        return jnp.mean((out["coarse_raycolor"] - target) ** 2)

    g_params, g_cloud = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(
        params, cloud)
    flat, _ = jax.tree_util.tree_flatten(g_params)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)
    assert np.isfinite(np.asarray(g_cloud.embedding)).all()
    assert np.abs(np.asarray(g_cloud.embedding)).sum() > 0


def test_prob_mode_outputs(scene):
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam(R=16)
    out = render_rays(params, cloud, grid, cfg, campos=campos, raydir=raydir,
                      camrotc2w=rot, near=1.0, far=5.0,
                      bg_color=jnp.ones(3), prob=True)
    assert out["ray_max_shading_opacity"].shape == (1, 16, 1)
    assert out["ray_max_sample_loc_w"].shape == (1, 16, 3)
    assert out["shading_avg_embedding"].shape[-1] == 32
    assert np.isfinite(np.asarray(out["ray_max_far_dist"])).all()


def test_gather_rows_custom_vjp_matches_plain():
    from sgnerf_tpu.models.renderer import gather_rows
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(40, 7)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(3, 8, 2)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(3, 8, 2, 7)).astype(np.float32))

    def f_custom(t):
        return jnp.sum(gather_rows(t, idx) * cot)

    def f_plain(t):
        return jnp.sum(t[idx] * cot)

    g1 = jax.grad(f_custom)(table)
    g2 = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gather_rows(table, idx)),
                               np.asarray(table[idx]), atol=0)


def test_gather_rows_f32acc_and_spread_match_plain():
    from sgnerf_tpu.models.renderer import (gather_rows_f32acc,
                                            make_gather_rows_spread)
    rng = np.random.default_rng(6)
    # duplicate-heavy indices (the real workload's collision structure)
    table = jnp.asarray(rng.normal(size=(40, 7)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 12, size=(5, 6, 8)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(5, 6, 8, 7)).astype(np.float32))

    def f_plain(t):
        return jnp.sum(t[idx] * cot)

    g_ref = jax.grad(f_plain)(table)
    for K in (1, 8):
        for take in (gather_rows_f32acc, make_gather_rows_spread(4, K),
                     make_gather_rows_spread(3, K)):
            np.testing.assert_allclose(np.asarray(take(table, idx)),
                                       np.asarray(table[idx]), atol=0)
            g = jax.grad(lambda t: jnp.sum(take(t, idx) * cot))(table)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                       atol=1e-5)


def test_gather_rows_dedup_matches_plain():
    """Dedup'd transpose: exact vs the plain scatter-add when no tile
    exceeds U distinct ids; overflow drops exactly the rank>=U rows and
    dedup_overflow_count predicts how many."""
    from sgnerf_tpu.models.renderer import (make_gather_rows_dedup,
                                            dedup_overflow_count)
    rng = np.random.default_rng(7)
    n, T, C = 50, 16, 5
    table = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    # 4 tiles of 16 rows; ids drawn from a 6-value pool per tile => <= 6
    # distinct per tile
    pools = [rng.choice(n, size=6, replace=False) for _ in range(4)]
    idx_np = np.stack([p[rng.integers(0, 6, size=T)] for p in pools])
    idx = jnp.asarray(idx_np.astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(4, T, C)).astype(np.float32))

    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * cot))(table)
    for U in (6, 8, 16):
        take = make_gather_rows_dedup(T, U)
        np.testing.assert_allclose(np.asarray(take(table, idx)),
                                   np.asarray(table[idx]), atol=0)
        g = jax.grad(lambda t: jnp.sum(take(t, idx) * cot))(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-5, err_msg=f"U={U}")
        assert int(dedup_overflow_count(idx, T, U)) == 0

    # U=4 < 6 distinct: overflow; count matches the rank>=U rows
    take4 = make_gather_rows_dedup(T, 4)
    g4 = jax.grad(lambda t: jnp.sum(take4(t, idx) * cot))(table)
    over = int(dedup_overflow_count(idx, T, 4))
    assert over > 0
    # dropped rows = contributions of each tile's 2 largest ids
    drop = np.zeros((n, C), np.float32)
    for t in range(4):
        uniq = np.unique(idx_np[t])
        for d in uniq[4:]:
            drop[d] += np.asarray(cot[t])[idx_np[t] == d].sum(0)
    np.testing.assert_allclose(np.asarray(g4) + drop, np.asarray(g_ref),
                               atol=1e-5)
    assert over == int(sum((idx_np[t] >= 0)[np.isin(
        idx_np[t], np.unique(idx_np[t])[4:])].sum() for t in range(4)))


def test_gather_vjp_sorted_matches_scatter_end_to_end(scene):
    """cfg.gather_vjp='sorted' must produce the same render AND the same
    cloud gradients as the default scatter-add transpose."""
    import dataclasses
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam(R=16)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    target = jnp.zeros((1, 16, 3))

    def loss_fn(c, variant):
        cfg2 = dataclasses.replace(cfg, gather_vjp=variant)
        out = render_rays(params, c, grid, cfg2, campos=campos,
                          raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                          bg_color=bg)
        return jnp.mean((out["coarse_raycolor"] - target) ** 2)

    v1, g1 = jax.value_and_grad(loss_fn, allow_int=True)(cloud, "scatter")
    for variant in ("sorted", "f32", "spread", "raydedup", "batchdedup"):
        v2, g2 = jax.value_and_grad(loss_fn, allow_int=True)(cloud, variant)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1.embedding),
                                   np.asarray(g2.embedding), atol=1e-6,
                                   err_msg=variant)
        np.testing.assert_allclose(np.asarray(g1.conf), np.asarray(g2.conf),
                                   atol=1e-6, err_msg=variant)


def test_attr_dedup_render_matches_plain(scene):
    """Eval render with the tile-dedup'd attribute gather must equal the
    plain-gather render exactly when no tile overflows (U generous), and
    leave the output finite when U is tiny (overflow degrades neighbors,
    never corrupts)."""
    import dataclasses
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam(R=64)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    base = render_rays(params, cloud, grid, cfg, campos=campos,
                       raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                       bg_color=bg)
    for tile in (8, 64):
        cfg2 = dataclasses.replace(cfg, attr_dedup=tile * cfg.SR * cfg.K,
                                   attr_tile=tile)
        out = render_rays(params, cloud, grid, cfg2, campos=campos,
                          raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                          bg_color=bg)
        np.testing.assert_allclose(
            np.asarray(out["coarse_raycolor"]),
            np.asarray(base["coarse_raycolor"]), atol=1e-5,
            err_msg=f"tile={tile}")
    # tiny U: overflow degrades but stays finite and renders background
    cfg3 = dataclasses.replace(cfg, attr_dedup=4, attr_tile=8)
    out3 = render_rays(params, cloud, grid, cfg3, campos=campos,
                       raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                       bg_color=bg)
    assert np.isfinite(np.asarray(out3["coarse_raycolor"])).all()
    # train path (key given) must ignore attr_dedup
    k = jax.random.key(3)
    t1 = render_rays(params, cloud, grid, cfg, campos=campos, raydir=raydir,
                     camrotc2w=rot, near=1.0, far=5.0, bg_color=bg,
                     key=k, is_train=True)
    t2 = render_rays(params, cloud, grid, cfg3, campos=campos,
                     raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                     bg_color=bg, key=k, is_train=True)
    np.testing.assert_allclose(np.asarray(t1["coarse_raycolor"]),
                               np.asarray(t2["coarse_raycolor"]), atol=1e-6)


def test_render_with_part_rotation_table(scene):
    """Edited-scene path: Rw2c as a (T,3,3) part table + per-point rot_idx.
    With both rows identity the output must equal the plain render (tests
    the per-neighbor rotation gather end to end)."""
    import dataclasses
    cloud, grid, cfg, params = scene
    campos, raydir, rot = _cam(R=32)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    base = render_rays(params, cloud, grid, cfg, campos=campos,
                       raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                       bg_color=bg)
    rng = np.random.default_rng(3)
    table = np.stack([np.eye(3, dtype=np.float32)] * 2)
    ridx = rng.integers(0, 2, cloud.capacity).astype(np.int32)
    cloud2 = dataclasses.replace(
        cloud, Rw2c=jnp.asarray(table), rot_idx=jnp.asarray(ridx))
    out = render_rays(params, cloud2, grid, cfg, campos=campos,
                      raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                      bg_color=bg)
    np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                               np.asarray(base["coarse_raycolor"]),
                               atol=1e-5)
    # a non-trivial rotation on some points must change the image
    th = 0.5
    rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    table2 = np.stack([np.eye(3, dtype=np.float32), rz])
    cloud3 = dataclasses.replace(cloud2, Rw2c=jnp.asarray(table2))
    out2 = render_rays(params, cloud3, grid, cfg, campos=campos,
                       raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                       bg_color=bg)
    hit = np.asarray(base["ray_mask"])
    diff = np.abs(np.asarray(out2["coarse_raycolor"]) -
                  np.asarray(base["coarse_raycolor"]))[hit]
    assert diff.max() > 1e-4



def test_compute_depth_output(scene):
    """coarse_depth = alpha-blend-weighted mean sample depth
    (neural_points_volumetric_model.py:620-624); hit rays land in [near,far],
    and a depth-supervised train step runs end-to-end."""
    import dataclasses
    cloud, grid, cfg, params = scene
    cfgd = dataclasses.replace(cfg, compute_depth=1)
    campos, raydir, rot = _cam()
    out = render_rays(params, cloud, grid, cfgd, campos=campos,
                      raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                      bg_color=jnp.asarray([0.0, 0.0, 0.0]))
    d = np.asarray(out["coarse_depth"])
    assert d.shape == raydir.shape[:2]
    assert np.isfinite(d).all()
    hit = np.asarray(out["ray_mask"]) > 0
    assert (d[hit] > 0.5).all() and (d[hit] < 5.5).all()
    # missed rays have zero blend weight -> depth ~ 0
    assert np.allclose(d[~hit], 0.0, atol=1e-3)


def test_train_step_with_depth_losses(scene):
    """Depth/bg/l2_size-supervised training step compiles and moves the
    depth loss downward."""
    import dataclasses
    from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                         train_step)
    cloud, grid, cfg, params = scene
    cfgd = dataclasses.replace(cfg, compute_depth=1)
    tcfg = TrainConfig(
        color_loss_items=("ray_masked_coarse_raycolor",),
        color_loss_weights=(1.0,),
        depth_loss_items=("coarse_depth",), depth_loss_weights=(0.5,),
        bg_loss_items=("coarse_is_background",), bg_loss_weights=(0.1,),
        zero_one_loss_items=(), zero_one_loss_weights=())
    campos, raydir, rot = _cam()
    B, R = raydir.shape[:2]
    rng = np.random.default_rng(7)
    batch = {
        "campos": campos, "raydir": raydir, "camrotc2w": rot,
        "near": 1.0, "far": 5.0, "bg_color": jnp.zeros(3),
        "gt_image": jnp.asarray(rng.uniform(size=(B, R, 3)), jnp.float32),
        "gt_depth": jnp.full((B, R), 3.0, jnp.float32),
        "gt_mask": jnp.ones((B, R), jnp.float32),
    }
    state = create_train_state(params, cloud, tcfg)
    losses = []
    for i in range(3):
        state, ls = train_step(state, grid, cfgd, tcfg, batch,
                               jax.random.key(i))
        losses.append(float(ls["coarse_depth"]))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0] + 1e-6


def test_gather_rows_batchdedup_exact_and_overflow():
    """make_gather_rows_batchdedup: transpose equals the plain scatter-add
    exactly when the distinct count fits U_cap; past the cap the LARGEST
    distinct ids' rows drop and batchdedup_overflow_count predicts the
    overflow."""
    from sgnerf_tpu.models.renderer import (make_gather_rows_batchdedup,
                                            batchdedup_overflow_count)
    rng = np.random.default_rng(13)
    n, C = 500, 5
    table = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(6, 40)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(6, 40, C)).astype(np.float32))
    uniq = np.unique(np.asarray(idx))

    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * cot))(table)
    gather = make_gather_rows_batchdedup(len(uniq) + 8)
    g1 = jax.grad(lambda t: jnp.sum(gather(t, idx) * cot))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g_ref), atol=1e-5)
    assert int(batchdedup_overflow_count(idx, len(uniq) + 8)) == 0

    # undersized cap: top-(excess) ids by value drop; count matches
    cap = len(uniq) - 7
    gather2 = make_gather_rows_batchdedup(cap)
    g2 = jax.grad(lambda t: jnp.sum(gather2(t, idx) * cot))(table)
    assert int(batchdedup_overflow_count(idx, cap)) == 7
    dropped = uniq[cap:]
    kept = np.ones(n, bool)
    kept[dropped] = False
    np.testing.assert_allclose(np.asarray(g2)[kept],
                               np.asarray(g_ref)[kept], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(g2)[~kept], 0.0)
