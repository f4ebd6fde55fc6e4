"""Training-step tests: loss decreases when overfitting a tiny scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnerf_tpu.models.aggregator import AggregatorConfig, init_aggregator_params
from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud, prune, grow)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.models.train import TrainConfig, create_train_state, train_step


@pytest.fixture()
def setup():
    # train_step donates its state, so every test needs a fresh cloud
    rng = np.random.default_rng(0)
    n = 1000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
    cloud = make_point_cloud(xyz, emb, color=(xyz * .5 + .5), dir=xyz,
                             capacity=1200)
    spec = grid_spec_for_cloud(cloud, vsize=[0.08] * 3, vscale=[1, 1, 1],
                               kernel_size=[3, 3, 3], max_o=8192, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.08, 0.08, 0.08))
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    return cloud, grid, cfg, params


def _batch(R=128, seed=1):
    rng = np.random.default_rng(seed)
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


def test_overfit_reduces_loss(setup):
    cloud, grid, cfg, params = setup
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10**9)
    state = create_train_state(params, cloud, tcfg)
    batch = _batch()
    key = jax.random.key(42)
    first = None
    for i in range(30):
        key, k = jax.random.split(key)
        state, losses = train_step(state, grid, cfg, tcfg, batch, k)
        if first is None:
            first = float(losses["ray_masked_coarse_raycolor"])
    last = float(losses["ray_masked_coarse_raycolor"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_frozen_fields_do_not_move(setup):
    cloud, grid, cfg, params = setup
    tcfg = TrainConfig(dir_grad=0, xyz_grad=0)
    state = create_train_state(params, cloud, tcfg)
    batch = _batch()
    xyz0 = np.asarray(state.cloud.xyz)
    dir0 = np.asarray(state.cloud.dir)
    state, _ = train_step(state, grid, cfg, tcfg, batch, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(state.cloud.xyz), xyz0)
    np.testing.assert_array_equal(np.asarray(state.cloud.dir), dir0)
    # embedding did move
    assert np.abs(np.asarray(state.cloud.embedding)).sum() > 0


def test_prune_and_grow_shapes(setup):
    cloud, grid, cfg, params = setup
    n0 = int(cloud.n_active)
    pruned = prune(cloud, thresh=2.0)  # conf all 1.0 -> prunes everything
    assert int(pruned.n_active) == 0
    g = grow(cloud, jnp.zeros((50, 3)), jnp.zeros((50, 32)),
             jnp.ones((50, 1)), jnp.zeros((50, 3)), jnp.zeros((50, 3)))
    assert int(g.n_active) == n0 + 50
    assert g.capacity == cloud.capacity


def test_train_step_with_bf16_gather_learns():
    """Training THROUGH the bf16 attribute gather: losses stay finite and
    decrease (the cast's VJP passes f32 cotangents straight through)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params)
    from sgnerf_tpu.models.point_cloud import (
        make_point_cloud, build_grid, grid_spec_for_cloud)
    from sgnerf_tpu.models.renderer import RenderConfig
    from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                         train_step)
    rng = np.random.default_rng(0)
    n = 1500
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    cloud = make_point_cloud(xyz, rng.normal(size=(n, 32)).astype(np.float32),
                             color=np.clip(xyz * 0.5 + 0.5, 0, 1), dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.05] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=20000, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=48, SR=8, K=4,
                       vsize=(0.05,) * 3, gather_dtype="bfloat16")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10 ** 9)
    state = create_train_state(params, cloud, tcfg)
    key = jax.random.key(1)
    R = 256
    losses_hist = []
    for step in range(30):
        d = (rng.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {"campos": jnp.asarray([[0.0, 0.0, -2.5]]),
                 "raydir": jnp.asarray(d),
                 "camrotc2w": jnp.eye(3)[None],
                 "near": jnp.asarray(1.0), "far": jnp.asarray(4.5),
                 "bg_color": jnp.ones(3),
                 "gt_image": jnp.full((1, R, 3), 0.5, jnp.float32)}
        key, k = jax.random.split(key)
        state, losses = train_step(state, grid, cfg, tcfg, batch, k)
        losses_hist.append(float(losses["total"]))
    assert np.isfinite(losses_hist).all()
    assert np.mean(losses_hist[-5:]) < np.mean(losses_hist[:5])


def test_train_step_multi_matches_sequential():
    """train_step_multi (G steps in one lax.scan dispatch) must be exactly
    G sequential train_step calls."""
    from sgnerf_tpu.models.train import train_step_multi

    def fresh():
        rng = np.random.default_rng(0)
        n = 1000
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
        cloud = make_point_cloud(xyz, emb, color=(xyz * .5 + .5), dir=xyz,
                                 capacity=1200)
        spec = grid_spec_for_cloud(cloud, vsize=[0.08] * 3, vscale=[1, 1, 1],
                                   kernel_size=[3, 3, 3], max_o=8192, P=16)
        grid = build_grid(cloud, spec)
        cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=32, SR=6,
                           K=4, vsize=(0.08, 0.08, 0.08))
        params = init_aggregator_params(jax.random.key(0), cfg.agg)
        return cloud, grid, cfg, params

    tcfg = TrainConfig()
    G = 3
    batches = [_batch(R=64, seed=10 + i) for i in range(G)]
    keys = jax.random.split(jax.random.key(5), G)

    cloud, grid, cfg, params = fresh()
    st = create_train_state(params, cloud, tcfg)
    seq_losses = []
    for i in range(G):
        st, l = train_step(st, grid, cfg, tcfg, batches[i], keys[i])
        seq_losses.append(float(l["total"]))

    cloud2, grid2, cfg2, params2 = fresh()
    st2 = create_train_state(params2, cloud2, tcfg)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    st2, losses = train_step_multi(st2, grid2, cfg2, tcfg, stacked, keys)

    np.testing.assert_allclose(np.asarray(losses["total"]),
                               np.asarray(seq_losses), rtol=1e-6, atol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        st2.params, st.params)
    np.testing.assert_allclose(np.asarray(st2.cloud.embedding),
                               np.asarray(st.cloud.embedding),
                               rtol=1e-5, atol=1e-6)
    assert int(st2.step) == int(st.step) == G


def test_train_step_fused_pallas_bwd_matches_xla_bwd():
    """Full train_step through the fused Pallas forward with BOTH backward
    modes (xla recompute vs the fused backward kernel): the resulting
    parameters must agree to fp tolerance. Exercises the kernel under the
    real training graph — masked (w=0) neighbor rows, conf gradient clamp,
    dual optimizers — in interpret mode on CPU."""
    import dataclasses

    def run(bwd, steps=2):
        rng = np.random.default_rng(0)
        n = 600
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
        cloud = make_point_cloud(xyz, emb, color=(xyz * .5 + .5), dir=xyz,
                                 capacity=640)
        spec = grid_spec_for_cloud(cloud, vsize=[0.08] * 3, vscale=[1, 1, 1],
                                   kernel_size=[3, 3, 3], max_o=8192, P=16)
        grid = build_grid(cloud, spec)
        cfg = RenderConfig(
            agg=AggregatorConfig(fused_mlp="pallas", fused_bwd=bwd),
            z_depth_dim=48, SR=6, K=4, vsize=(0.08, 0.08, 0.08))
        params = init_aggregator_params(jax.random.key(0), cfg.agg)
        tcfg = TrainConfig()
        st = create_train_state(params, cloud, tcfg)
        losses = []
        for i in range(steps):
            st, l = train_step(st, grid, cfg, tcfg, _batch(R=48, seed=2 + i),
                               jax.random.key(5 + i))
            losses.append(float(l["total"]))
        return losses, st

    l_xla, st_xla = run("xla")
    l_pal, st_pal = run("pallas")
    np.testing.assert_allclose(l_pal, l_xla, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-6),
        st_xla.params, st_pal.params)


def test_raydedup_overflow_surfaces_in_losses(setup):
    """ADVICE-r3: gather_vjp='raydedup' silently drops gradient rows past
    gvjp_U distinct ids per tile; the forward now counts them and rides the
    count through the losses dict so training loops/prints expose it."""
    import dataclasses
    cloud, grid, cfg, params = setup
    tcfg = TrainConfig()
    batch = _batch()

    # generous U: diagnostic present and zero
    cfg_ok = dataclasses.replace(cfg, gather_vjp="raydedup",
                                 gvjp_U=cfg.SR * cfg.K)
    # train_step donates state (cloud AND params), so copy both per state
    fresh = lambda t: jax.tree.map(jnp.copy, t)
    st = create_train_state(fresh(params), fresh(cloud), tcfg)
    st, losses = train_step(st, grid, cfg_ok, tcfg, batch, jax.random.key(1))
    assert "gvjp_overflow" in losses
    assert float(losses["gvjp_overflow"]) == 0.0

    # tiny U: the count goes nonzero (a lossy config is visible, not silent)
    cfg_bad = dataclasses.replace(cfg, gather_vjp="raydedup", gvjp_U=1)
    st2 = create_train_state(fresh(params), fresh(cloud), tcfg)
    st2, losses2 = train_step(st2, grid, cfg_bad, tcfg, batch,
                              jax.random.key(1))
    assert float(losses2["gvjp_overflow"]) > 0

    # the default scatter transpose carries no diagnostic
    st3 = create_train_state(fresh(params), fresh(cloud), tcfg)
    _, losses3 = train_step(st3, grid, cfg, tcfg, batch, jax.random.key(1))
    assert "gvjp_overflow" not in losses3


def test_train_step_with_int8_gather_learns():
    """Training THROUGH the int8-quantized attribute gather (VERDICT-r3
    item 2): the STE passes f32 cotangents to the master, losses stay
    finite and decrease, and frozen xyz still never moves."""
    import dataclasses
    rng = np.random.default_rng(3)
    n = 1200
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    emb = rng.normal(size=(n, 32)).astype(np.float32) * 0.1
    cloud = make_point_cloud(xyz, emb, color=(xyz * .5 + .5), dir=xyz,
                             capacity=1536)
    spec = grid_spec_for_cloud(cloud, vsize=[0.08] * 3, vscale=[1, 1, 1],
                               kernel_size=[3, 3, 3], max_o=8192, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.08, 0.08, 0.08), gather_dtype="int8")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10**9)
    st = create_train_state(params, cloud, tcfg)
    batch = _batch(seed=9)
    key = jax.random.key(11)
    first = None
    emb0 = np.asarray(st.cloud.embedding).copy()
    for i in range(25):
        key, k = jax.random.split(key)
        st, losses = train_step(st, grid, cfg, tcfg, batch, k)
        if first is None:
            first = float(losses["ray_masked_coarse_raycolor"])
    last = float(losses["ray_masked_coarse_raycolor"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)
    # the gradient reached the f32 master through the STE
    assert np.abs(np.asarray(st.cloud.embedding) - emb0).sum() > 0


def test_gather_rows_int8_forward_and_vjp():
    """gather_rows_int8: forward within one quantization step of the exact
    gather; backward == the bf16-scatter transpose of a plain gather."""
    from sgnerf_tpu.models.renderer import gather_rows_int8
    rng = np.random.default_rng(7)
    n, C = 300, 6
    table = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    # padding rows carry sentinels that must not pollute the scales
    table = table.at[250:].set(1e9)
    active = jnp.asarray(np.arange(n) < 250)
    idx = jnp.asarray(rng.integers(0, 250, size=(4, 8)), jnp.int32)
    got = np.asarray(gather_rows_int8(table, idx, active))
    ref = np.asarray(table[idx])
    span = (np.asarray(table[:250]).max(0) - np.asarray(table[:250]).min(0))
    np.testing.assert_allclose(got, ref, atol=float(span.max()) / 254 + 1e-6)

    cot = jnp.asarray(rng.normal(size=(4, 8, C)).astype(np.float32))
    g1 = jax.grad(lambda t: jnp.sum(gather_rows_int8(t, idx, active) * cot)
                  )(table)
    # reference: scatter-add of bf16 cotangents, upcast once (the shipped
    # bf16 path's transpose)
    flat = np.zeros((n, C), np.float32)
    cot_b = np.asarray(cot.astype(jnp.bfloat16))
    acc = jnp.zeros((n, C), jnp.bfloat16).at[idx.reshape(-1)].add(
        jnp.asarray(cot_b.reshape(-1, C)))
    np.testing.assert_array_equal(np.asarray(g1),
                                  np.asarray(acc.astype(jnp.float32)))


def test_lr_policies_lambda_and_step():
    """lr_policy=lambda (linear decay past niter) and =step (x0.1 every
    lr_decay_iters) — reference helpers/networks.py:42-49. plateau/
    cosine_annealing have no shipped user (cosine crashes in the
    reference: undefined self.args at networks.py:64)."""
    import numpy as np
    from sgnerf_tpu.models.train import TrainConfig, _schedule

    lam = _schedule(TrainConfig(lr_policy="lambda", niter=10,
                                niter_decay=19), 1.0)
    np.testing.assert_allclose(float(lam(0)), 1.0)
    np.testing.assert_allclose(float(lam(10)), 1.0)
    np.testing.assert_allclose(float(lam(20)), 0.5)
    np.testing.assert_allclose(float(lam(30)), 0.0)

    step = _schedule(TrainConfig(lr_policy="step", lr_decay_iters=100), 2.0)
    np.testing.assert_allclose(float(step(99)), 2.0)
    np.testing.assert_allclose(float(step(100)), 0.2)
    np.testing.assert_allclose(float(step(250)), 0.02, rtol=1e-6)
