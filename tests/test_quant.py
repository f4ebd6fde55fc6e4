"""Stochastic bf16 rounding (ops/quant.py): exactness, unbiasedness,
gradient semantics, and the render-path integration."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from sgnerf_tpu.ops.quant import stochastic_round_bf16

pytestmark = pytest.mark.fast


def test_values_land_on_bf16_grid():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512,)) * 3,
                    jnp.float32)
    y = stochastic_round_bf16(x, jax.random.key(1))
    assert y.dtype == jnp.bfloat16
    # every output is one of the two bf16 neighbors of x
    lo = x.astype(jnp.bfloat16)
    xf = x.astype(jnp.float32)
    lof = lo.astype(jnp.float32)
    # nextafter in bf16 space: bump the bit pattern by +-1
    bits = jax.lax.bitcast_convert_type(lo, jnp.int16)
    up = jax.lax.bitcast_convert_type(
        jnp.where(lof <= xf, bits + jnp.where(bits >= 0, 1, -1), bits),
        jnp.bfloat16)
    dn = jax.lax.bitcast_convert_type(
        jnp.where(lof >= xf, bits + jnp.where(bits > 0, -1, 1), bits),
        jnp.bfloat16)
    yf = y.astype(jnp.float32)
    ok = ((yf == lof) | (yf == up.astype(jnp.float32))
          | (yf == dn.astype(jnp.float32)))
    assert bool(jnp.all(ok)), np.asarray(
        jnp.stack([xf, yf, lof], -1))[~np.asarray(ok)][:5]


def test_exact_values_pass_through():
    x = jnp.asarray([0.0, 1.0, -2.5, 0.15625], jnp.float32)  # bf16-exact
    for s in range(4):
        y = stochastic_round_bf16(x, jax.random.key(s))
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(x))


def test_unbiased():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def draw(s):
        return stochastic_round_bf16(x, jax.random.key(s)).astype(jnp.float32)

    m = jnp.mean(jnp.stack([draw(s) for s in range(512)]), axis=0)
    # nearest rounding's bias can be up to 2^-9 relative; the SR mean must
    # track x much tighter than half an ulp (|x|/512 here after 512 draws)
    err = jnp.abs(m - x)
    ulp = jnp.abs(x) * 2.0 ** -8
    assert float(jnp.max(err / ulp)) < 0.35, float(jnp.max(err / ulp))
    # and strictly beat the nearest-rounding bias on average
    near_err = jnp.abs(x.astype(jnp.bfloat16).astype(jnp.float32) - x)
    assert float(jnp.mean(err)) < float(jnp.mean(near_err)) * 0.5


def test_gradient_is_identity_through_cast():
    x = jnp.asarray([0.3, -1.7, 2.2], jnp.float32)

    def f(x):
        return jnp.sum(
            stochastic_round_bf16(x, jax.random.key(0)).astype(jnp.float32)
            * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])


def test_render_path_accepts_stochastic_round():
    import dataclasses
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params)
    from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                               grid_spec_for_cloud)
    from sgnerf_tpu.models.renderer import RenderConfig, render_rays

    rng = np.random.default_rng(0)
    n = 2000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    cloud = make_point_cloud(xyz, rng.normal(size=(n, 32)).astype(np.float32),
                             color=np.clip(xyz * 0.5 + 0.5, 0, 1), dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.05] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=8192, P=8)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=32, SR=6, K=4,
                       vsize=(0.05,) * 3, gather_dtype="bfloat16",
                       gather_round="stochastic")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    d = (rng.normal(size=(1, 64, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    args = dict(campos=jnp.asarray([[0.0, 0.0, -3.0]]),
                raydir=jnp.asarray(d),
                camrotc2w=jnp.eye(3, dtype=np.float32)[None],
                near=1.0, far=5.0, bg_color=jnp.ones(3))

    # train path: two keys -> two (slightly) different renders
    o1 = render_rays(params, cloud, grid, cfg, **args,
                     key=jax.random.key(1), is_train=True)
    o2 = render_rays(params, cloud, grid, cfg, **args,
                     key=jax.random.key(2), is_train=True)
    a = np.asarray(o1["coarse_raycolor"])
    b = np.asarray(o2["coarse_raycolor"])
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    assert not np.array_equal(a, b)
    assert float(np.max(np.abs(a - b))) < 0.05  # noise is sub-percent scale

    # eval path (no key): deterministic nearest rounding, close to f32
    oe = render_rays(params, cloud, grid, cfg, **args)
    of = render_rays(params, cloud, grid,
                     dataclasses.replace(cfg, gather_dtype="float32"),
                     **args)
    assert float(np.max(np.abs(np.asarray(oe["coarse_raycolor"])
                               - np.asarray(of["coarse_raycolor"])))) < 0.05
