"""Fused Pallas aggregator kernel (ops/fused_agg.py) vs the XLA path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel was
A/B'd compiled on a real TPU chip (PERFORMANCE.md: +11% render in-context).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params, aggregate)
from sgnerf_tpu.ops.fused_agg import fused_block1_alpha


def _agg_inputs(rng, B=1, R=7, SR=5, K=8, F=32):
    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mask = jnp.asarray(rng.random((B, R, SR, K)) < 0.5)
    return dict(
        sampled_embedding=mk((B, R, SR, K, F)) * 0.2,
        sampled_color=mk((B, R, SR, K, 3)),
        sampled_dir=mk((B, R, SR, K, 3)),
        sampled_conf=jnp.abs(mk((B, R, SR, K, 1))),
        sampled_label_embedding=None,
        sampled_xyz=mk((B, R, SR, K, 3)),
        sampled_xyz_pers=mk((B, R, SR, K, 3)),
        sample_pnt_mask=mask,
        sample_loc=mk((B, R, SR, 3)),
        sample_loc_w=mk((B, R, SR, 3)),
        sample_ray_dirs=mk((B, R, SR, 3)),
        Rw2c=None, vsize=(0.008,) * 3)


def test_fused_matches_xla_forward():
    rng = np.random.default_rng(0)
    kw = _agg_inputs(rng)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)
    out_ref = aggregate(params, cfg, **kw)
    out_fused = aggregate(
        params, dataclasses.replace(cfg, fused_mlp="pallas"), **kw)
    np.testing.assert_allclose(out_ref[0], out_fused[0], atol=3e-6)
    np.testing.assert_array_equal(out_ref[1], out_fused[1])


def test_fused_gradients_match_xla():
    rng = np.random.default_rng(1)
    kw = _agg_inputs(rng, R=3, SR=4)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)

    def loss(cfg):
        def f(params, emb):
            kw2 = dict(kw)
            kw2["sampled_embedding"] = emb
            dec, *_ = aggregate(params, cfg, **kw2)
            return jnp.sum(dec ** 2)
        return f

    g_ref = jax.grad(loss(cfg), argnums=(0, 1))(
        params, kw["sampled_embedding"])
    g_fused = jax.grad(
        loss(dataclasses.replace(cfg, fused_mlp="pallas")), argnums=(0, 1))(
        params, kw["sampled_embedding"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g_ref,
        g_fused)


def test_fused_pads_nonmultiple_rows():
    # M = B*R*SR = 1*5*7 = 35, far from the TM=128 tile
    rng = np.random.default_rng(2)
    K, F = 8, 32
    M = 35
    feat = jnp.asarray(rng.normal(size=(M, K, F)).astype(np.float32)) * 0.2
    d = jnp.asarray(rng.normal(size=(M, K, 6)).astype(np.float32)) * 0.01
    w = jnp.asarray(rng.random((M, K)).astype(np.float32))
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(3), cfg)
    fa, al = fused_block1_alpha(
        feat, d, w, params["block1"], params["alpha_branch"],
        K=K, nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq), bf16=False)
    assert fa.shape == (M, cfg.shading_feature_num)
    assert al.shape == (M, 1)
    # reference via the XLA statement of the same math
    from sgnerf_tpu.ops.fused_agg import _xla_ref
    fa_ref, al_ref = _xla_ref(
        (K, cfg.num_feat_freqs, abs(cfg.dist_xyz_freq), False),
        feat, d, w, params["block1"], params["alpha_branch"])
    np.testing.assert_allclose(fa, fa_ref, atol=3e-5)
    np.testing.assert_allclose(al, al_ref, atol=3e-6)


def test_fused_falls_back_when_unsupported():
    # block3 configs (editing) keep the XLA path; output must be identical
    rng = np.random.default_rng(4)
    kw = _agg_inputs(rng)
    cfg = AggregatorConfig(shading_feature_mlp_layer3=1)
    params = init_aggregator_params(jax.random.key(0), cfg)
    out_ref = aggregate(params, cfg, **kw)
    out_fused = aggregate(
        params, dataclasses.replace(cfg, fused_mlp="pallas"), **kw)
    np.testing.assert_array_equal(out_ref[0], out_fused[0])


def test_fused_bf16_close_to_f32():
    rng = np.random.default_rng(5)
    kw = _agg_inputs(rng)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)
    out_f32 = aggregate(params, cfg, **kw)
    out_bf16 = aggregate(
        params, dataclasses.replace(cfg, fused_mlp="pallas",
                                    compute_dtype="bfloat16"), **kw)
    np.testing.assert_allclose(out_f32[0], out_bf16[0], atol=0.05)


def _mk_mkd(rng, M, K=8, F=32, Dd=6):
    feat = jnp.asarray(rng.normal(size=(M, K, F)).astype(np.float32)) * 0.2
    d = jnp.asarray(rng.normal(size=(M, K, Dd)).astype(np.float32)) * 0.05
    w = jnp.asarray((rng.random((M, K)) *
                     (rng.random((M, K)) < 0.7)).astype(np.float32))
    return feat, d, w


def test_pallas_backward_matches_xla_backward():
    # M = 300 spans 3 backward tiles (TM=128 -> Mp=384): exercises both the
    # cross-tile weight-grad accumulation and the padded final tile
    rng = np.random.default_rng(6)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(1), cfg)
    feat, d, w = _mk_mkd(rng, 300)

    def loss(bwd):
        def f(feat, d, w, block1, alpha_branch):
            fa, al = fused_block1_alpha(
                feat, d, w, block1, alpha_branch, K=8,
                nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
                bf16=False, bwd=bwd)
            return jnp.sum(fa ** 2) + 3.0 * jnp.sum(al ** 2)
        return f

    args = (feat, d, w, params["block1"], params["alpha_branch"])
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5),
        g_xla, g_pal)


def test_pallas_backward_color_matches_xla_backward():
    from sgnerf_tpu.ops.fused_agg import fused_block1_alpha_color
    rng = np.random.default_rng(7)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(2), cfg)
    M = 150
    feat, d, w = _mk_mkd(rng, M)
    vd = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    def loss(bwd):
        def f(feat, d, w, vd, block1, alpha_branch, color_branch):
            al, rawc = fused_block1_alpha_color(
                feat, d, w, vd, block1, alpha_branch, color_branch, K=8,
                nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
                vf=cfg.num_viewdir_freqs, bf16=False, bwd=bwd)
            return jnp.sum(rawc ** 2) + 3.0 * jnp.sum(al ** 2)
        return f

    args = (feat, d, w, vd, params["block1"], params["alpha_branch"],
            params["color_branch"])
    g_xla = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(loss("pallas"), argnums=tuple(range(7)))(*args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5),
        g_xla, g_pal)


def test_aggregate_gradients_with_pallas_bwd():
    # end-to-end through aggregate(): fused fwd + pallas bwd vs the plain
    # XLA aggregate gradients
    rng = np.random.default_rng(8)
    kw = _agg_inputs(rng, R=3, SR=4)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)

    def loss(cfg):
        def f(params, emb, conf):
            kw2 = dict(kw)
            kw2["sampled_embedding"] = emb
            kw2["sampled_conf"] = conf
            dec, *_ = aggregate(params, cfg, **kw2)
            return jnp.sum(dec ** 2)
        return f

    args = (params, kw["sampled_embedding"], kw["sampled_conf"])
    g_ref = jax.grad(loss(cfg), argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(
        loss(dataclasses.replace(cfg, fused_mlp="pallas",
                                 fused_bwd="pallas")),
        argnums=(0, 1, 2))(*args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5),
        g_ref, g_pal)


def test_fused_march_matches_standard_render():
    """--fused_march: the fully-fused shading+march eval render must match
    the standard path's coarse_raycolor and background transmission on a
    real scene (M spans multiple ray-aligned tiles + padding)."""
    from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                               grid_spec_for_cloud)
    from sgnerf_tpu.models.renderer import RenderConfig, render_rays

    rng = np.random.default_rng(9)
    n = 3000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    cloud = make_point_cloud(xyz, rng.normal(size=(n, 32)).astype(np.float32)
                             * 0.1, color=np.clip(xyz * .5 + .5, 0, 1),
                             dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.05] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=8192, P=8)
    grid = build_grid(cloud, spec)
    params = init_aggregator_params(
        jax.random.key(0), AggregatorConfig(fused_mlp="pallas"))
    d = (rng.normal(size=(2, 40, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    args = dict(campos=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.0]), (2, 3)),
                raydir=jnp.asarray(d),
                camrotc2w=jnp.broadcast_to(jnp.eye(3, dtype=np.float32),
                                           (2, 3, 3)),
                near=1.0, far=5.0, bg_color=jnp.asarray([1.0, 0.5, 0.25]))

    def cfg(**kw):
        return RenderConfig(agg=AggregatorConfig(fused_mlp="pallas", **kw),
                            z_depth_dim=48, SR=8, K=4, vsize=(0.05,) * 3)

    ref = render_rays(params, cloud, grid, cfg(), **args)
    out = render_rays(params, cloud, grid, cfg(fused_march=True), **args)
    assert set(out.keys()) == {"coarse_raycolor", "coarse_is_background",
                               "queried_shading", "ray_mask", "ray_valid"}
    np.testing.assert_allclose(out["coarse_raycolor"],
                               ref["coarse_raycolor"], atol=2e-5)
    np.testing.assert_allclose(out["coarse_is_background"],
                               ref["coarse_is_background"], atol=2e-5)
    np.testing.assert_array_equal(out["ray_mask"], ref["ray_mask"])

    # train path (key given) must silently keep the full-output path
    tr = render_rays(params, cloud, grid, cfg(fused_march=True), **args,
                     key=jax.random.key(3), is_train=True)
    assert "coarse_point_opacity" in tr
