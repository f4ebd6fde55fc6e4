"""Functional quality: training converges to high PSNR on a consistent scene.

Unlike the random-image e2e tests, the GT here is a splat render of the
actual colored point cloud, so the radiance field can (and must) fit it."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.models.aggregator import AggregatorConfig, init_aggregator_params
from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.models.train import TrainConfig, create_train_state, train_step
from sgnerf_tpu.utils.metrics import psnr
from sgnerf_tpu.ops.camera import get_dtu_raydir


def _splat_gt(xyz, rgb, campos, rot, intr, W, H, bg=1.0):
    """Nearest-point splat with z-buffer: the 'photograph' of the cloud."""
    w2c = rot.T
    cam = (xyz - campos) @ rot
    z = cam[:, 2]
    vis = z > 0.1
    pix = (cam[vis] / cam[vis, 2:3]) @ intr.T
    px = np.round(pix[:, 0]).astype(int)
    py = np.round(pix[:, 1]).astype(int)
    ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    img = np.full((H, W, 3), bg, np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    zi = z[vis][ok]
    order = np.argsort(-zi)  # far to near; near overwrites
    for i in order:
        x, y = px[ok][i], py[ok][i]
        img[y, x] = rgb[vis][ok][i]
    return img


@pytest.mark.slow
def test_training_converges_on_consistent_scene():
    rng = np.random.default_rng(0)
    n = 4000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgb = np.clip(xyz * 0.5 + 0.5, 0, 1).astype(np.float32)
    cloud = make_point_cloud(xyz, (rng.uniform(-0.5, 0.5, (n, 32))
                                   .astype(np.float32)),
                             color=rgb, dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.04] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=40000, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.04,) * 3)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10 ** 9)
    state = create_train_state(params, cloud, tcfg)

    W, H = 48, 36
    intr = np.array([[45.0, 0, W / 2], [0, 45.0, H / 2], [0, 0, 1]],
                    np.float32)
    views = []
    for i in range(4):
        a = 2 * np.pi * i / 4
        campos = np.array([2.5 * np.sin(a), 0, -2.5 * np.cos(a)], np.float32)
        fwd = -campos / np.linalg.norm(campos)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        rot = np.stack([right, np.cross(fwd, right), fwd], 1).astype(np.float32)
        gt = _splat_gt(xyz, rgb, campos, rot, intr, W, H)
        px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        pix = np.stack([px, py], -1).reshape(-1, 2)
        rd = np.asarray(get_dtu_raydir(jnp.asarray(pix), jnp.asarray(intr),
                                       jnp.asarray(rot), True))
        views.append((campos, rot, rd.astype(np.float32),
                      gt.reshape(-1, 3)))

    key = jax.random.key(1)
    Rb = 512
    for step in range(600):
        v = views[step % 4]
        sel = rng.integers(0, len(v[2]), Rb)
        batch = {
            "campos": jnp.asarray(v[0][None]),
            "raydir": jnp.asarray(v[2][sel][None]),
            "camrotc2w": jnp.asarray(v[1][None]),
            "near": jnp.asarray(1.0), "far": jnp.asarray(4.5),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(v[3][sel][None]),
        }
        key, k = jax.random.split(key)
        state, losses = train_step(state, grid, cfg, tcfg, batch, k)

    # full-frame eval on a training view
    v = views[0]
    out = render_rays(state.params, state.cloud, grid, cfg,
                      campos=jnp.asarray(v[0][None]),
                      raydir=jnp.asarray(v[2][None]),
                      camrotc2w=jnp.asarray(v[1][None]),
                      near=1.0, far=4.5, bg_color=jnp.ones(3))
    img = np.asarray(out["coarse_raycolor"][0]).reshape(H, W, 3)
    gt = v[3].reshape(H, W, 3)
    p = psnr(img, gt)
    print(f"convergence PSNR after 600 steps: {p:.2f} dB")
    assert p > 16.0, p

    # bf16 attribute gather on the TRAINED scene must agree with f32 to
    # well past perceptual tolerance (the +41% render-speed option)
    cfg16 = dataclasses.replace(cfg, gather_dtype="bfloat16")
    out16 = render_rays(state.params, state.cloud, grid, cfg16,
                        campos=jnp.asarray(v[0][None]),
                        raydir=jnp.asarray(v[2][None]),
                        camrotc2w=jnp.asarray(v[1][None]),
                        near=1.0, far=4.5, bg_color=jnp.ones(3))
    img16 = np.asarray(out16["coarse_raycolor"][0]).reshape(H, W, 3)
    agree = psnr(img16, img)
    print(f"bf16-gather vs f32 render agreement: {agree:.2f} dB")
    assert agree > 40.0, agree

    # full bf16 inference (gather + feature assembly + MLP matmuls): the
    # deep-bf16 path keeps the per-neighbor features bf16 end to end
    cfg16f = dataclasses.replace(
        cfg, gather_dtype="bfloat16",
        agg=dataclasses.replace(cfg.agg, compute_dtype="bfloat16"))
    outf = render_rays(state.params, state.cloud, grid, cfg16f,
                       campos=jnp.asarray(v[0][None]),
                       raydir=jnp.asarray(v[2][None]),
                       camrotc2w=jnp.asarray(v[1][None]),
                       near=1.0, far=4.5, bg_color=jnp.ones(3))
    imgf = np.asarray(outf["coarse_raycolor"][0]).reshape(H, W, 3)
    agree_f = psnr(imgf, img)
    print(f"deep-bf16 vs f32 render agreement: {agree_f:.2f} dB")
    assert agree_f > 30.0, agree_f
