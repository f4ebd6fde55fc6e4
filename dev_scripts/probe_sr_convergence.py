"""Does stochastic-rounding the bf16 attribute table recover the training
quality the nearest-rounded cast loses?

Measured baseline (PERFORMANCE.md): training through the bf16 gather cost
0.54 dB on the toy convergence scene (17.36 vs 17.90 dB at 600 steps).
This re-runs that comparison with --gather_round stochastic added.
CPU-runnable (quality only; speed is a TPU question).
"""
import sys

import numpy as np

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 0

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from test_convergence import _splat_gt  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step)
from sgnerf_tpu.utils.metrics import psnr  # noqa: E402
from sgnerf_tpu.ops.camera import get_dtu_raydir  # noqa: E402


def build_scene():
    rng = np.random.default_rng(SEED)
    n = 4000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgb = np.clip(xyz * 0.5 + 0.5, 0, 1).astype(np.float32)
    emb = rng.uniform(-0.5, 0.5, (n, 32)).astype(np.float32)
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
        rot = np.stack([right, np.cross(fwd, right), fwd], 1).astype(
            np.float32)
        gt = _splat_gt(xyz, rgb, campos, rot, intr, W, H)
        px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        pix = np.stack([px, py], -1).reshape(-1, 2)
        rd = np.asarray(get_dtu_raydir(jnp.asarray(pix), jnp.asarray(intr),
                                       jnp.asarray(rot), True))
        views.append((campos, rot, rd.astype(np.float32), gt.reshape(-1, 3)))
    return xyz, rgb, emb, views, (W, H)


def run(tag, gather_dtype, gather_round, xyz, rgb, emb, views, wh,
        steps=600):
    W, H = wh
    cloud = make_point_cloud(xyz, emb.copy(), color=rgb, dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.04] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=40000, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.04,) * 3, gather_dtype=gather_dtype,
                       gather_round=gather_round)
    params = init_aggregator_params(jax.random.key(SEED), cfg.agg)
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10 ** 9)
    state = create_train_state(params, cloud, tcfg)

    rng = np.random.default_rng(7 + SEED)
    key = jax.random.key(1 + SEED)
    Rb = 512
    for step in range(steps):
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
        state, _ = train_step(state, grid, cfg, tcfg, batch, k)

    # eval with the f32 gather (quality of the learned parameters)
    cfg_eval = dataclasses.replace(cfg, gather_dtype="float32")
    ps = []
    for v in views:
        out = render_rays(state.params, state.cloud, grid, cfg_eval,
                          campos=jnp.asarray(v[0][None]),
                          raydir=jnp.asarray(v[2][None]),
                          camrotc2w=jnp.asarray(v[1][None]),
                          near=1.0, far=4.5, bg_color=jnp.ones(3))
        img = np.asarray(out["coarse_raycolor"][0]).reshape(H, W, 3)
        ps.append(psnr(img, v[3].reshape(H, W, 3)))
    print(f"{tag}: mean PSNR {np.mean(ps):.3f} dB  (per-view "
          + " ".join(f"{p:.2f}" for p in ps) + ")", flush=True)
    return float(np.mean(ps))


def main():
    print(f"seed {SEED}", flush=True)
    xyz, rgb, emb, views, wh = build_scene()
    f32 = run("f32 gather           ", "float32", "nearest",
              xyz, rgb, emb, views, wh)
    bf = run("bf16 gather (nearest) ", "bfloat16", "nearest",
             xyz, rgb, emb, views, wh)
    sr = run("bf16 gather (stochast)", "bfloat16", "stochastic",
             xyz, rgb, emb, views, wh)
    print(f"gap nearest->f32: {f32 - bf:+.3f} dB; "
          f"recovered by SR: {sr - bf:+.3f} dB; SR vs f32: {sr - f32:+.3f}")


if __name__ == "__main__":
    main()
