"""Render A/B: in-kernel color head (fused_color) on vs off.

Commit e6c3561 moved the color branch into the fused Pallas aggregator
kernel (output (M,4) instead of the (M,257) reduced-feature round-trip)
but the TPU tunnel went down before it could be measured; the flag
--fused_color gates it. This times both at the bench workload with the
rest of the fast path fixed (bf16 gathers, fused knn, G=8).
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402

R, G, ITERS = 9216, 8, 4


def make_scene():
    rng = np.random.default_rng(0)
    n = 1_000_000
    walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
    ax = rng.integers(0, 3, size=n // 2)
    sign = rng.integers(0, 2, size=n // 2) * 2 - 1
    walls[np.arange(n // 2), ax] = 2.0 * sign
    clutter = rng.normal(scale=0.7, size=(n - n // 2, 3)).astype(np.float32)
    xyz = np.concatenate([walls, clutter])
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    return make_point_cloud(
        xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
        dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))


def bench(cloud, params, cfg, grid, tag):
    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)
    groups = [jnp.stack([mk_raydir(8 * g + i) for i in range(8)])
              for g in range(3)]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)

    @jax.jit
    def step(params, cloud, grid, raydirs):
        def one(rd):
            out = render_rays(params, cloud, grid, cfg, campos=campos,
                              raydir=rd, camrotc2w=rot, near=0.1, far=8.0,
                              bg_color=bg)
            return jnp.sum(out["coarse_raycolor"])
        return jnp.sum(jax.lax.map(one, raydirs))

    float(step(params, cloud, grid, groups[0]))
    t0 = time.perf_counter()
    vals = [float(step(params, cloud, grid, groups[i % 3]))
            for i in range(ITERS)]
    dt = time.perf_counter() - t0
    assert len(set(vals)) > 1
    rps = R * G * ITERS / dt
    print(json.dumps({"tag": tag, "rays_per_sec": round(rps, 1),
                      "ms_per_chunk": round(dt / ITERS / G * 1e3, 2),
                      "checksum": vals[0]}), flush=True)
    return rps, vals[0]


def main():
    cloud = make_scene()
    grid = build_grid(cloud, grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16"))
    jax.block_until_ready(grid.bucket_pnts)

    base = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                             fused_mlp="pallas"),
                        z_depth_dim=400, SR=24, K=8,
                        vsize=(0.008, 0.008, 0.008),
                        gather_dtype="bfloat16", knn_mode="fused")
    params = init_aggregator_params(jax.random.key(0), base.agg)

    cfg_off = dataclasses.replace(
        base, agg=dataclasses.replace(base.agg, fused_color=False))
    r_off, c_off = bench(cloud, params, cfg_off, grid, "fused_color=off")
    r_on, c_on = bench(cloud, params, base, grid, "fused_color=on")
    print(f"in-kernel color head: {r_on / r_off * 100 - 100:+.2f}% "
          f"(checksum drift {abs(c_on - c_off):.3e})", flush=True)

    # and the in-kernel volume march on top (eval-only fully-fused render)
    cfg_march = dataclasses.replace(
        base, agg=dataclasses.replace(base.agg, fused_march=True))
    r_m, c_m = bench(cloud, params, cfg_march, grid, "fused_march=on")
    print(f"in-kernel march: {r_m / r_on * 100 - 100:+.2f}% over color-fused"
          f" (checksum drift {abs(c_m - c_on):.3e})", flush=True)


if __name__ == "__main__":
    main()
