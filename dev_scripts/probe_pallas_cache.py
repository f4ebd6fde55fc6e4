"""A/B the KNN cache-row gather: XLA gather vs Pallas per-row async DMA
(cfg.cache_gather), in-context on the real bench.py render program."""
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

R = 9216


def main():
    rng = np.random.default_rng(0)
    n = 1_000_000
    walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
    ax = rng.integers(0, 3, size=n // 2)
    sign = rng.integers(0, 2, size=n // 2) * 2 - 1
    walls[np.arange(n // 2), ax] = 2.0 * sign
    clutter = rng.normal(scale=0.7, size=(n - n // 2, 3)).astype(np.float32)
    xyz = np.concatenate([walls, clutter])
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                             dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                      keepdims=True))
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)
    print("grid built", flush=True)

    params = init_aggregator_params(jax.random.key(0), AggregatorConfig())
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)

    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)
    raydirs = [mk_raydir(i) for i in range(4)]

    for mode in ("xla", "pallas"):
        cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=400, SR=24,
                           K=8, vsize=(0.008, 0.008, 0.008),
                           gather_dtype="bfloat16", cache_gather=mode)

        @jax.jit
        def step(params, cloud, grid, raydir):
            out = render_rays(params, cloud, grid, cfg, campos=campos,
                              raydir=raydir, camrotc2w=rot, near=0.1,
                              far=8.0, bg_color=bg)
            return jnp.sum(out["coarse_raycolor"])

        try:
            v0 = float(step(params, cloud, grid, raydirs[0]))
        except Exception as e:
            print(f"[{mode}] FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        iters = 24
        t0 = time.perf_counter()
        rs = [step(params, cloud, grid, raydirs[i % 4]) for i in range(iters)]
        vals = [float(r) for r in rs]
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"[{mode}] {dt:6.2f} ms/chunk ({R * 1000 / dt:,.0f} rays/s) "
              f"v0={v0:.4f} v1={vals[1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
