"""Dispatch-batch (G) sweep at the bench workload: G chunks per jitted call
via lax.map. Amortizes the ~27 ms host enqueue AND the per-dispatch 11.6 ms
nbr_packed relayout copy (copy.179, backend-blocked from a build-time fix)
G-fold. Prints per-chunk effective ms and rays/s for each G."""
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

    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
                       gather_dtype="bfloat16", knn_mode="fused")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)

    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)

    for G in (8, 16, 32):
        groups = [jnp.stack([mk_raydir(G * g + i) for i in range(G)])
                  for g in range(3)]

        @jax.jit
        def step(params, cloud, grid, raydirs):
            def one(rd):
                out = render_rays(params, cloud, grid, cfg, campos=campos,
                                  raydir=rd, camrotc2w=rot, near=0.1,
                                  far=8.0, bg_color=bg)
                return jnp.sum(out["coarse_raycolor"])
            return jnp.sum(jax.lax.map(one, raydirs))

        float(step(params, cloud, grid, groups[0]))
        iters = max(2, 40 // G)
        t0 = time.perf_counter()
        rs = [step(params, cloud, grid, groups[i % 3]) for i in range(iters)]
        vals = [float(v) for v in rs]
        dt = time.perf_counter() - t0
        assert len(set(vals)) > 1
        per_chunk = dt / iters / G * 1e3
        print(f"G={G:3d}: {per_chunk:6.2f} ms/chunk effective, "
              f"{R / (per_chunk / 1e3):,.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
