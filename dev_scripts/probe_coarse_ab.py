"""Full-render A/B: flat occupancy masking vs two-level coarse compaction.

The occ-mask gather is now the biggest single op left in the render
(29.9 ms of a ~111 ms chunk after the fused-agg/fused-knn work — NEXT.md
stage model): 3.7M sample rows gathered from the 15.6 MB uint8 occupancy
table. The two-level path (--coarse_factor; ops/query._two_level_hits)
was measured at only +5% when the render cost ~160 ms+ and the MLP stage
dominated; with the downstream stages fused it is worth a re-measure.

Sweeps (coarse_factor F, seg_len L, seg_cap C) at the bench workload with
the CURRENT fast path (bf16 gathers, fused agg+color, fused knn, G=8).
Conservativeness needs (L-1)/2 * step < F * vsize (step 19.8 mm,
vsize 16 mm): L=4 -> F>=2, L=8 -> F>=5.
"""
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


def bench_grid(cloud, params, cfg, grid, tag):
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
    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008, 0.008, 0.008),
                       gather_dtype="bfloat16", knn_mode="fused")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)

    def spec_for(**kw):
        return grid_spec_for_cloud(
            cloud, vsize=[0.008] * 3, vscale=[2, 2, 2],
            kernel_size=[3, 3, 3], max_o=610000, P=26,
            ranges=[-10.0] * 3 + [10.0] * 3, cache_dtype="bfloat16", **kw)

    base_grid = build_grid(cloud, spec_for())
    jax.block_until_ready(base_grid.bucket_pnts)
    print("flat grid built", flush=True)
    base_rps, _ = bench_grid(cloud, params, cfg, base_grid, "flat")
    del base_grid  # free before building the first coarse grid (OOM else)

    import os
    sweep = [(2, 4, 32), (4, 4, 32), (4, 8, 32), (5, 8, 32),
             (4, 4, 24), (8, 8, 32)]
    if os.environ.get("SGNERF_COARSE_SWEEP"):
        sweep = [tuple(int(v) for v in t.split(","))
                 for t in os.environ["SGNERF_COARSE_SWEEP"].split(";")]
    for (F, L, C) in sweep:
        grid = build_grid(cloud, spec_for(coarse_factor=F, seg_len=L,
                                          seg_cap=C))
        jax.block_until_ready(grid.bucket_pnts)
        rps, _ = bench_grid(cloud, params, cfg, grid,
                            f"coarse F={F} L={L} C={C}")
        print(f"  -> vs flat: {rps / base_rps * 100 - 100:+.1f}%",
              flush=True)
        del grid


if __name__ == "__main__":
    main()
