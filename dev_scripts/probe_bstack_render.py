"""Render A/B: G chunks per dispatch as lax.map(B=1) vs ONE B=G call.

The dense occ-mask gather costs 29.9 ms/chunk for ~3.7 MB of output —
op-overhead/table-regime-bound, not row- or bandwidth-bound (PERFORMANCE.md
attr-row-scaling + slot-fused-masking findings). lax.map runs the render
body G times, paying every per-op floor G times; stacking the chunks on the
renderer's existing B axis turns each gather/top_k into ONE batched op.
If the floors dominate (occ-mask, attr-gather), B=G wins big; if those ops
actually scale with rows/bytes, it's a wash. Memory: the cache gather's
intermediate grows to G x 221k x 640 B (~1.1 GB at G=8) — sweep B to find
the HBM-feasible sweet spot.
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

R, CHUNKS, ITERS = 9216, 8, 4


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


def mk_raydirs(seed, B):
    d = (np.random.default_rng(seed).normal(size=(B, R, 3)) * 0.3
         ).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d)


def bench(cloud, params, cfg, grid, B, tag):
    """CHUNKS chunks per dispatch: lax.map over CHUNKS//B calls of B each
    (B=1 reproduces the current bench; B=CHUNKS is one flat call)."""
    G = CHUNKS // B
    rot = jnp.broadcast_to(jnp.eye(3, dtype=np.float32), (B, 3, 3))
    campos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.5]), (B, 3))
    bg = jnp.ones(3)
    groups = [jnp.stack([mk_raydirs(16 * g + i, B) for i in range(G)])
              for g in range(3)]                       # (G, B, R, 3)

    @jax.jit
    def step(params, cloud, grid, raydirs):
        def one(rd):                                   # rd (B, R, 3)
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
    rps = R * CHUNKS * ITERS / dt
    print(json.dumps({"tag": tag, "rays_per_sec": round(rps, 1),
                      "ms_per_chunk": round(dt / ITERS / CHUNKS * 1e3, 2),
                      "checksum": vals[0]}), flush=True)
    return rps


def main():
    cloud = make_scene()
    grid = build_grid(cloud, grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16"))
    jax.block_until_ready(grid.bucket_pnts)
    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008, 0.008, 0.008),
                       gather_dtype="bfloat16", knn_mode="fused")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)

    base = bench(cloud, params, cfg, grid, 1, "B=1 (lax.map x8, current)")
    for B in (2, 4, 8):
        try:
            rps = bench(cloud, params, cfg, grid, B,
                        f"B={B} (lax.map x{CHUNKS // B})")
            print(f"  -> vs B=1: {rps / base * 100 - 100:+.1f}%", flush=True)
        except Exception as e:
            print(f"B={B}: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
