"""Follow-ups to the xprof census (probe_xprof_render.py):
  1. identify copy.179 / copy.190 in the HLO;
  2. attr-table gather row-count scaling (is the 84 MB-table gather
     row-bound? then tile-dedup of the attribute gather pays);
  3. re-measure the two-level (coarse) sample compaction in TODAY's
     context — its "+5% only" verdict predates the fused kernels, and the
     occ gather is now the single biggest device op (29.9 ms of 127).
"""
import re
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

R, D, SR, K = 9216, 400, 24, 8


def bench(fn, args_list, iters=10, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:6.2f} ms", flush=True)
    return dt


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

    # ---- 2. attr gather row-count scaling (84 MB bf16 table)
    table = jnp.asarray(
        rng.normal(size=(n, 42)).astype(np.float32)).astype(jnp.bfloat16)
    for rows in (18_432, 110_592, 442_368, 1_769_472):
        idxs = [jnp.asarray(np.random.default_rng(i).integers(
            0, n, size=(rows,)).astype(np.int32)) for i in range(3)]

        @jax.jit
        def g(table, idx):
            return jnp.sum(table[idx].astype(jnp.float32))

        bench(g, [(table, i) for i in idxs], tag=f"attr-gather {rows} rows")

    # ---- 3. two-level compaction sweep in full-render context
    base = dict(vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
                max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
                cache_dtype="bfloat16")

    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)
    raydirs = [mk_raydir(i) for i in range(4)]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)
    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=D, SR=SR, K=K, vsize=(0.008,) * 3,
                       gather_dtype="bfloat16", knn_mode="fused")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)

    for tag, extra in (
            ("flat (current)", {}),
            ("coarse F2 L4 cap32", dict(coarse_factor=2, seg_len=4,
                                        seg_cap=32)),
            ("coarse F4 L8 cap24", dict(coarse_factor=4, seg_len=8,
                                        seg_cap=24)),
            ("coarse F8 L16 cap24", dict(coarse_factor=8, seg_len=16,
                                         seg_cap=24)),
    ):
        spec = grid_spec_for_cloud(cloud, **base, **extra)
        grid = build_grid(cloud, spec)
        jax.block_until_ready(grid.bucket_pnts)

        @jax.jit
        def full(params, cloud, grid, raydir):
            out = render_rays(params, cloud, grid, cfg, campos=campos,
                              raydir=raydir, camrotc2w=rot, near=0.1,
                              far=8.0, bg_color=bg)
            return jnp.sum(out["coarse_raycolor"])

        bench(full, [(params, cloud, grid, r) for r in raydirs],
              tag=f"full render {tag}")

    # ---- 1. identify the copies (reuse the flat-grid program)
    spec = grid_spec_for_cloud(cloud, **base)
    grid = build_grid(cloud, spec)

    @jax.jit
    def step(params, cloud, grid, raydir):
        out = render_rays(params, cloud, grid, cfg, campos=campos,
                          raydir=raydir, camrotc2w=rot, near=0.1,
                          far=8.0, bg_color=bg)
        return jnp.sum(out["coarse_raycolor"])

    txt = step.lower(params, cloud, grid, raydirs[0]).compile().as_text()
    for name in ("copy.179", "copy.190", "copy.187", "copy.188", "copy.196",
                 "copy.207"):
        for ln in txt.splitlines():
            ls = ln.strip()
            if ls.startswith(f"%{name} ="):
                m = re.search(r'source_file="([^"]+)"[^}]*source_line=(\d+)',
                              ls)
                src = f"{m.group(1).split('/')[-1]}:{m.group(2)}" if m else "?"
                print(f"{name}: {ls[:200]}  [{src}]", flush=True)
                break


if __name__ == "__main__":
    main()
