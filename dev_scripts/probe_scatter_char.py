"""Characterize the attribute-gather scatter-add transpose (the 21.1 ms
pts-grad step fraction probe_bwd_split measured).

Questions, each gating a different fix:
  A) Adam-only cost: update the point optimizer on ZERO grads — if the
     dense (N,36) Adam is most of the 21.1 ms, no scatter scheme helps.
  B) Scatter row-rate vs index structure: same 196k rows scattered with
     (i) realistic duplicate-heavy ids from a real query, (ii) unique ids,
     (iii) maximally colliding ids (all in one 4k-row window). If (i)~(ii)
     the cost is per-row issue (dedup only helps by shrinking rows); if
     (i)>>(ii), collisions serialize and spreading/dedup helps doubly.
  C) Width/dtype scaling: 42 f32 cols vs 42 bf16 vs 8 bf16 — is the row
     cost byte-sensitive at this table size?
  D) Realistic duplication stats at R=1024 train batches: per-ray valid
     rows and per-ray unique pids (sets the cap for a per-ray dedup), plus
     global unique fraction (sets the ceiling for any dedup scheme).

Timing per CLAUDE.md: vary inputs per call, force a scalar transfer per
result, single-dispatch differences (the ~38 ms tunnel latency cancels).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.train import TrainConfig, make_optimizers  # noqa: E402
from sgnerf_tpu.ops.query import query_neighbors  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
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

R, SR, K, D = 1024, 24, 8, 400
MK = R * SR * K


def timeit(fn, args_list, iters=16, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    for k in range(iters):
        r = fn(*args_list[k % len(args_list)])
    _ = float(r)
    # pipelined: dispatch all, sync once — amortizes the tunnel latency
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


# ---- D) realistic ids from real queries --------------------------------
raygen = find_ray_generation_method("near_far_linear")


def real_pidx(i):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    raypos, _, _, _ = raygen(jnp.asarray([[0., 0., -1.5]]), jnp.asarray(d),
                             D, near=0.1, far=8.0)
    q = query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                        radius_limit=4 * 0.016, knn_mode="fused")
    return np.asarray(q.sample_pidx).reshape(R, SR * K)

pidx_sets = [real_pidx(i) for i in range(3)]
for p in pidx_sets[:1]:
    valid = p >= 0
    per_ray_valid = valid.sum(1)
    per_ray_uniq = np.array([
        len(np.unique(row[v])) if v.any() else 0
        for row, v in zip(p, valid)])
    flat = p[valid]
    print(f"stats: valid rows {valid.sum()}/{p.size} "
          f"({100*valid.mean():.1f}%), global unique {len(np.unique(flat))}"
          f" ({100*len(np.unique(flat))/max(1,len(flat)):.1f}% of valid)",
          flush=True)
    print(f"per-ray valid: mean {per_ray_valid.mean():.0f} "
          f"p50 {np.percentile(per_ray_valid,50):.0f} "
          f"p95 {np.percentile(per_ray_valid,95):.0f} max {per_ray_valid.max()}",
          flush=True)
    print(f"per-ray uniq:  mean {per_ray_uniq.mean():.0f} "
          f"p50 {np.percentile(per_ray_uniq,50):.0f} "
          f"p95 {np.percentile(per_ray_uniq,95):.0f} max {per_ray_uniq.max()}",
          flush=True)

# ---- A) Adam-only -------------------------------------------------------
tcfg = TrainConfig()
_, pts_tx = make_optimizers(tcfg)
pts = {"embedding": cloud.embedding, "conf": cloud.conf,
       "color": cloud.color, "dir": cloud.dir, "xyz": cloud.xyz}
opt_state = pts_tx.init(pts)


@jax.jit
def adam_zero(pts, opt_state, seed):
    g = jax.tree.map(jnp.zeros_like, pts)
    g = {**g, "conf": g["conf"] + seed * 1e-12}   # vary input
    up, os2 = pts_tx.update(g, opt_state, pts)
    import optax
    pts2 = optax.apply_updates(pts, up)
    return jnp.sum(pts2["conf"]) + jnp.sum(up["embedding"][0])

timeit(adam_zero, [(pts, opt_state, jnp.asarray(float(i)))
                   for i in range(4)], tag="A adam-zero-grads")

# ---- B/C) scatter micro -------------------------------------------------
ids_real = [jnp.asarray(np.where(p >= 0, p, 0).reshape(-1).astype(np.int32))
            for p in pidx_sets]
r2 = np.random.default_rng(7)
ids_uniq = [jnp.asarray(r2.choice(n, size=MK, replace=False).astype(np.int32))
            for _ in range(3)]
ids_hot = [jnp.asarray((r2.integers(0, 4096, size=MK)).astype(np.int32))
           for _ in range(3)]


def mk_scatter(width, dtype):
    @jax.jit
    def f(ids, seed):
        upd = (jnp.ones((MK, width), dtype)
               * (1.0 + seed * 1e-6).astype(dtype))
        tbl = jnp.zeros((n, width), dtype)
        out = tbl.at[ids].add(upd)
        return jnp.sum(out[:128].astype(jnp.float32))
    return f

for width, dt in ((42, jnp.bfloat16), (42, jnp.float32), (8, jnp.bfloat16)):
    f = mk_scatter(width, dt)
    name = f"{width}x{np.dtype(dt).name if dt != jnp.bfloat16 else 'bf16'}"
    timeit(f, [(i, jnp.asarray(float(k)))
               for k, i in enumerate(ids_real)], tag=f"B real  {name}")
    timeit(f, [(i, jnp.asarray(float(k)))
               for k, i in enumerate(ids_uniq)], tag=f"B uniq  {name}")
    timeit(f, [(i, jnp.asarray(float(k)))
               for k, i in enumerate(ids_hot)], tag=f"B hot4k {name}")


# ---- B2) halved rows: does cost track rows? ----------------------------
def mk_scatter_rows(rows):
    @jax.jit
    def f(ids, seed):
        upd = jnp.ones((rows, 42), jnp.bfloat16) * (1.0 + seed * 1e-6
                                                    ).astype(jnp.bfloat16)
        tbl = jnp.zeros((n, 42), jnp.bfloat16)
        out = tbl.at[ids[:rows]].add(upd)
        return jnp.sum(out[:128].astype(jnp.float32))
    return f

for rows in (MK // 2, MK // 4):
    f = mk_scatter_rows(rows)
    timeit(f, [(i, jnp.asarray(float(k)))
               for k, i in enumerate(ids_real)], tag=f"B2 real rows={rows}")
