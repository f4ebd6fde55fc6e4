"""Attr-gather attack candidates at 4.2M, priced piecewise.

probe_attr_locality killed the sorting idea (spatial order LOSES at both
scales; per-row cost is table-size-bound and clustering hurts). The live
candidates:
  1) per-ray dedup two-level gather: rays average ~15 unique ids of 192
     (139k/1.77M chunk-wide) -> gather (B*R, U) unique rows from the big
     table, redistribute per-ray with an exact one-hot MXU matmul.
  2) int8 attribute table: 176 -> 88 MB — does the per-row rate follow
     the table size back down?

Pieces measured:
  stats   - per-ray unique distribution (sets U)
  g_uniq  - big-table gather at B*R*U rows (stage 1 of the dedup)
  extract - per-ray unique extraction + inverse-rank (sort-free pairwise)
  redist  - one-hot MXU redistribute (stage 2)
  full    - extract + gather + redistribute end-to-end
  int8    - real-id gather from an int8 table (rate vs bf16)
  half    - real-id gather from a bf16 table of HALF the columns (21) —
            separates table-BYTES from table-ROWS in the size penalty
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.ops.query import query_neighbors  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8
SRK = SR * K
raygen = find_ray_generation_method("near_far_linear")


def timeit(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)


def q_pidx(i):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    raypos, _, _, _ = raygen(jnp.asarray([[0., 0., -1.5]]),
                             jnp.asarray(d), D, near=0.1, far=8.0)
    q = query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                        radius_limit=4 * 0.016, knn_mode="fused")
    return np.asarray(q.sample_pidx).reshape(R, SRK)

pidx = [q_pidx(i) for i in range(3)]

# ---- stats: per-ray unique ids ----------------------------------------
p = pidx[0]
uniq_counts = np.array([len(np.unique(row[row >= 0])) for row in p])
print(f"per-ray unique: mean {uniq_counts.mean():.1f} "
      f"p50 {np.percentile(uniq_counts, 50):.0f} "
      f"p95 {np.percentile(uniq_counts, 95):.0f} "
      f"p99 {np.percentile(uniq_counts, 99):.0f} "
      f"p99.9 {np.percentile(uniq_counts, 99.9):.0f} "
      f"max {uniq_counts.max()}", flush=True)

table = jnp.asarray(
    np.concatenate([np.asarray(cloud.xyz), np.asarray(cloud.embedding),
                    np.asarray(cloud.color), np.asarray(cloud.dir),
                    np.asarray(cloud.conf)], axis=-1)).astype(jnp.bfloat16)
W = table.shape[1]
ids_real = [jnp.asarray(np.where(q >= 0, q, 0).reshape(-1).astype(np.int32))
            for q in pidx]
M = R * SRK


@jax.jit
def g_plain(tbl, ids):
    return jnp.sum(tbl[ids].astype(jnp.float32))

timeit(g_plain, [(table, i) for i in ids_real], tag="baseline bf16x42")

# ---- int8 / half-width tables -----------------------------------------
t8 = jnp.asarray((np.asarray(table, np.float32) * 0).astype(np.int8)
                 + np.ones((n, W), np.int8))
timeit(g_plain, [(t8, i) for i in ids_real], tag="int8 x42 (88 MB)")
timeit(g_plain, [(table[:, :21], i) for i in ids_real],
       tag="bf16 x21 (88 MB)")
timeit(g_plain, [(table[:, :8], i) for i in ids_real],
       tag="bf16 x8  (34 MB)")

# ---- dedup pipeline ----------------------------------------------------
U = int(os.environ.get("SGNERF_DEDUP_U", 64))
SENT = np.int32(2 ** 30)


def extract(ids2):                                   # (BR, SRK) with -1
    """Per-ray unique ids (ascending, SENT-padded) + inverse rank."""
    idsm = jnp.where(ids2 >= 0, ids2, SENT)
    s = jnp.sort(idsm, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    first = first & (s < SENT)
    pos = jnp.arange(SRK, dtype=jnp.int32)
    score = jnp.where(first, SRK - pos, -1)
    _, topp = jax.lax.top_k(score, U)                # first U first-occ pos
    ok = jnp.take_along_axis(score, topp, axis=1) > 0
    uniq = jnp.where(ok, jnp.take_along_axis(s, topp, axis=1), SENT)
    # inverse rank WITHOUT inverting a permutation: rank_orig[j] =
    # #uniq entries < ids[j]; == exact match position since uniq ascending
    inv = jnp.sum((uniq[:, None, :] <= idsm[:, :, None])
                  & (uniq[:, None, :] < SENT), axis=2) - 1   # (BR, SRK)
    valid = (ids2 >= 0) & (inv >= 0) & (inv < U)
    return uniq, jnp.clip(inv, 0, U - 1), valid


@jax.jit
def f_extract(ids):
    uniq, inv, valid = extract(ids.reshape(R, SRK))
    return (jnp.sum(uniq.astype(jnp.int64) % 97).astype(jnp.float32)
            + jnp.sum(inv) + jnp.sum(valid))


@jax.jit
def f_gather_uniq(tbl, ids):
    uniq, inv, valid = extract(ids.reshape(R, SRK))
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)]
    return jnp.sum(rows.astype(jnp.float32))


@jax.jit
def f_full(tbl, ids):
    uniq, inv, valid = extract(ids.reshape(R, SRK))
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)]    # (BR*U, W)
    rows = rows.reshape(R, U, W)
    onehot = (jax.nn.one_hot(inv, U, dtype=jnp.bfloat16)
              * valid[..., None].astype(jnp.bfloat16))  # (BR, SRK, U)
    out = jnp.einsum("rsu,ruw->rsw", onehot, rows,
                     preferred_element_type=jnp.float32)
    return jnp.sum(out)


@jax.jit
def f_full_takealong(tbl, ids):
    uniq, inv, valid = extract(ids.reshape(R, SRK))
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(R, U, W)
    out = jnp.take_along_axis(rows, inv[..., None], axis=1)
    out = out * valid[..., None].astype(out.dtype)
    return jnp.sum(out.astype(jnp.float32))


timeit(f_extract, [(i,) for i in ids_real], tag=f"extract U={U}")
timeit(f_gather_uniq, [(table, i) for i in ids_real],
       tag=f"extract+gather {R*U} rows")
timeit(f_full, [(table, i) for i in ids_real], tag=f"FULL onehot U={U}")
timeit(f_full_takealong, [(table, i) for i in ids_real],
       tag=f"FULL take_along U={U}")

# exactness check of the full pipeline vs the plain gather
ids0 = ids_real[0]
ref = np.asarray(jnp.where((jnp.asarray(pidx[0].reshape(-1)) >= 0)[:, None],
                           table[ids0].astype(jnp.float32), 0.0))


@jax.jit
def f_vals(tbl, ids):
    uniq, inv, valid = extract(ids.reshape(R, SRK))
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(R, U, W)
    onehot = (jax.nn.one_hot(inv, U, dtype=jnp.bfloat16)
              * valid[..., None].astype(jnp.bfloat16))
    return jnp.einsum("rsu,ruw->rsw", onehot, rows,
                      preferred_element_type=jnp.float32).reshape(-1, W)

got = np.asarray(f_vals(table, ids0))
print(f"exactness: max |diff| = {np.abs(got - ref).max():.3e} "
      f"(overflowed rays at U={U}: "
      f"{(uniq_counts > U).sum()}/{R})", flush=True)
