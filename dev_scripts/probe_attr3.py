"""Raster-chunk attribute-id duplication at 4.2M — sizes the tile-dedup.

probe_attr2: per-row gather cost tracks TABLE BYTES; per-RAY dedup can't
be exact (p-ray unique up to 168/192). The real eval workload renders
RASTER chunks (render_image: consecutive pixels of a 640x480 frame), where
adjacent rays traverse the same voxels — probe_tile_unique_attr measured
83 unique of 12288 rows per 64-ray tile at 1M. This probe re-measures at
4.2M (denser caches = more distinct points) and prices the tile-dedup'd
two-level gather at the measured cap.

Prints per-tile unique attr ids for T in {64, 128} over raster chunks from
several cameras, then times the candidate pipeline at the p-max-safe cap.
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

H, W_img, F = 480, 640, 580.0


def raster_raydirs(i):
    """9216 consecutive raster pixels (14.4 rows) of a 640x480 pinhole
    camera, from a varied pose — what render_image's chunks look like."""
    r = np.random.default_rng(300 + i)
    row0 = int(r.integers(0, H - 16))
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / F, (pix[:, 1] - H / 2) / F,
                  np.ones(R)], -1).astype(np.float32)
    # random small rotation so calls vary
    a = r.uniform(-0.3, 0.3)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    d = d @ rot.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d[None])


def q_pidx(i):
    raypos, _, _, _ = raygen(jnp.asarray([[0., 0., -1.2]]),
                             raster_raydirs(i), D, near=0.1, far=8.0)
    q = query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                        radius_limit=4 * 0.016, knn_mode="fused")
    return np.asarray(q.sample_pidx).reshape(R, SRK)

pidx = [q_pidx(i) for i in range(3)]
p0 = pidx[0]
print(f"chunk global unique: "
      f"{len(np.unique(p0[p0 >= 0]))} of {int((p0 >= 0).sum())} valid "
      f"rows", flush=True)
for T in (64, 128):
    nt = R // T
    uc = np.array([len(np.unique(
        p0[t * T:(t + 1) * T][p0[t * T:(t + 1) * T] >= 0]))
        for t in range(nt)])
    print(f"T={T:4d}: unique/tile mean {uc.mean():.0f} p50 "
          f"{np.percentile(uc, 50):.0f} p95 {np.percentile(uc, 95):.0f} "
          f"p99 {np.percentile(uc, 99):.0f} max {uc.max()} "
          f"(rows/tile {T*SRK})", flush=True)

# ---- price the tile-dedup at T=64 with a safe cap ----------------------
T = int(os.environ.get("SGNERF_ATTR_T", 64))
U = int(os.environ.get("SGNERF_ATTR_U", 2048))
NT = R // T
SENT = np.int32(2 ** 30)

table = jnp.asarray(
    np.concatenate([np.asarray(cloud.xyz), np.asarray(cloud.embedding),
                    np.asarray(cloud.color), np.asarray(cloud.dir),
                    np.asarray(cloud.conf)], axis=-1)).astype(jnp.bfloat16)
Wc = table.shape[1]
ids_real = [jnp.asarray(np.where(q >= 0, q, -1).reshape(-1).astype(np.int32))
            for q in pidx]


def timeit(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


@jax.jit
def g_plain(tbl, ids):
    return jnp.sum(tbl[jnp.maximum(ids, 0)].astype(jnp.float32))


def extract_tiles(ids2):                         # (NT, T*SRK), -1 invalid
    idsm = jnp.where(ids2 >= 0, ids2, SENT)
    s = jnp.sort(idsm, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    first = first & (s < SENT)
    pos = jnp.arange(s.shape[1], dtype=jnp.int32)
    score = jnp.where(first, s.shape[1] - pos, -1)
    _, topp = jax.lax.top_k(score, U)
    ok = jnp.take_along_axis(score, topp, axis=1) > 0
    uniq = jnp.where(ok, jnp.take_along_axis(s, topp, axis=1), SENT)
    # rank of each original id among the tile's ascending uniques via
    # searchsorted per tile
    inv = jax.vmap(
        lambda u, q: jnp.searchsorted(u, q, side="left"))(uniq, idsm)
    valid = (ids2 >= 0) & (inv < U)
    invc = jnp.clip(inv, 0, U - 1)
    hit = jnp.take_along_axis(uniq, invc, axis=1) == idsm
    return uniq, invc, valid & hit


@jax.jit
def f_full_tiles(tbl, ids):
    ids2 = ids.reshape(NT, T * SRK)
    uniq, inv, valid = extract_tiles(ids2)
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(NT, U, Wc)
    # per-tile redistribute: take_along_axis on the small temp
    out = jnp.take_along_axis(rows, inv[..., None], axis=1)
    out = out * valid[..., None].astype(out.dtype)
    return jnp.sum(out.astype(jnp.float32))


@jax.jit
def f_extract_only(ids):
    uniq, inv, valid = extract_tiles(ids.reshape(NT, T * SRK))
    return jnp.sum(uniq % 97) + jnp.sum(inv) + jnp.sum(valid)


timeit(g_plain, [(table, i) for i in ids_real], tag="baseline bf16x42")
timeit(f_extract_only, [(i,) for i in ids_real],
       tag=f"extract T={T} U={U}")
timeit(f_full_tiles, [(table, i) for i in ids_real],
       tag=f"FULL tile-dedup T={T} U={U}")

# exactness vs plain gather
ids0 = ids_real[0]
mask0 = (jnp.asarray(pidx[0].reshape(-1)) >= 0)[:, None]
ref = np.asarray(jnp.where(mask0, table[jnp.maximum(ids0, 0)
                                        ].astype(jnp.float32), 0.0))


@jax.jit
def f_vals(tbl, ids):
    ids2 = ids.reshape(NT, T * SRK)
    uniq, inv, valid = extract_tiles(ids2)
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(NT, U, Wc)
    out = jnp.take_along_axis(rows, inv[..., None], axis=1)
    out = out * valid[..., None].astype(out.dtype)
    return out.astype(jnp.float32).reshape(-1, Wc)

got = np.asarray(f_vals(table, ids0))
print(f"exactness: max |diff| = {np.abs(got - ref).max():.3e}", flush=True)
