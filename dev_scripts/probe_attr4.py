"""Piecewise pricing of the EXACT tile-dedup attr gather at 4.2M raster.

probe_attr3: raster chunks have 0.57% unique attr ids (6.7k of 1.19M) and
<=491 unique per 64-ray tile — but the naive extract (top_k k=2048 +
1.77M-query searchsorted) cost 248 ms. This probe prices each candidate
primitive so the final design only uses affordable ones:

  sort      - jnp.sort of the (144, 12288) tile ids
  argsort2  - argsort + inverse permutation via second argsort
  rank      - first-occurrence flags + cumsum
  uniq_ss   - uniq via searchsorted(rank, iota U) + small take_along
  inv_pair  - inv via fused pairwise sum(uniq <= id) reduction
  gather    - big-table gather at NT*U unique rows
  redist    - einsum one-hot redistribute (NT,T,U)x(NT,U,C)
  FULL      - everything chained, checked exact vs the plain gather
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
T = int(os.environ.get("SGNERF_ATTR_T", 64))        # rays per tile
U = int(os.environ.get("SGNERF_ATTR_U", 512))
NT = R // T
TW = T * SRK                                        # rows per tile (12288)
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
    r = np.random.default_rng(300 + i)
    row0 = int(r.integers(0, H - 16))
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / F, (pix[:, 1] - H / 2) / F,
                  np.ones(R)], -1).astype(np.float32)
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
    return np.asarray(q.sample_pidx).reshape(-1)

pidx = [q_pidx(i) for i in range(3)]
ids_real = [jnp.asarray(p.astype(np.int32)) for p in pidx]

table = jnp.asarray(
    np.concatenate([np.asarray(cloud.xyz), np.asarray(cloud.embedding),
                    np.asarray(cloud.color), np.asarray(cloud.dir),
                    np.asarray(cloud.conf)], axis=-1)).astype(jnp.bfloat16)
Wc = table.shape[1]


def timeit(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


def tiles(ids):
    idsm = jnp.where(ids >= 0, ids, n)               # pad/invalid -> n
    return idsm.reshape(NT, TW)


@jax.jit
def p_sort(ids):
    return jnp.sum(jnp.sort(tiles(ids), axis=1) % 97)


@jax.jit
def p_argsort2(ids):
    o = jnp.argsort(tiles(ids), axis=1)
    io = jnp.argsort(o, axis=1)
    return jnp.sum(o % 97) + jnp.sum(io % 97)


@jax.jit
def p_rank(ids):
    s = jnp.sort(tiles(ids), axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    return jnp.sum(rank % 97)


def extract(ids):
    s = jnp.sort(tiles(ids), axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    first = first & (s < n)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    # uniq[u] = s at first position with rank == u: rank is nondecreasing,
    # so searchsorted over U queries per tile (tiny)
    posu = jax.vmap(lambda r: jnp.searchsorted(
        r, jnp.arange(U, dtype=jnp.int32)))(rank)   # (NT, U)
    oku = posu < TW
    uniq = jnp.where(
        oku, jnp.take_along_axis(s, jnp.clip(posu, 0, TW - 1), axis=1), n)
    return uniq


@jax.jit
def p_uniq(ids):
    return jnp.sum(extract(ids) % 97)


@jax.jit
def p_inv(ids):
    uniq = extract(ids)
    idsm = tiles(ids)
    # fused pairwise: inv[j] = #uniq entries < id_j  (uniq ascending)
    inv = jnp.sum((uniq[:, None, :] < idsm[:, :, None]),
                  axis=2).astype(jnp.int32)
    hit = jnp.take_along_axis(uniq, jnp.clip(inv, 0, U - 1), axis=1) == idsm
    return jnp.sum(inv) + jnp.sum(hit)


@jax.jit
def p_gather(tbl, ids):
    uniq = extract(ids)
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)]
    return jnp.sum(rows.astype(jnp.float32))


@jax.jit
def p_full(tbl, ids):
    uniq = extract(ids)
    idsm = tiles(ids)
    inv = jnp.sum((uniq[:, None, :] < idsm[:, :, None]),
                  axis=2).astype(jnp.int32)
    invc = jnp.clip(inv, 0, U - 1)
    hit = jnp.take_along_axis(uniq, invc, axis=1) == idsm
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(NT, U, Wc)
    onehot = (jax.nn.one_hot(invc, U, dtype=jnp.bfloat16)
              * hit[..., None].astype(jnp.bfloat16))
    out = jnp.einsum("ntu,nuc->ntc", onehot, rows,
                     preferred_element_type=jnp.float32)
    return jnp.sum(out)


@jax.jit
def g_plain(tbl, ids):
    return jnp.sum(tbl[jnp.maximum(ids, 0)].astype(jnp.float32))


timeit(g_plain, [(table, i) for i in ids_real], tag="baseline")
timeit(p_sort, [(i,) for i in ids_real], tag="sort")
timeit(p_argsort2, [(i,) for i in ids_real], tag="argsort2")
timeit(p_rank, [(i,) for i in ids_real], tag="sort+rank")
timeit(p_uniq, [(i,) for i in ids_real], tag="extract(uniq)")
timeit(p_inv, [(i,) for i in ids_real], tag="extract+inv")
timeit(p_gather, [(table, i) for i in ids_real],
       tag=f"extract+gather {NT*U}")
timeit(p_full, [(table, i) for i in ids_real], tag=f"FULL T={T} U={U}")


# exactness (invalid rows excluded on both sides)
@jax.jit
def f_vals(tbl, ids):
    uniq = extract(ids)
    idsm = tiles(ids)
    inv = jnp.sum((uniq[:, None, :] < idsm[:, :, None]),
                  axis=2).astype(jnp.int32)
    invc = jnp.clip(inv, 0, U - 1)
    hit = jnp.take_along_axis(uniq, invc, axis=1) == idsm
    rows = tbl[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(NT, U, Wc)
    onehot = (jax.nn.one_hot(invc, U, dtype=jnp.bfloat16)
              * hit[..., None].astype(jnp.bfloat16))
    return jnp.einsum("ntu,nuc->ntc", onehot, rows,
                      preferred_element_type=jnp.float32).reshape(-1, Wc)

got = np.asarray(f_vals(table, ids_real[0]))
mask = (pidx[0] >= 0)[:, None]
ref = np.asarray(table[jnp.maximum(ids_real[0], 0)].astype(jnp.float32))
diff = np.abs(np.where(mask, got - ref, 0)).max()
print(f"exactness (valid rows): max |diff| = {diff:.3e}", flush=True)
