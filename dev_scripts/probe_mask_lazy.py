"""Mask/compact stage: lazy sample positions vs materialized raypos.

The two-level compaction currently take_along_axis-gathers 3D positions
from the materialized raypos (B,R,D,3): segment midpoints (921k rows),
fine samples (885k rows x 12 B), selected locs (221k rows). raygen already
returns per-sample depths ts (B,R,D); positions are campos + t*dir — so
the gathers can move to t-space: midpoints become a PURE SLICE
(ts.reshape(B,R,G,L)[..., L//2]), fine samples one (B*R*G -> B*R*C)
L-wide row gather, and positions elementwise FMA. Equality is exact.
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
from sgnerf_tpu.ops.query import (  # noqa: E402
    mask_and_compact_samples, compact_hits)
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8
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

H, W_img, FL = 480, 640, 580.0


def mk_raydir(i):
    r = np.random.default_rng(300 + i)
    row0 = int(r.integers(0, H - 16))
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / FL, (pix[:, 1] - H / 2) / FL,
                  np.ones(R)], -1).astype(np.float32)
    a = r.uniform(-0.4, 0.4)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    d = d @ rot.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d[None])

raydirs = [mk_raydir(i) for i in range(4)]
campos = jnp.asarray([[0.0, 0.0, -1.2]])


def timeit(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


@jax.jit
def s1_cur(grid, raydir):
    raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
    loc, smask, _ = mask_and_compact_samples(raypos, grid, SR)
    return jnp.sum(loc) + jnp.sum(smask)


def lazy_two_level(grid, raydir, ts):
    spec_ = grid.spec
    B = 1
    L, F = spec_.seg_len, spec_.coarse_factor
    G = D // L
    C = min(spec_.seg_cap, G)
    cdim = jnp.asarray(grid.coarse_occ.shape, jnp.int32)
    ts4 = ts.reshape(B, R, G, L)
    t_mid = ts4[..., min(L // 2, L - 1)]                     # (B,R,G) slice
    mpos = campos[:, None, None, :] + raydir[:, :, None, :] * t_mid[..., None]
    ccoord = voxel_coords(mpos, spec_) // F
    cin = jnp.all((ccoord >= 0) & (ccoord < cdim), axis=-1)
    cc = jnp.clip(ccoord, 0, cdim - 1)
    cocc = take3d(grid.coarse_occ, cc, grid.coarse_occ.shape) > 0
    seg_hit = cin & cocc

    g_rng = jnp.arange(G, dtype=jnp.int32)
    top, top_g = jax.lax.top_k(jnp.where(seg_hit, G - g_rng, -1), C)
    seg_ok = top > 0
    seg_idx = jnp.clip(top_g, 0, G - 1)

    t_fine = jnp.take_along_axis(ts4, seg_idx[..., None], axis=2)  # (B,R,C,L)
    fine_d = seg_idx[..., None] * L + jnp.arange(L, dtype=jnp.int32)
    fine_ok = seg_ok[..., None] & (fine_d < D)
    fine_d2 = jnp.minimum(fine_d, D - 1).reshape(B, R, C * L)
    fpos = (campos[:, None, None, :]
            + raydir[:, :, None, :] * t_fine.reshape(B, R, C * L)[..., None])
    coords = voxel_coords(fpos, spec_)
    inb = in_bounds(coords, spec_)
    ccf = jnp.clip(coords, 0, jnp.asarray(spec_.vdim, jnp.int32) - 1)
    occ = take3d(grid.occ_mask, ccf, spec_.vdim) > 0
    hit = inb & occ & fine_ok.reshape(B, R, C * L)

    score = jnp.where(hit, D - fine_d2, -1)
    top2, top2_i = jax.lax.top_k(score, SR)
    smask = top2 > 0
    t_sel = jnp.take_along_axis(t_fine.reshape(B, R, C * L), top2_i,
                                axis=-1)
    loc = campos[:, None, None, :] + raydir[:, :, None, :] * t_sel[..., None]
    loc = jnp.where(smask[..., None], loc, 0.0)
    return loc, smask


@jax.jit
def s1_lazy(grid, raydir):
    _, _, _, ts = raygen(campos, raydir, D, near=0.1, far=8.0)
    loc, smask = lazy_two_level(grid, raydir, ts)
    return jnp.sum(loc) + jnp.sum(smask)


@jax.jit
def vals_cur(grid, raydir):
    raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
    loc, smask, _ = mask_and_compact_samples(raypos, grid, SR)
    return loc, smask


@jax.jit
def vals_lazy(grid, raydir):
    _, _, _, ts = raygen(campos, raydir, D, near=0.1, far=8.0)
    return lazy_two_level(grid, raydir, ts)


lc, mc = vals_cur(grid, raydirs[0])
ll, ml = vals_lazy(grid, raydirs[0])
print(f"parity: mask equal {bool(jnp.all(mc == ml))}, "
      f"max loc diff {float(jnp.max(jnp.abs(lc - ll))):.2e}", flush=True)

timeit(s1_cur, [(grid, r) for r in raydirs], tag="current mask/compact")
timeit(s1_lazy, [(grid, r) for r in raydirs], tag="lazy-t mask/compact")
