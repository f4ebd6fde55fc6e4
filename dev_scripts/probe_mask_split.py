"""Attribute the mask/compact stage's ~25 ms at 4.2M raster: how much is
the two occupancy gathers (its claimed ~15 ms floor) vs the two top_k
selections vs everything else?

Incremental variants of _two_level_hits_lazy (checksummed):
  coarse      - midpoint FMA + coarse-occ gather + reduce   (gather 1)
  +top1       - ... + first-C-segments top_k
  +fine       - ... + fine-sample FMA + occ gather + hit    (gather 2)
  full        - ... + second top_k + position select        (the stage)
Run at the bench scene/config (9216-ray raster chunks, D=400, L=4, C=24).
"""
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
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402

n = 4_200_000
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * .2 + .5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)

R, D, SR = 9216, 400, 24
H, W_img, FL = 480, 640, 580.0


def mk_raydir(i):
    r = np.random.default_rng(100 + i)
    row0 = int(r.integers(0, H - 16))
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / FL, (pix[:, 1] - H / 2) / FL,
                  np.ones(R)], -1).astype(np.float32)
    a = r.uniform(-0.4, 0.4)
    c, s = np.cos(a), np.sin(a)
    d = d @ np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32).T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d[None])


dirs = [mk_raydir(i) for i in range(3)]
campos = jnp.asarray([[0.0, 0.0, -1.2]])
raygen = find_ray_generation_method("near_far_linear")
G = 8   # dispatch G chunks per call like the bench

L, F = spec.seg_len, spec.coarse_factor
Gs = D // L
C = min(spec.seg_cap, Gs)
cdim = jnp.asarray(grid.coarse_occ.shape, jnp.int32)


def stage(raydir, upto):
    _, _, _, tvals = raygen(campos, raydir, D, near=0.1, far=8.0)
    B, Rr, _ = raydir.shape
    ts4 = tvals.reshape(B, Rr, Gs, L)
    t_mid = ts4[..., min(L // 2, L - 1)]
    mpos = campos[:, None, None, :] + raydir[:, :, None, :] * t_mid[..., None]
    ccoord = voxel_coords(mpos, spec) // F
    cin = jnp.all((ccoord >= 0) & (ccoord < cdim), axis=-1)
    cc = jnp.clip(ccoord, 0, cdim - 1)
    cocc = take3d(grid.coarse_occ, cc, grid.coarse_occ.shape) > 0
    seg_hit = cin & cocc
    if upto == "coarse":
        return jnp.sum(seg_hit.astype(jnp.int32))
    g_rng = jnp.arange(Gs, dtype=jnp.int32)
    top, top_g = jax.lax.top_k(jnp.where(seg_hit, Gs - g_rng, -1), C)
    seg_ok = top > 0
    seg_idx = jnp.clip(top_g, 0, Gs - 1)
    if upto == "top1":
        return jnp.sum(seg_idx * seg_ok)
    t_fine = jnp.take_along_axis(ts4, seg_idx[..., None], axis=2)
    fine_d = seg_idx[..., None] * L + jnp.arange(L, dtype=jnp.int32)
    fine_ok = seg_ok[..., None] & (fine_d < D)
    fine_d2 = jnp.minimum(fine_d, D - 1).reshape(B, Rr, C * L)
    fpos = (campos[:, None, None, :]
            + raydir[:, :, None, :] * t_fine.reshape(B, Rr, C * L)[..., None])
    coords = voxel_coords(fpos, spec)
    inb = in_bounds(coords, spec)
    ccf = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
    occ = take3d(grid.occ_mask, ccf, spec.vdim) > 0
    hit = inb & occ & fine_ok.reshape(B, Rr, C * L)
    if upto == "fine":
        return jnp.sum(hit.astype(jnp.int32))
    score = jnp.where(hit, D - fine_d2, -1)
    top2, top2_i = jax.lax.top_k(score, SR)
    smask = top2 > 0
    t_sel = jnp.take_along_axis(t_fine.reshape(B, Rr, C * L), top2_i, -1)
    loc = campos[:, None, None, :] + raydir[:, :, None, :] * t_sel[..., None]
    loc = jnp.where(smask[..., None], loc, 0.0)
    return jnp.sum(loc) + jnp.sum(smask.astype(jnp.int32))


def timed(upto, iters=10):
    @jax.jit
    def run(rds):
        return jnp.sum(jax.lax.map(lambda rd: stage(rd, upto),
                                   rds).astype(jnp.float32))
    stacked = [jnp.stack([dirs[(i + k) % 3] for k in range(G)])
               for i in range(3)]
    float(run(stacked[0]))
    t0 = time.perf_counter()
    vals = [run(stacked[i % 3]) for i in range(iters)]
    _ = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / (iters * G) * 1e3
    print(f"  [{upto:7s}] {dt:7.2f} ms/chunk", flush=True)
    return dt


t_c = timed("coarse")
t_1 = timed("top1")
t_f = timed("fine")
t_full = timed("full")
print(f"split: coarse(gather1) {t_c:.1f} | +top_k1 {t_1-t_c:+.1f} | "
      f"+fine(gather2) {t_f-t_1:+.1f} | +top_k2+select {t_full-t_f:+.1f} "
      f"| total {t_full:.1f}", flush=True)
