"""Shading-point selection and K-nearest neural-point query (XLA).

TPU-native replacement for the reference CUDA kernels `mask_raypos`,
`get_shadingloc(_with_semantic)` and `query_neigh_along_ray_layered(
_semantic_guidance)` (/root/reference/models/neural_points/
query_point_indices_worldcoords.py:413-681).

Design deltas from the reference (deliberate, TPU-first):
  * Static shapes: rays are never compacted away; invalid rays simply carry
    ray_mask=0 (the reference dynamically shrinks R twice per call, which is
    incompatible with XLA and with multi-chip sharding).
  * The neighbor search scans the full kernel_size^3 voxel neighborhood and
    takes the exact K nearest in-radius candidates (deterministic top-K). The
    reference walks voxel shells outward and early-stops a shell after K
    acceptances, so it can return farther neighbors than ours; ours is a
    strict improvement and metric-parity compatible (SURVEY §7 "hard parts").
  * Semantic guidance uses a per-candidate Bernoulli draw with matched
    acceptance probability instead of the reference's single wall-clock draw
    shared by every candidate in a launch (`seconds%10`, :553).

This module is also the correctness oracle for the fused Pallas kernel.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .grid import (GridSpec, PointGrid, voxel_coords, in_bounds, linear_vid,
                   take3d as _take3d)


class QueryResult(NamedTuple):
    sample_pidx: jnp.ndarray    # (B,R,SR,K) int32 point ids, -1 invalid
    sample_loc_w: jnp.ndarray   # (B,R,SR,3) world-space shading points
    sample_loc_mask: jnp.ndarray  # (B,R,SR) bool: slot holds a shading point
    ray_mask: jnp.ndarray       # (B,R) bool: ray has >=1 queried neighbor
    sample_label: Optional[jnp.ndarray] = None  # (B,R,SR) int32 or None


def compact_hits(hit: jnp.ndarray, SR: int):
    """Compact the first SR True entries along the last axis of `hit`
    (..., D) into (smask (..., SR), gather_d (..., SR) source indices).

    "first SR hits along the ray" as ONE top_k (TPU-friendly; per-ray
    scatter loops serialize badly): score hits by D-d so the SR largest
    scores are the SR smallest d, returned in ascending-d order. Also used
    by the spatially-sharded renderer on the psum-merged hit mask."""
    D = hit.shape[-1]
    d_rng = jnp.arange(D, dtype=jnp.int32)
    score = jnp.where(hit, D - d_rng, -1)
    top, top_d = jax.lax.top_k(score, SR)
    return top > 0, jnp.clip(top_d, 0, D - 1)


def mask_and_compact_samples(raypos: jnp.ndarray, grid: PointGrid, SR: int,
                             ray_label: Optional[jnp.ndarray] = None,
                             campos: Optional[jnp.ndarray] = None,
                             raydir: Optional[jnp.ndarray] = None,
                             tvals: Optional[jnp.ndarray] = None):
    """Mask ray samples by dilated occupancy and compact the first SR hits.

    raypos: (B,R,D,3). Returns (sample_loc_w (B,R,SR,3), sample_mask (B,R,SR),
    sample_label (B,R,SR) or None).

    Matches `mask_raypos` + cumsum compaction + `get_shadingloc`
    (reference :413-487, :843-874): along each ray, the first SR samples whose
    voxel is within kernel_size of an occupied voxel become shading points.

    With campos (B,3) + raydir (B,R,3) + tvals (B,R,D) also given and the
    two-level path active, positions are computed LAZILY from the sample
    depths (campos + t*dir) instead of gathered from the materialized
    raypos — bit-identical, drops three (0.9M/0.9M/0.2M)-row 12-byte
    gathers for one L-wide segment gather + FMAs (-4.4 ms/chunk at 4.2M,
    probe_mask_lazy.py; raypos itself is then dead code XLA prunes).
    """
    spec = grid.spec
    B, R, D, _ = raypos.shape
    lazy = (campos is not None and raydir is not None and tvals is not None
            and spec.coarse_factor > 1 and grid.coarse_occ.size > 0
            and D % spec.seg_len == 0)
    if lazy:
        loc, smask = _two_level_hits_lazy(campos, raydir, tvals, grid, SR)
    elif spec.coarse_factor > 1 and grid.coarse_occ.size > 0:
        smask, gather_d = _two_level_hits(raypos, grid, SR)
    else:
        coords = voxel_coords(raypos, spec)
        inb = in_bounds(coords, spec)
        cc = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        occ = _take3d(grid.occ_mask, cc, spec.vdim) > 0
        hit = inb & occ  # (B,R,D)
        smask, gather_d = compact_hits(hit, SR)
    if not lazy:
        loc = jnp.take_along_axis(raypos, gather_d[..., None], axis=2)
        loc = jnp.where(smask[..., None], loc, 0.0)
    lbl = None
    if ray_label is not None:
        # per-ray label broadcast along samples (reference repeats it, :110)
        lbl = jnp.where(smask, ray_label[..., None].astype(jnp.int32), 0)
    return loc, smask, lbl


def _two_level_hits(raypos, grid: PointGrid, SR: int):
    """Two-level sample compaction: the flat path pays one gather ROW per
    sample (B*R*D rows — the dominant query cost; TPU gather cost is
    per-row). Instead: (1) test each length-L ray segment's midpoint
    against the 3^3-dilated coarse occupancy (D/L rows), (2) keep the
    first seg_cap hit segments per ray (top_k, no gather), (3) fine-test
    only their seg_cap*L samples. Conservative (never misses a flat-path
    hit) iff (L-1)/2 * step < coarse_factor*vsize and seg_cap covers the
    segments holding the first SR hits — validated against the flat path
    in tests/test_grid_query.py.

    Returns (smask (B,R,SR), gather_d (B,R,SR) sample indices)."""
    spec = grid.spec
    B, R, D, _ = raypos.shape
    L, F = spec.seg_len, spec.coarse_factor
    G = (D + L - 1) // L
    C = min(spec.seg_cap, G)
    cdim = jnp.asarray(grid.coarse_occ.shape, jnp.int32)

    # (1) coarse test at segment midpoints
    mid = jnp.minimum(jnp.arange(G, dtype=jnp.int32) * L + L // 2, D - 1)
    mpos = raypos[:, :, mid, :]                              # (B,R,G,3)
    ccoord = voxel_coords(mpos, spec) // F
    cin = jnp.all((ccoord >= 0) & (ccoord < cdim), axis=-1)
    cc = jnp.clip(ccoord, 0, cdim - 1)
    cocc = _take3d(grid.coarse_occ, cc, grid.coarse_occ.shape) > 0
    seg_hit = cin & cocc                                     # (B,R,G)

    # (2) first C hit segments, ascending
    g_rng = jnp.arange(G, dtype=jnp.int32)
    top, top_g = jax.lax.top_k(jnp.where(seg_hit, G - g_rng, -1), C)
    seg_ok = top > 0                                         # (B,R,C)
    seg_idx = jnp.clip(top_g, 0, G - 1)

    # (3) fine-test the selected segments' samples only
    fine_d = seg_idx[..., None] * L + jnp.arange(L, dtype=jnp.int32)
    fine_ok = seg_ok[..., None] & (fine_d < D)               # (B,R,C,L)
    fine_d = jnp.minimum(fine_d, D - 1).reshape(B, R, C * L)
    fpos = jnp.take_along_axis(raypos, fine_d[..., None], axis=2)
    coords = voxel_coords(fpos, spec)
    inb = in_bounds(coords, spec)
    ccf = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
    occ = _take3d(grid.occ_mask, ccf, spec.vdim) > 0
    hit = inb & occ & fine_ok.reshape(B, R, C * L)

    # first SR hits in original sample order
    score = jnp.where(hit, D - fine_d, -1)                   # (B,R,C*L)
    top2, top2_i = jax.lax.top_k(score, SR)
    smask = top2 > 0
    gather_d = jnp.take_along_axis(fine_d, top2_i, axis=-1)
    return smask, jnp.clip(gather_d, 0, D - 1)


def _two_level_hits_lazy(campos, raydir, tvals, grid: PointGrid, SR: int):
    """`_two_level_hits` with positions computed from per-sample depths:
    segment midpoints are a pure reshape-slice of tvals, fine samples one
    L-wide take_along over the G axis, and every 3-D position an FMA.
    Bit-identical to the raypos-gather path (probe_mask_lazy.py parity).
    Returns (loc (B,R,SR,3), smask (B,R,SR))."""
    spec = grid.spec
    B, R, D = tvals.shape
    L, F = spec.seg_len, spec.coarse_factor
    G = D // L
    C = min(spec.seg_cap, G)
    cdim = jnp.asarray(grid.coarse_occ.shape, jnp.int32)
    ts4 = tvals.reshape(B, R, G, L)

    t_mid = ts4[..., min(L // 2, L - 1)]                     # (B,R,G)
    mpos = campos[:, None, None, :] + raydir[:, :, None, :] * t_mid[..., None]
    ccoord = voxel_coords(mpos, spec) // F
    cin = jnp.all((ccoord >= 0) & (ccoord < cdim), axis=-1)
    cc = jnp.clip(ccoord, 0, cdim - 1)
    cocc = _take3d(grid.coarse_occ, cc, grid.coarse_occ.shape) > 0
    seg_hit = cin & cocc                                     # (B,R,G)

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
    coords = voxel_coords(fpos, spec)
    inb = in_bounds(coords, spec)
    ccf = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
    occ = _take3d(grid.occ_mask, ccf, spec.vdim) > 0
    hit = inb & occ & fine_ok.reshape(B, R, C * L)

    score = jnp.where(hit, D - fine_d2, -1)
    top2, top2_i = jax.lax.top_k(score, SR)
    smask = top2 > 0
    t_sel = jnp.take_along_axis(t_fine.reshape(B, R, C * L), top2_i, axis=-1)
    loc = campos[:, None, None, :] + raydir[:, :, None, :] * t_sel[..., None]
    return jnp.where(smask[..., None], loc, 0.0), smask


def bucket_candidates(grid: PointGrid, sample_loc_w: jnp.ndarray,
                      smask: jnp.ndarray):
    """KNN candidate enumeration from the bucket tables (the nbr_cache=0
    path): visit the kernel_size^3 voxel neighborhood of each shading
    point and collect its buckets' candidates. Shared by query_neighbors
    and the perspective slab-sharded querier (parallel/spatial.py).

    Returns (cand (...,Kv,P) int32 ids, cand_ok bool, d2, flat_shape)."""
    spec = grid.spec
    B, R, SR, _ = sample_loc_w.shape
    offsets = _neighbor_offsets(spec.kernel_size)  # (Kv,3)

    c = voxel_coords(sample_loc_w, spec)                      # (B,R,SR,3)
    nbr = c[..., None, :] + offsets                            # (B,R,SR,Kv,3)
    nbr_ok = in_bounds(nbr, spec)
    nc = jnp.clip(nbr, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
    slot = _take3d(grid.vox_slot, nc, spec.vdim)               # (B,R,SR,Kv)
    slot_ok = nbr_ok & (slot >= 0)
    slot_c = jnp.clip(slot, 0, spec.max_o - 1)

    cand = grid.bucket_pnts[slot_c]                            # (B,R,SR,Kv,P)
    cnt = grid.bucket_cnt[slot_c]                              # (B,R,SR,Kv)
    rank_ok = jnp.arange(spec.P, dtype=jnp.int32) < cnt[..., None]
    cand_ok = (slot_ok[..., None] & rank_ok & (cand >= 0)
               & smask[..., None, None])

    # candidate coords from the packed (max_o,P,3) table: one contiguous
    # (P,3) block per visited voxel instead of Kv*P scalar row gathers
    cxyz = grid.bucket_xyz[slot_c]                             # (B,R,SR,Kv,P,3)
    d2 = jnp.sum(
        (cxyz - sample_loc_w[..., None, None, :]) ** 2, axis=-1)
    Kv = offsets.shape[0]
    return cand, cand_ok, d2, (B, R, SR, Kv * spec.P)


def _neighbor_offsets(kernel_size):
    kx, ky, kz = kernel_size
    ox = np.arange(kx) - kx // 2
    oy = np.arange(ky) - ky // 2
    oz = np.arange(kz) - kz // 2
    grid = np.stack(np.meshgrid(ox, oy, oz, indexing="ij"), axis=-1)
    return jnp.asarray(grid.reshape(-1, 3), dtype=jnp.int32)  # (Kv,3)


@partial(jax.jit, static_argnames=("K", "SR", "semantic_guidance",
                                   "knn_mode", "dedup_tile", "dedup_cap"))
def query_neighbors(grid: PointGrid, points_xyz: jnp.ndarray,
                    raypos: jnp.ndarray, K: int, SR: int,
                    radius_limit: float | jnp.ndarray,
                    ray_label: Optional[jnp.ndarray] = None,
                    points_label: Optional[jnp.ndarray] = None,
                    points_label_prob: Optional[jnp.ndarray] = None,
                    key: Optional[jax.Array] = None,
                    semantic_guidance: bool = False,
                    knn_mode: str = "exact",
                    dedup_tile: int = 64,
                    dedup_cap: int = 160,
                    campos: Optional[jnp.ndarray] = None,
                    raydir: Optional[jnp.ndarray] = None,
                    tvals: Optional[jnp.ndarray] = None,
                    guide_u: Optional[jnp.ndarray] = None) -> QueryResult:
    """Full query pipeline: sample masking -> SR compaction -> KNN.

    points_xyz: (N,3) the full (padded) point store; raypos: (B,R,D,3).
    radius_limit: scalar, 0 disables the radius test.
    With semantic_guidance: ray_label (B,R) int, points_label (N,) int,
    points_label_prob (N,C) float, key a PRNG key.
    knn_mode "dedup" (raster rendering): tiles of `dedup_tile` consecutive
    rays gather each DISTINCT cache row once (<= `dedup_cap` per tile) and
    redistribute in-kernel — adjacent raster rays traverse the same voxels
    (9-23x fewer gather rows, probe_tile_unique.py). Exact vs "fused"/
    "exact" when no tile exceeds dedup_cap distinct voxels; overflowed
    shading points degrade to no neighbors. Random/shuffled ray batches
    (training) should keep "fused".
    """
    spec = grid.spec
    B, R, D, _ = raypos.shape
    N = points_xyz.shape[0]

    sample_loc_w, smask, sample_label = mask_and_compact_samples(
        raypos, grid, SR, ray_label if semantic_guidance else None,
        campos=campos, raydir=raydir, tvals=tvals)

    if spec.nbr_cache > 0 and grid.nbr_packed.shape[0] > 0:
        # fast path: ONE gather per shading point from the merged
        # neighborhood cache (C candidates vs Kv*P; 27x fewer gather rows).
        # Coordinates AND point ids live in one packed int16 row — TPU gather
        # cost is per row, so one 640B gather beats two 320B ones 2x
        # (probe_xla_gather.py).
        c = voxel_coords(sample_loc_w, spec)                  # (B,R,SR,3)
        cin = in_bounds(c, spec)
        cc = jnp.clip(c, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        slot = _take3d(grid.dil_slot, cc, spec.vdim)
        slot_ok = cin & (slot >= 0) & smask
        max_d = grid.nbr_packed.shape[0]
        slot_c = jnp.clip(slot, 0, max_d - 1)
        from .grid import unpack_cache
        # barrier: one materialization of the 640B-row gather (XLA otherwise
        # duplicates it into the offset and pidx consumers' fusions).
        # NOTE a Pallas per-row-DMA alternative was A/B'd and is a measured
        # dead end on this toolchain: Mosaic tiles the (max_d, C*W) cache to
        # (8,128) HBM layout and crashes on dynamic row slices; the working
        # (T,8,128) tile layout would amplify the cache 6.4x in HBM
        # (dev_scripts/probe_pallas_cache.py, PERFORMANCE.md).
        if (knn_mode in ("fused", "dedup") and not semantic_guidance
                and spec.cache_dtype == "bfloat16"):
            # packed lane<<25|pidx min-reduce in the select kernel
            # (fused_knn._select_k) bounds usable point ids to 2^25
            assert N < (1 << 25), \
                f"fused knn supports < 2^25 points (N={N}); use knn_mode=exact"
            center = (cc.astype(jnp.float32) + 0.5) * spec.vsize_arr \
                + spec.min_corner_arr
            Mq = B * R * SR
            Cc = grid.nbr_packed.shape[-1] // 5
            r2 = jnp.asarray(radius_limit, jnp.float32) ** 2
            delta = (sample_loc_w - center).reshape(Mq, 3)
            okf = slot_ok.reshape(Mq)
            if knn_mode == "dedup":
                # tile-dedup: one cache-row gather per DISTINCT slot per
                # tile of dedup_tile consecutive (raster-adjacent) rays;
                # the kernel redistributes rows with an exact one-hot MXU
                # matmul (ops/fused_knn.py tile_unique/_kernel_tiled)
                from .fused_knn import tile_unique, fused_knn_select_tiled
                T = dedup_tile * SR
                U = dedup_cap
                pad = (-Mq) % T
                slot_f = slot.reshape(Mq)
                if pad:
                    slot_f = jnp.pad(slot_f, (0, pad), constant_values=-1)
                    okf_p = jnp.pad(okf, (0, pad))
                    delta_p = jnp.pad(delta, ((0, pad), (0, 0)))
                else:
                    okf_p, delta_p = okf, delta
                uniq, inv = tile_unique(slot_f, okf_p, T, U)
                rows = grid.nbr_packed[
                    jnp.clip(uniq, 0, max_d - 1).reshape(-1)]
                sel = fused_knn_select_tiled(
                    rows, inv, delta_p, okf_p, r2, C=Cc, K=K, T=T, U=U)
                sample_pidx = sel[:Mq].reshape(B, R, SR, K)
            else:
                # no optimization_barrier here: the kernel is the gather's
                # ONLY consumer, and the barrier forced an 11.5 ms relayout
                # copy (xprof copy.179) between the gather and the kernel
                rows = grid.nbr_packed[slot_c]
                # fused Pallas select (ops/fused_knn.py): consumes the
                # gathered planar rows directly, skipping the XLA unpack /
                # (M,C,3) materialization / sort-based top_k. Exact same
                # selection as the path below (ties in candidate order).
                # Semantic guidance (a train-time sampler) keeps XLA.
                from .fused_knn import fused_knn_select
                sel = fused_knn_select(
                    rows.reshape(Mq, -1), delta, okf, r2, C=Cc, K=K)
                sample_pidx = sel.reshape(B, R, SR, K)
            ray_mask = jnp.any(sample_pidx.reshape(B, R, -1) >= 0, axis=-1)
            return QueryResult(
                sample_pidx=sample_pidx,
                sample_loc_w=sample_loc_w,
                sample_loc_mask=smask,
                ray_mask=ray_mask,
                sample_label=sample_label,
            )
        rows = jax.lax.optimization_barrier(grid.nbr_packed[slot_c])
        off, cand = unpack_cache(rows, spec)
        # cache rows hold OFFSETS from the voxel center (grid.py build);
        # reconstruct world coords with one FMA — free next to the gather
        center = (cc.astype(jnp.float32) + 0.5) * spec.vsize_arr \
            + spec.min_corner_arr
        cxyz = center[..., None, :] + off.astype(jnp.float32)
        cand_ok = slot_ok[..., None] & (cand >= 0)
        d2 = jnp.sum((cxyz - sample_loc_w[..., None, :]) ** 2, axis=-1)
        Kv = 1
        cand_flat_shape = (B, R, SR, cand.shape[-1])
    else:
        cand, cand_ok, d2, cand_flat_shape = bucket_candidates(
            grid, sample_loc_w, smask)

    radius2 = jnp.asarray(radius_limit, d2.dtype) ** 2
    in_radius = jnp.where(radius2 > 0, d2 <= radius2, True)
    ok = cand_ok & in_radius

    if semantic_guidance:
        assert points_label is not None and points_label_prob is not None
        # broadcast the per-sample label over the candidate axes (the cache
        # path has one candidate axis, the exact path two)
        center_label = sample_label.reshape(
            sample_label.shape + (1,) * (d2.ndim - sample_label.ndim))
        label_v = points_label[jnp.clip(cand, 0, N - 1)].astype(jnp.int32)
        C = points_label_prob.shape[-1]
        prob_v = jnp.take_along_axis(
            points_label_prob[jnp.clip(cand, 0, N - 1)],
            jnp.clip(label_v, 0, C - 1)[..., None], axis=-1)[..., 0]
        label_prob_i = (prob_v * 10.0).astype(jnp.int32)
        # reference predicate (:548-556): always accept matching/void labels;
        # mismatches accepted with P = #{s in 0..9 : s <= 1 - int(10*prob)}/10
        p_acc = jnp.clip(2 - label_prob_i, 0, 10).astype(d2.dtype) / 10.0
        # guide_u: pre-drawn uniforms of d2's shape (draw_render_noise) —
        # lets the ray-DP shard_map path draw OUTSIDE the mapped region so
        # sharded acceptance matches the unsharded draw bit-for-bit
        if guide_u is not None:
            stochastic = guide_u < p_acc
        elif key is None:
            stochastic = p_acc >= 1.0
        else:
            stochastic = jax.random.uniform(key, d2.shape) < p_acc
        sem_ok = ((center_label == label_v) | (label_v == 0)
                  | (center_label == 0) | stochastic)
        ok = ok & sem_ok

    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2m = jnp.where(ok, d2, big).reshape(cand_flat_shape)
    cand_flat = cand.reshape(cand_flat_shape)

    if knn_mode == "approx":
        # TPU-hardware approximate top-k (exact on CPU); candidate pools
        # are tight supersets of the true K-NN, so recall loss is benign
        neg_top, top_idx = jax.lax.approx_max_k(-d2m, K,
                                                recall_target=0.95)
    else:
        neg_top, top_idx = jax.lax.top_k(-d2m, K)              # (B,R,SR,K)
    top_ok = -neg_top < big
    sample_pidx = jnp.where(
        top_ok, jnp.take_along_axis(cand_flat, top_idx, axis=-1), -1)

    ray_mask = jnp.any(sample_pidx.reshape(B, R, -1) >= 0, axis=-1)
    return QueryResult(
        sample_pidx=sample_pidx.astype(jnp.int32),
        sample_loc_w=sample_loc_w,
        sample_loc_mask=smask,
        ray_mask=ray_mask,
        sample_label=sample_label,
    )
