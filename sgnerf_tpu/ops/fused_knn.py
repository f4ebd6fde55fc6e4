"""Fused Pallas KNN select over gathered merged-neighborhood cache rows.

The XLA cache path (ops/query.py) gathers one packed (C*W,) int16 row per
shading point — an irreducible ~130 ns/row cost (PERFORMANCE.md width
sweep) — and then spends another ~20 ms of XLA work per chunk on:
int16 -> bf16/int32 bitcasts and relayouts, materializing the (M,C,3)
candidate offsets, the distance compute, a sort-based `top_k` over C=64
lanes, and the take_along_axis id gather. This kernel consumes the
gathered rows directly from VMEM tiles and emits only the (M,K) selected
point ids:

    planar lane slices (x|y|z|pidx_lo|pidx_hi, pack_cache's layout)
      -> bf16->f32 offsets, d^2 against the shading point
      -> validity mask (cand >= 0, slot_ok, radius)
      -> K-round first-match argmin (exact, XLA-top_k tie order)
      -> int32 ids from the lo/hi halves

Semantics match ops/query.py's exact path: smallest-d^2 first, ties by
candidate index (XLA's top_k tie order), invalid slots -> -1. Selection
on this path is not differentiated (ids are integers), so no VJP needed.
Used when RenderConfig.knn_mode == "fused" (bf16 cache only; semantic
guidance falls back to the XLA path — it is a train-time sampler).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _select_k(d2, pidx, K: int, C: int, BIG):
    """K-round first-match argmin over the lane axis: exact XLA-top_k
    semantics (smallest d2, ties by candidate order), two cross-lane
    reductions per round.

    Lane-reductions are the kernel's hot loop; the tie-break lane AND its
    point id come out of ONE packed min-reduce — `lane << 25 | pidx` is
    order-correct because lanes are distinct within the tie set (lane <=
    63 so 63 << 25 stays under 2^31) — and `got` falls out of the d2
    minimum (m < BIG) with no reduction at all (2 lane-reductions per
    round vs 4 in the naive formulation; point capacity bound 2^25 =
    33.5M ids, asserted by the caller)."""
    assert C <= 64, C
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    IMAX = jnp.int32(2 ** 31 - 1)
    outs = []
    for _ in range(K):
        m = jnp.min(d2, axis=-1, keepdims=True)            # (TS,1)
        got = m < BIG
        ismin = (d2 == m) & got
        w = jnp.min(jnp.where(ismin, (lane << 25) | pidx, IMAX),
                    axis=-1, keepdims=True)                # (TS,1)
        outs.append(jnp.where(got, w & ((1 << 25) - 1), -1))
        first = ismin & (lane == (w >> 25))
        d2 = jnp.where(first, BIG, d2)
    return jnp.concatenate(outs, axis=-1)                  # (TS, K)


def _kernel(rows_ref, delta_ref, ok_ref, r2_ref, out_ref, *, C: int, K: int):
    rows = rows_ref[...]                       # (TS, 5*C) int16 planar
    x = pltpu.bitcast(rows[:, 0 * C:1 * C], jnp.bfloat16).astype(jnp.float32)
    y = pltpu.bitcast(rows[:, 1 * C:2 * C], jnp.bfloat16).astype(jnp.float32)
    z = pltpu.bitcast(rows[:, 2 * C:3 * C], jnp.bfloat16).astype(jnp.float32)
    lo = rows[:, 3 * C:4 * C].astype(jnp.int32) & 0xffff
    hi = rows[:, 4 * C:5 * C].astype(jnp.int32)
    pidx = (hi << 16) | lo                     # (TS, C) int32

    delta = delta_ref[...]                     # (TS, 3) f32: loc - voxcenter
    dx = x - delta[:, 0:1]
    dy = y - delta[:, 1:2]
    dz = z - delta[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz           # (TS, C)

    r2 = r2_ref[0, 0]
    ok = (pidx >= 0) & (ok_ref[...] > 0)       # ok_ref (TS,1) broadcasts
    # no select over i1 vectors (Mosaic can't legalize it) — pure bool alg:
    ok = ok & ((d2 <= r2) | (r2 <= 0.0))
    BIG = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    d2 = jnp.where(ok, d2, BIG)

    out_ref[...] = _select_k(d2, pidx, K, C, BIG)


def tile_unique(slot: jnp.ndarray, ok: jnp.ndarray, T: int, U: int):
    """Per-tile unique compaction of the cache-gather slots.

    slot (M,) int32 (M divisible by T), ok (M,) bool. Tiles are T consecutive
    rows (= tile_rays * SR shading points of consecutive raster rays).
    Returns (uniq (M//T, U) int32 unique slots per tile, -1 padded — the U
    SMALLEST distinct valid slots, deterministic; inv (M,) int32 index of each
    row's slot in its tile's uniq list, or U when invalid / overflowed).

    Rationale (probe_tile_unique.py): along a ray every shading point lands in
    a DISTINCT dilated voxel (the 0.02 m sample step exceeds the 0.016 m
    voxel), but rays of adjacent raster pixels traverse the same voxels —
    9-23x row dedup for 16-128-ray tiles on the bench scene. Two sorts +
    a cumsum + a segment_max; no scatters (the TPU compiler RET_CHECKs on
    multi-million-element scatter programs, CLAUDE.md).
    """
    M = slot.shape[0]
    assert M % T == 0, (M, T)
    nt = M // T
    BIGS = jnp.int32(2 ** 30)
    s = jnp.where(ok, slot, BIGS).reshape(nt, T)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (nt, T))
    sv, sp = jax.lax.sort_key_val(s, pos, dimension=-1)
    first = jnp.concatenate(
        [jnp.ones((nt, 1), bool), sv[:, 1:] != sv[:, :-1]], axis=1)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1
    ranku = jnp.where((sv < BIGS) & (rank < U), rank, U)
    seg = (jnp.arange(nt, dtype=jnp.int32)[:, None] * (U + 1) + ranku)
    vals = jnp.where(ranku < U, sv, -1)
    uniq = jax.ops.segment_max(
        vals.reshape(-1), seg.reshape(-1), num_segments=nt * (U + 1),
        indices_are_sorted=True).reshape(nt, U + 1)[:, :U]
    uniq = jnp.maximum(uniq, -1)  # empty segments -> int32 min
    # rank back in original row order: sort (position, rank) by position
    _, inv = jax.lax.sort_key_val(sp, ranku, dimension=-1)
    return uniq, inv.reshape(-1)


def _kernel_tiled(rows_ref, inv_ref, delta_ref, ok_ref, r2_ref, out_ref, *,
                  C: int, K: int, U: int):
    """One tile: distribute the tile's U gathered rows to its T shading
    points with an exact one-hot MXU matmul, then the same select as
    `_kernel`.

    Exactness of the matmul distribute: the xyz planes are bf16 values
    (1.0 * v products are exact in the MXU's f32 accumulation; each output
    sums exactly one nonzero term), and point ids travel as three 8-bit
    limbs of (id+1) — each limb <= 255 is bf16-exact, and the f32 limb
    recombination is exact below 2^24. A missing row (inv == U, i.e.
    invalid or tile-overflow) distributes all-zero -> id (0)-1 = -1 ->
    the candidate is rejected exactly like a padded cache entry."""
    rows = rows_ref[...]                       # (U, 5C) int16 planar
    x = pltpu.bitcast(rows[:, 0 * C:1 * C], jnp.bfloat16)
    y = pltpu.bitcast(rows[:, 1 * C:2 * C], jnp.bfloat16)
    z = pltpu.bitcast(rows[:, 2 * C:3 * C], jnp.bfloat16)
    lo = rows[:, 3 * C:4 * C].astype(jnp.int32) & 0xffff
    hi = rows[:, 4 * C:5 * C].astype(jnp.int32)
    idp = ((hi << 16) | lo) + 1                # (U, C); -1 -> 0
    l0 = (idp & 255).astype(jnp.bfloat16)
    l1 = ((idp >> 8) & 255).astype(jnp.bfloat16)
    l2 = (idp >> 16).astype(jnp.bfloat16)
    P = jnp.concatenate([x, y, z, l0, l1, l2], axis=-1)   # (U, 6C) bf16

    inv = inv_ref[...]                         # (T, 1) int32
    T = inv.shape[0]
    oh = (inv == jax.lax.broadcasted_iota(jnp.int32, (T, U), 1)
          ).astype(jnp.bfloat16)               # (T, U); inv==U -> zero row
    Q = jnp.dot(oh, P, preferred_element_type=jnp.float32)  # (T, 6C)

    xq = Q[:, 0 * C:1 * C]
    yq = Q[:, 1 * C:2 * C]
    zq = Q[:, 2 * C:3 * C]
    idpq = (Q[:, 3 * C:4 * C] + Q[:, 4 * C:5 * C] * 256.0
            + Q[:, 5 * C:6 * C] * 65536.0)
    pidx = idpq.astype(jnp.int32) - 1          # (T, C) int32

    delta = delta_ref[...]                     # (T, 3) f32
    dx = xq - delta[:, 0:1]
    dy = yq - delta[:, 1:2]
    dz = zq - delta[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz

    r2 = r2_ref[0, 0]
    ok = (pidx >= 0) & (ok_ref[...] > 0)
    ok = ok & ((d2 <= r2) | (r2 <= 0.0))
    BIG = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    d2 = jnp.where(ok, d2, BIG)

    out_ref[...] = _select_k(d2, pidx, K, C, BIG)


@functools.partial(jax.jit, static_argnames=("C", "K", "T", "U"))
def fused_knn_select_tiled(rows: jnp.ndarray,   # (nt*U, 5*C) int16 rows
                           inv: jnp.ndarray,    # (nt*T,) int32 in [0, U]
                           delta: jnp.ndarray,  # (nt*T, 3) f32
                           ok: jnp.ndarray,     # (nt*T,) bool/int
                           radius2,             # scalar f32 (0 disables)
                           *, C: int, K: int, T: int, U: int) -> jnp.ndarray:
    """Tile-dedup variant: one gathered cache row per DISTINCT slot per tile
    (see `tile_unique`), redistributed in-kernel. Returns (nt*T, K) int32
    selected point ids (-1 invalid). Exact vs the per-row path whenever no
    tile overflows U; overflowed shading points fall back to no neighbors."""
    delta = jax.lax.stop_gradient(delta)
    M = inv.shape[0]
    nt = M // T
    assert rows.shape[0] == nt * U, (rows.shape, nt, U)
    ok2 = ok.astype(jnp.int32).reshape(M, 1)
    r2 = jnp.asarray(radius2, jnp.float32).reshape(1, 1)

    # sub-block the shading points: a whole 1536-row tile through the
    # K-round select overflows the 16 MB scoped-VMEM limit, so each kernel
    # invocation handles TS rows of the tile against the tile's full row set
    ns = -(-T // 512)
    while T % ns:
        ns += 1
    TS = T // ns

    out = pl.pallas_call(
        functools.partial(_kernel_tiled, C=C, K=K, U=U),
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((U, rows.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 1), lambda i, j: (i * ns + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 3), lambda i, j: (i * ns + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 1), lambda i, j: (i * ns + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TS, K), lambda i, j: (i * ns + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int32),
        interpret=_interpret(),
    )(rows, inv.reshape(M, 1).astype(jnp.int32), delta, ok2, r2)
    return out


@functools.partial(jax.jit, static_argnames=("C", "K"))
def fused_knn_select(rows: jnp.ndarray,       # (M, 5*C) int16 planar rows
                     delta: jnp.ndarray,      # (M, 3) f32 loc - voxel center
                     ok: jnp.ndarray,         # (M,) bool/int slot validity
                     radius2,                 # scalar f32 (0 disables)
                     *, C: int, K: int) -> jnp.ndarray:
    """Returns (M, K) int32 selected point ids (-1 invalid)."""
    # selection is discrete (int ids; the XLA path's top_k carries no
    # gradient either) — stop_gradient keeps JVP tracing out of the kernel
    # when the query runs inside a differentiated train step
    delta = jax.lax.stop_gradient(delta)
    M = rows.shape[0]
    # block-size sweep: TS=2048 measured a wash vs 512 (82.6k vs 82.8k
    # rays/s) — unlike the agg kernel this one is not invocation-bound
    TS = 512
    assert rows.shape[1] // 5 <= 64 and C <= 64, \
        "packed-lane select supports C<=64 (see _select_k)"
    pad = (-M) % TS
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, ((0, pad),))
    Mp = M + pad
    ok2 = ok.astype(jnp.int32).reshape(Mp, 1)
    r2 = jnp.asarray(radius2, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, K=K),
        grid=(Mp // TS,),
        in_specs=[
            pl.BlockSpec((TS, rows.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TS, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K), jnp.int32),
        interpret=_interpret(),
    )(rows, delta, ok2, r2)
    return out[:M]
