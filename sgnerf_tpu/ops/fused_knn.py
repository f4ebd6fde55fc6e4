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

    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    outs = []
    for _ in range(K):
        m = jnp.min(d2, axis=-1, keepdims=True)            # (TS,1)
        ismin = (d2 == m) & (m < BIG)
        # first tie in candidate order (matches XLA top_k's tie-break):
        # no cumsum on Mosaic — min-reduce the lane index instead
        idxmin = jnp.min(jnp.where(ismin, lane, C), axis=-1, keepdims=True)
        first = ismin & (lane == idxmin)
        got = jnp.any(first, axis=-1, keepdims=True)       # (TS,1)
        sel = jnp.sum(jnp.where(first, pidx, 0), axis=-1, keepdims=True)
        outs.append(jnp.where(got, sel, -1))
        d2 = jnp.where(first, BIG, d2)
    out_ref[...] = jnp.concatenate(outs, axis=-1)          # (TS, K)


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
    TS = 512
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
