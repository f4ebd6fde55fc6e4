"""Stochastic rounding for low-precision attribute storage.

The bf16 attribute gather (RenderConfig.gather_dtype="bfloat16") halves the
dominant HBM gather traffic (+41% render) but TRAINING through the
nearest-rounded cast measured 0.54 dB worse on the toy convergence scene
(PERFORMANCE.md): round-to-nearest makes the optimizer fit a *biased*
quantization of the point attributes. Stochastic rounding (round up with
probability = fractional distance) makes the quantized table an UNBIASED
estimator of the f32 master attributes — E[sr_bf16(x)] == x — so the
gradient noise it adds is zero-mean instead of systematic.

Autodiff without custom_vjp: the rounded value is computed with integer bit
ops on a `stop_gradient` branch and re-injected as

    y = (x + stop_gradient(sr(x) - x)).astype(bfloat16)

which is numerically EXACTLY sr(x) (the final cast hits a value already on
the bf16 grid, so it rounds nothing), while the gradient path is the same
identity-through-cast as a plain `.astype(bfloat16)`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _sr_bits(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """f32 -> f32 values on the bf16 grid, stochastically rounded.

    Classic bit trick: add 16 uniform random low bits, truncate to the top
    16 (the bf16 pattern). P(round up) == fraction of the ulp interval —
    exact stochastic rounding, including the mantissa->exponent carry at
    binade boundaries. Integer ops only; caller guards the gradient path.
    """
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    b = (b + r) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Cast f32 -> bf16 with stochastic rounding; E[result] == x.

    Differentiable exactly like `.astype(jnp.bfloat16)` (identity-through-
    cast); the random draw itself carries no gradient. NaN/Inf inputs are
    not supported (finite attributes only)."""
    assert x.dtype == jnp.float32, x.dtype
    xs = jax.lax.stop_gradient(x)
    return (x + jax.lax.stop_gradient(_sr_bits(xs, key) - xs)).astype(
        jnp.bfloat16)


def quantize_table_int8(x: jnp.ndarray, mask: jnp.ndarray):
    """Per-channel affine int8 quantization of an attribute table.

    x: (N, C) f32; mask: (N,) bool — channel ranges come from masked rows
    only (capacity padding carries 1e9 sentinels that would destroy the
    scales). Returns (q (N,C) int8, scale (C,) f32, zero (C,) f32) with
    dequant(q) = q * scale + zero. No gradient (pure stop-gradient helper;
    the caller's custom_vjp routes cotangents to the f32 master).

    Motivation (PERFORMANCE.md probe_attr2): the per-row gather rate tracks
    TABLE BYTES — int8x42 (176 MB at 4.2M points) gathers at 54.0 ms vs
    bf16x42 (353 MB) at 89.9 ms for the same 1.77M rows. Training batches
    are random rays, so the raster-only tile-dedup gather cannot apply;
    byte width is the remaining lever on the training forward gather."""
    xs = jax.lax.stop_gradient(x)
    m = mask[:, None]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    lo = jnp.min(jnp.where(m, xs, big), axis=0)
    hi = jnp.max(jnp.where(m, xs, -big), axis=0)
    ok = hi >= lo                       # all-masked channel -> degenerate
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    scale = jnp.maximum(hi - lo, 1e-12) / 254.0
    zero = (hi + lo) * 0.5
    q = jnp.clip(jnp.round((xs - zero) / scale), -127, 127).astype(jnp.int8)
    return q, scale, zero
