"""Positional encoding.

Matches the layout of the reference implementation
(/root/reference/models/helpers/networks.py:175-192) exactly, because trained
checkpoints depend on the feature ordering:

  * the frequency axis is innermost per input channel:
    [x0*f0, x0*f1, ..., x0*fF, x1*f0, ...]
  * sin/cos are interleaved per element: [sin(a0), cos(a0), sin(a1), cos(a1), ...]
  * with ori=True, the raw input channels are prepended.
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(positions: jnp.ndarray, freqs: int, ori: bool = False) -> jnp.ndarray:
    """positions: (..., D) -> (..., 2*D*freqs) or (..., D + 2*D*freqs) if ori."""
    freq_bands = (2.0 ** jnp.arange(freqs)).astype(positions.dtype)  # (F,)
    d = positions.shape[-1]
    pts = (positions[..., None] * freq_bands).reshape(positions.shape[:-1] + (freqs * d,))
    if ori:
        return jnp.concatenate(
            [positions, jnp.sin(pts), jnp.cos(pts)], axis=-1
        )
    # interleave sin/cos per element: stack on a new trailing axis then flatten
    out = jnp.stack([jnp.sin(pts), jnp.cos(pts)], axis=-1)
    return out.reshape(positions.shape[:-1] + (2 * freqs * d,))
