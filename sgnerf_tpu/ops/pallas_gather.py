"""Row gather as a Pallas TPU kernel: out[s] = table[idx[s]].

Why: the render path is gather-ROW-bound. XLA's gather costs ~130 ns per
indexed row regardless of row size (PERFORMANCE.md; probe_xla_gather.py),
~100x below HBM bandwidth at our 640B cache rows. This kernel issues raw
per-row async DMAs (HBM table row -> HBM output row) with many copies in
flight, paying only DMA issue+latency, which pipelines.

Replaces the reference's CUDA `index_select` gathers
(/root/reference/models/neural_points/neural_points.py:959-973) and the
neighbor-candidate fetch inside `query_neigh_along_ray_layered`
(query_point_indices_worldcoords.py:594-681) at the memory-system level.

Constraints discovered on this toolchain (probe_pallas_bisect*.py):
  * dynamic-offset DMA into a *pipelined VMEM* out_ref crashes the remote
    Mosaic compiler -> both table and output live in ANY/HBM;
  * (1, ROW) VMEM blocks violate the (8,128) tiling rule -> no per-row
    VMEM blocking; the kernel runs as grid=(1,) with an in-kernel loop.

The backward pass (for training) is the same sorted segment-sum used by
renderer.gather_rows: cotangents sorted by index then segment-summed.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(S: int, wave: int):
    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(j, slot):
            row = idx_ref[j]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)],
                sems.at[slot])

        for w in range(wave):
            dma(w, w).start()

        def body(j, _):
            slot = jax.lax.rem(j, wave)
            dma(j, slot).wait()

            @pl.when(j + wave < S)
            def _():
                dma(j + wave, slot).start()
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("wave", "interpret"))
def _gather_rows_pallas_impl(table: jnp.ndarray, idx: jnp.ndarray,
                             wave: int = 16,
                             interpret: bool = False) -> jnp.ndarray:
    S = idx.shape[0]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((wave,))],
    )
    return pl.pallas_call(
        _gather_kernel(S, wave), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, table.shape[1]), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_pallas(table: jnp.ndarray, idx: jnp.ndarray,
                       wave: int = 16,
                       interpret: bool = False) -> jnp.ndarray:
    """table (T, ROW), idx (...,) int32 in [0, T) -> (..., ROW).

    idx must be pre-clipped (no bounds handling in the DMA path).
    interpret=True runs the Pallas interpreter (CPU tests)."""
    flat = idx.reshape(-1).astype(jnp.int32)
    out = _gather_rows_pallas_impl(table, flat, wave=wave,
                                   interpret=interpret)
    return out.reshape(*idx.shape, table.shape[1])


def _fwd(table, idx, wave, interpret):
    return (gather_rows_pallas(table, idx, wave, interpret),
            (idx, table.shape[0]))


def _bwd(wave, interpret, res, g):
    idx, n = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    order = jnp.argsort(flat_idx)
    dt = jax.ops.segment_sum(flat_g[order], flat_idx[order], num_segments=n,
                             indices_are_sorted=True)
    return dt.astype(g.dtype), None


gather_rows_pallas.defvjp(_fwd, _bwd)


def pallas_gather_available() -> bool:
    """True when the TPU Pallas DMA-gather path can run (TPU-family backend,
    not the CPU test mesh)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
