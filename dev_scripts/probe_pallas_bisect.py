"""Bisect which Pallas construct crashes the remote Mosaic compiler.

probe_pallas_gather's wave-pipelined DMA gather kernel fails with an opaque
HTTP 500 from the remote compile service while a trivial VMEM kernel works.
Each variant below adds one construct; the first failure names the culprit.
Small shapes keep remote compiles as fast as possible.
"""
import sys

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

T, ROW, S, BLK, WAVE = 1024, 128, 256, 64, 4
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(-9, 9, (T, ROW), dtype=np.int16))
idx = jnp.asarray(rng.integers(0, T, (S,), dtype=np.int32))
ref_out = np.asarray(table)[np.asarray(idx)]


def report(name, fn):
    try:
        out = np.asarray(fn())
        ok = np.array_equal(out, ref_out[:out.shape[0]])
        print(f"[{name}] OK correct={ok}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


# 1. static-index DMA: HBM -> VMEM scratch -> out
def v1():
    def kernel(table_ref, out_ref, scratch, sem):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, BLK)], scratch, sem).start()
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, BLK)], scratch, sem).wait()
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BLK, ROW), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table)


report("v1 static DMA", lambda: np.asarray(v1())[:0])  # no ref match


# 2. scalar-prefetched dynamic row, one per grid step, via scratch
def v2():
    def kernel(idx_ref, table_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        row = idx_ref[i]
        cp = pltpu.make_async_copy(table_ref.at[pl.ds(row, 1)], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((1, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("v2 dyn row via scratch", v2)


# 3. DMA directly into the pipelined out_ref at a dynamic offset
def v3():
    def kernel(idx_ref, table_ref, out_ref, sem):
        i = pl.program_id(0)

        def body(j, _):
            row = idx_ref[i * BLK + j]
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)], sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("v3 DMA into out_ref, serial", v3)


# 4. semaphore array indexed by a traced value
def v4():
    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        def body(j, _):
            row = idx_ref[i * BLK + j]
            slot = jax.lax.rem(j, WAVE)
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)],
                sems.at[slot])
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WAVE,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("v4 traced sem slot", v4)


# 5. full wave pipeline (start-ahead + wait-behind)
def v5():
    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        def dma(j, slot):
            row = idx_ref[i * BLK + j]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)],
                sems.at[slot])

        for w in range(WAVE):
            dma(w, w).start()

        def body(j, _):
            slot = jax.lax.rem(j, WAVE)
            dma(j, slot).wait()

            @pl.when(j + WAVE < BLK)
            def _():
                dma(j + WAVE, slot).start()
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WAVE,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("v5 wave pipeline", v5)
print("bisect done", flush=True)
