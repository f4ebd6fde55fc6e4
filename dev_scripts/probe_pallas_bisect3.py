"""Bisect round 3: is dynamic-index DMA broken at all, or only in loops?

Round 2: every DMA with a traced `.at[pl.ds(x,1)]` offset inside a
fori_loop crashes the remote Mosaic compiler; fully-static DMA works.
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

T, ROW = 1024, 128
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(-9, 9, (T, ROW), dtype=np.int16))
idx = jnp.asarray(rng.integers(0, T, (64,), dtype=np.int32))


def report(name, fn, expect=None):
    try:
        out = np.asarray(fn())
        ok = True if expect is None else np.array_equal(out, expect)
        print(f"[{name}] OK correct={ok}", flush=True)
        return True
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False


# x1: ONE DMA, dynamic src row from prefetched scalar, full-scratch dst
def x1():
    def kernel(idx_ref, table_ref, out_ref, scratch, sem):
        row = idx_ref[0]
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1)], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((1, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("x1 one dyn-src DMA, no loop", x1,
       np.asarray(table)[np.asarray(idx)[:1]])


# x2: fori_loop of fully-STATIC DMAs
def x2():
    def kernel(table_ref, out_ref, scratch, sem):
        def body(j, _):
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1)], scratch, sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, ROW), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table)


report("x2 fori_loop static DMA", x2, np.asarray(table)[:1])


# x3: python-UNROLLED dynamic-src DMAs into a full VMEM scratch block
def x3():
    B = 8

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        for j in range(B):          # static unroll
            row = idx_ref[j]        # traced value
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)],
                scratch.at[pl.ds(j, 1)],   # static dst offset
                sems.at[j]).start()
        for j in range(B):
            row = idx_ref[j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)],
                scratch.at[pl.ds(j, 1)],
                sems.at[j]).wait()
        out_ref[:] = scratch[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA((B,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("x3 unrolled dyn-src DMAs", x3,
       np.asarray(table)[np.asarray(idx)[:8]])


# x4: like x1 but WITHOUT scalar prefetch (idx as SMEM input)
def x4():
    def kernel(idx_ref, table_ref, out_ref, scratch, sem):
        row = idx_ref[0]
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1)], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, ROW), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("x4 dyn-src DMA, SMEM idx (no prefetch)", x4,
       np.asarray(table)[np.asarray(idx)[:1]])

print("bisect3 done", flush=True)
