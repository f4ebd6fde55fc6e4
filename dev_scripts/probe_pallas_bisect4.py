"""Bisect round 4: are sub-tile DMA shapes the crasher?

Rounds 1-3: (64,128) static DMA works; every (1,ROW) DMA crashes (static or
dynamic, loop or not, VMEM or HBM dst). Hypothesis: DMAs must be
tile-aligned ((8,128) f32 / (16,128) int16). If (1,8,128) dynamic-offset
row copies work, gathers become viable by padding rows to one tile.
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

rng = np.random.default_rng(0)
T = 512
table3 = jnp.asarray(rng.standard_normal((T, 8, 128)), dtype=jnp.float32)
idx = jnp.asarray(rng.integers(0, T, (64,), dtype=np.int32))


def report(name, fn, expect=None):
    try:
        out = np.asarray(fn())
        ok = True if expect is None else np.allclose(out, expect)
        print(f"[{name}] OK correct={ok}", flush=True)
        return True
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False


# y1: STATIC (1,128) f32 sub-tile DMA (expect FAIL per hypothesis)
def y1():
    t2 = table3.reshape(T * 8, 128)

    def kernel(t_ref, out_ref, scratch, sem):
        pltpu.make_async_copy(t_ref.at[pl.ds(0, 1)], scratch, sem).start()
        pltpu.make_async_copy(t_ref.at[pl.ds(0, 1)], scratch, sem).wait()
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(t2)


report("y1 static (1,128)f32 DMA", y1, np.asarray(table3).reshape(-1, 128)[:1])


# y2: STATIC (1,8,128) tile-shaped DMA
def y2():
    def kernel(t_ref, out_ref, scratch, sem):
        pltpu.make_async_copy(t_ref.at[pl.ds(3, 1)], scratch, sem).start()
        pltpu.make_async_copy(t_ref.at[pl.ds(3, 1)], scratch, sem).wait()
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table3)


report("y2 static (1,8,128) DMA", y2, np.asarray(table3)[3:4])


# y3: DYNAMIC (1,8,128) row DMA from prefetched scalar
def y3():
    def kernel(idx_ref, t_ref, out_ref, scratch, sem):
        row = idx_ref[0]
        cp = pltpu.make_async_copy(t_ref.at[pl.ds(row, 1)], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table3)


ok3 = report("y3 dyn (1,8,128) DMA", y3,
             np.asarray(table3)[np.asarray(idx)[0]][None])


# y4: dynamic (1,8,128) DMA inside fori_loop, VMEM scratch dst at dyn slot
def y4():
    B = 16

    def kernel(idx_ref, t_ref, out_ref, scratch, sem):
        def body(j, _):
            row = idx_ref[j]
            cp = pltpu.make_async_copy(
                t_ref.at[pl.ds(row, 1)], scratch.at[pl.ds(j, 1)], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, B, body, 0)
        out_ref[:] = scratch[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((16, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table3)


report("y4 loop dyn (1,8,128) -> scratch slot", y4,
       np.asarray(table3)[np.asarray(idx)[:16]])


# y5: loop of dyn (1,8,128) DMAs HBM->HBM (out in ANY)
def y5():
    S = 64

    def kernel(idx_ref, t_ref, out_ref, sem):
        def body(j, _):
            row = idx_ref[j]
            cp = pltpu.make_async_copy(
                t_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, S, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table3)


report("y5 loop dyn HBM->HBM (1,8,128)", y5,
       np.asarray(table3)[np.asarray(idx)])

print("bisect4 done", flush=True)
