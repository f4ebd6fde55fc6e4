"""Bisect round 2: which dynamic-DMA shape crashes remote Mosaic.

Round 1: static DMA OK; (1,ROW) VMEM blocks violate tiling; dynamic-offset
DMA into a pipelined VMEM out_ref crashes the compiler (HTTP 500).
Candidates here isolate src-dynamics vs dst-dynamics vs memory space.
"""
import sys
import time

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


def report(name, fn, check=True):
    try:
        out = np.asarray(fn())
        ok = (np.array_equal(out, ref_out) if check else True)
        print(f"[{name}] OK correct={ok}", flush=True)
        return ok
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False


# w0: dynamic src HBM -> dynamic dst HBM (out in ANY), serial
def w0():
    def kernel(idx_ref, table_ref, out_ref, sem):
        def body(j, _):
            row = idx_ref[j]
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)], sem)
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
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("w0 HBM->HBM dyn/dyn serial", w0)


# w0p: same but wave-pipelined
def w0p():
    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(j, slot):
            row = idx_ref[j]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)],
                sems.at[slot])

        for w in range(WAVE):
            dma(w, w).start()

        def body(j, _):
            slot = jax.lax.rem(j, WAVE)
            dma(j, slot).wait()

            @pl.when(j + WAVE < S)
            def _():
                dma(j + WAVE, slot).start()
            return 0
        jax.lax.fori_loop(0, S, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WAVE,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


ok_w0p = report("w0p HBM->HBM wave", w0p)


# w1: dyn src -> fixed full VMEM scratch; dynamic vector store to out
def w1():
    def kernel(idx_ref, table_ref, out_ref, scratch, sem):
        i = pl.program_id(0)

        def body(j, _):
            row = idx_ref[i * BLK + j]
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)], scratch, sem)
            cp.start()
            cp.wait()
            out_ref[pl.ds(j, 1), :] = scratch[:]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((1, ROW), jnp.int16),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), jnp.int16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


report("w1 dyn src->scratch, vstore out", w1)


# w2: STATIC src -> dynamic dst in pipelined VMEM out
def w2():
    def kernel(idx_ref, table_ref, out_ref, sem):
        def body(j, _):
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1)], out_ref.at[pl.ds(j, 1)], sem)
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


report("w2 static src -> dyn dst VMEM", w2, check=False)

if ok_w0p:
    # rough timing at production size (pipelined dispatch, scalar sync)
    St, Tt, Rt = 221184, 1_200_000, 320
    big_table = jnp.asarray(
        rng.integers(-9, 9, (Tt, Rt), dtype=np.int16))
    idxs = [jnp.asarray(rng.integers(0, Tt, (St,), dtype=np.int32))
            for _ in range(4)]

    def big_gather(t, i):
        def kernel(idx_ref, table_ref, out_ref, sems):
            def dma(j, slot):
                row = idx_ref[j]
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(row, 1)], out_ref.at[pl.ds(j, 1)],
                    sems.at[slot])
            W2 = 16
            for w in range(W2):
                dma(w, w).start()

            def body(j, _):
                slot = jax.lax.rem(j, W2)
                dma(j, slot).wait()

                @pl.when(j + W2 < St)
                def _():
                    dma(j + W2, slot).start()
                return 0
            jax.lax.fori_loop(0, St, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        )
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((St, Rt), jnp.int16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, t)

    f = jax.jit(lambda t, i: big_gather(t, i).astype(jnp.int32).sum())
    try:
        print("warm:", float(f(big_table, idxs[0])), flush=True)
        t0 = time.time()
        rs = [f(big_table, idxs[k % 4]) for k in range(8)]
        _ = [float(r) for r in rs]
        print(f"[big w0p 221k x 640B] {(time.time()-t0)/8*1e3:.2f} ms/iter",
              flush=True)
    except Exception as e:
        print("[big w0p] FAILED:", type(e).__name__, str(e)[:300], flush=True)
print("bisect2 done", flush=True)
