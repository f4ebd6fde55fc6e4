"""Probe: XLA row-gather vs Pallas per-row-DMA gather on the real TPU.

The KNN cache gather (221k rows/chunk, 640B rows) and the fused attribute
gather (1.8M rows/chunk, ~100B rows) dominate render time (PERFORMANCE.md:
the stages are gather-ROW-bound, ~280 ns/row under XLA, while the raw HBM
bandwidth cost would be <1 ms). This measures whether a Pallas kernel that
issues raw per-row async DMAs (indices scalar-prefetched to SMEM) beats
XLA's gather. Timing per CLAUDE.md: varied inputs, scalar reduction inside
jit, pipelined dispatch, float() sync at the end.

Usage: python dev_scripts/probe_pallas_gather.py [cache|attr|both]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def pallas_gather(table, idx, BLK=256, WAVE=16):
    """out[s] = table[idx[s]] via per-row DMA, WAVE copies in flight."""
    S = idx.shape[0]
    T, ROW = table.shape
    assert S % BLK == 0

    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        def dma(j, slot):
            row = idx_ref[i * BLK + j]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1)],
                out_ref.at[pl.ds(j, 1)],
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLK, ROW), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WAVE,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROW), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def bench(fn, table, idxs, iters=8, tag=""):
    # warm (compile) + correctness-free timing: pipelined dispatch
    r = fn(table, idxs[0])
    print(f"  [{tag}] warm value {float(r):.3e}")
    t0 = time.time()
    rs = [fn(table, idxs[k % len(idxs)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:.2f} ms/iter (pipelined, {iters} iters)")
    return dt


def run_case(name, S, T, ROW, blks=(256,), waves=(16,)):
    print(f"== {name}: S={S} rows from ({T},{ROW}) int16 table "
          f"({S*ROW*2/1e6:.0f} MB gathered) ==")
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(-100, 100, size=(T, ROW), dtype=np.int16))
    idxs = [jnp.asarray(rng.integers(0, T, size=(S,), dtype=np.int32))
            for _ in range(4)]

    xla = jax.jit(lambda t, i: t[i].astype(jnp.int32).sum())
    bench(xla, table, idxs, tag="xla gather")

    for BLK in blks:
        for WAVE in waves:
            tag = f"pallas BLK={BLK} WAVE={WAVE}"
            try:
                pg = jax.jit(lambda t, i, B=BLK, W=WAVE: pallas_gather(
                    t, i, BLK=B, WAVE=W).astype(jnp.int32).sum())
                bench(pg, table, idxs, tag=tag)
            except Exception as e:
                print(f"  [{tag}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:500]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("cache", "both"):
        # KNN cache row: 64 pidx int32 + 64*3 bf16 offsets = 320 int16 = 640B
        run_case("cache-gather", S=221184, T=1_200_000, ROW=320,
                 blks=(256, 1024), waves=(8, 16))
    if which in ("attr", "both"):
        # fused attribute row: ~42ch bf16, padded to 64 = 128B
        run_case("attr-gather", S=1_769_472, T=1_048_576, ROW=64,
                 blks=(1024,), waves=(16, 32))
