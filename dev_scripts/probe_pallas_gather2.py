"""Production-scale timing: Pallas DMA row-gather (int32 rows) vs XLA.

bisect4: dynamic HBM->HBM per-row DMAs compile and run when refs are 32-bit
typed (int16 refs crash this Mosaic build). Cache rows bitcast to int32.

Cases:
  cache: 221184 rows x 192 int32 (768B)  [KNN cache at R=9216]
  attr:  1769472 rows x 24 int32 (96B)   [attribute gather, K=8]
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


def pallas_gather(table, idx, wave=16, unroll=4):
    S = idx.shape[0]
    assert S % unroll == 0 and wave % unroll == 0

    def kernel(idx_ref, t_ref, out_ref, sems):
        def dma(j, slot):
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(idx_ref[j], 1)],
                out_ref.at[pl.ds(j, 1)],
                sems.at[slot])

        for w in range(wave):
            dma(w, w).start()

        def body(i, _):
            j0 = i * unroll
            for u in range(unroll):
                j = j0 + u
                slot = jax.lax.rem(j, wave)
                dma(j, slot).wait()

                @pl.when(j + wave < S)
                def _():
                    dma(j + wave, slot).start()
            return 0

        jax.lax.fori_loop(0, S // unroll, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((wave,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, table.shape[1]), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def bench(fn, args_list, iters=8, tag=""):
    try:
        _ = float(fn(*args_list[0]))
    except Exception as e:
        print(f"  [{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:.2f} ms/iter", flush=True)
    return dt


def run(name, S, T, ROW, waves=(16, 64), unrolls=(4,)):
    print(f"== {name}: S={S} x ({T},{ROW}) int32 ({S*ROW*4/1e6:.0f} MB) ==",
          flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(-99, 99, (T, ROW), dtype=np.int32))
    idxs = [jnp.asarray(rng.integers(0, T, (S,), dtype=np.int32))
            for _ in range(4)]
    # correctness once (small slice compare via sum of abs diff)
    small = pallas_gather(table, idxs[0][:1024], wave=16, unroll=4)
    ref = table[idxs[0][:1024]]
    ok = bool(jnp.all(small == ref))
    print(f"  correctness(1024 rows): {ok}", flush=True)

    bench(jax.jit(lambda t, i: t[i].sum()), [(table, i) for i in idxs],
          tag="xla")
    for w in waves:
        for u in unrolls:
            f = jax.jit(lambda t, i, w=w, u=u: pallas_gather(
                t, i, wave=w, unroll=u).sum())
            bench(f, [(table, i) for i in idxs], tag=f"pallas w{w} u{u}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("cache", "both"):
        run("cache", S=221184, T=1_200_000, ROW=192)
    if which in ("attr", "both"):
        run("attr", S=1_769_472, T=1_048_576, ROW=24, waves=(64,),
            unrolls=(4,))
