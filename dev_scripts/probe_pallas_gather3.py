"""Timing: tile-layout Pallas DMA gather vs XLA row gather.

Mosaic constraint (probe_pallas_gather2): HBM slices must be 8-sublane
aligned -> tables stored (T, 8, 128) int32; one DMA fetches a full 4KB tile
(dim 0 is untiled, so .at[pl.ds(row,1)] is legal — proven in bisect4 y5).
The production cache packs 8 voxel sub-rows per tile (quantized candidates,
2 int32 each), so the DMA fetches 8x the needed bytes — irrelevant if the
cost is per-DMA issue/latency, which this measures.

Cases (R=9216 chunk):
  cache: S=221184 DMAs from (305000,8,128) tiles; XLA comparator gathers
         (2.44M,128) rows (the same 512B sub-rows XLA would fetch).
  attr:  S=1769472 DMAs from (131072,8,128); XLA comparator (1.05M,42)bf16
         and (1.05M,64)int16 rows, idx shaped (221184,8) as in production.
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


def pallas_gather_tiled(table, idx, wave=16, unroll=4):
    """table (T,8,128), idx (S,) -> out (S,8,128)."""
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
        out_shape=jax.ShapeDtypeStruct((S,) + table.shape[1:], table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def bench(fn, args_list, iters=8, tag=""):
    try:
        _ = float(fn(*args_list[0]))
    except Exception as e:
        print(f"  [{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    print("== cache: 221184 tile-DMAs from (305000,8,128) int32 ==",
          flush=True)
    S, T = 221184, 305_000
    table = jnp.asarray(rng.integers(-99, 99, (T, 8, 128), dtype=np.int32))
    idxs = [jnp.asarray(rng.integers(0, T, (S,), dtype=np.int32))
            for _ in range(4)]
    # correctness
    out = pallas_gather_tiled(table, idxs[0][:512], wave=16)
    ok = bool(jnp.all(out == table[idxs[0][:512]]))
    print(f"  correctness(512): {ok}", flush=True)

    flat = table.reshape(T * 8, 128)
    sidxs = [jnp.asarray(rng.integers(0, T * 8, (S,), dtype=np.int32))
             for _ in range(4)]
    bench(jax.jit(lambda t, i: t[i].sum()), [(flat, i) for i in sidxs],
          tag="xla (2.44M,128)i32 rows")
    for w in (16, 64, 128):
        f = jax.jit(lambda t, i, w=w: pallas_gather_tiled(
            t, i, wave=w).sum())
        bench(f, [(table, i) for i in idxs], tag=f"pallas tile w{w}")

    print("== attr: 1.77M tile-DMAs from (131072,8,128) int32 ==", flush=True)
    S2, T2 = 1_769_472, 131_072
    table2 = jnp.asarray(rng.integers(-99, 99, (T2, 8, 128), dtype=np.int32))
    idx2 = [jnp.asarray(rng.integers(0, T2, (S2,), dtype=np.int32))
            for _ in range(2)]
    f = jax.jit(lambda t, i: pallas_gather_tiled(t, i, wave=128).sum())
    bench(f, [(table2, i) for i in idx2], iters=4, tag="pallas tile w128")

    t42 = jnp.asarray(rng.standard_normal((1_048_576, 42)),
                      dtype=jnp.bfloat16)
    aidx = [jnp.asarray(rng.integers(0, 1_048_576, (221184, 8),
                                     dtype=np.int32)) for _ in range(4)]
    bench(jax.jit(lambda t, i: t[i].astype(jnp.float32).sum()),
          [(t42, i) for i in aidx], tag="xla (1M,42)bf16, idx (221k,8)")


if __name__ == "__main__":
    main()
