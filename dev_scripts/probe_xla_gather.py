"""XLA gather micro-experiments on the real TPU (no Pallas).

Findings feed ops/query.py. Baseline from probe_pallas_gather: 221k rows of
640B gather = 28.4 ms => ~128 ns/row fixed cost, ~100x below HBM bandwidth.
Questions:
  1. Does sorting indices (indices_are_sorted / locality) change the cost?
  2. Does row alignment (multiple of 128 lanes) matter?
  3. Does dtype (int16 vs int32 rows) matter at fixed bytes?
  4. What does the 1.8M-row attribute gather cost in isolation?
  5. Do TWO half-row gathers cost ~2x ONE packed gather (row-count scaling)?

Usage: python dev_scripts/probe_xla_gather.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

S, T = 221184, 1_200_000


def bench(fn, args_list, iters=8, tag=""):
    r = fn(*args_list[0])
    _ = float(r)
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:.2f} ms/iter")
    return dt


def main():
    rng = np.random.default_rng(0)
    idxs = [jnp.asarray(rng.integers(0, T, size=(S,), dtype=np.int32))
            for _ in range(4)]

    def table(row, dt):
        return jnp.asarray(rng.integers(-100, 100, size=(T, row),
                                        dtype=np.int16)).astype(dt) \
            if dt != np.int16 else jnp.asarray(
                rng.integers(-100, 100, size=(T, row), dtype=np.int16))

    print("== row-count scaling: one 320-el gather vs two 160-el gathers ==")
    t320 = table(320, np.int16)
    t160a, t160b = t320[:, :160], t320[:, 160:]
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(t320, i) for i in idxs], tag="1x (T,320)i16 640B rows")
    bench(jax.jit(lambda a, b, i: a[i].astype(jnp.int32).sum()
                  + b[i].astype(jnp.int32).sum()),
          [(t160a, t160b, i) for i in idxs], tag="2x (T,160)i16 320B rows")

    print("== alignment: 320 (2.5 lanes) vs 384 (3 lanes) int16 ==")
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(table(384, np.int16), i) for i in idxs], tag="(T,384)i16 768B")
    print("== dtype: same bytes as int32 rows ==")
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(table(160, np.int32), i) for i in idxs], tag="(T,160)i32 640B")
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(table(256, np.int32), i) for i in idxs], tag="(T,256)i32 1KB")

    print("== sorted indices ==")
    sidxs = [jnp.sort(i) for i in idxs]
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(t320, i) for i in sidxs], tag="pre-sorted idx (no sort cost)")
    bench(jax.jit(lambda t, i: t[jnp.sort(i)].astype(jnp.int32).sum()),
          [(t320, i) for i in idxs], tag="sort+gather (sort cost incl)")

    print("== attribute gather: 1.8M rows x 128B ==")
    S2, T2 = 1_769_472, 1_048_576
    idx2 = [jnp.asarray(rng.integers(0, T2, size=(S2,), dtype=np.int32))
            for _ in range(4)]
    t64 = jnp.asarray(rng.integers(-100, 100, size=(T2, 64), dtype=np.int16))
    bench(jax.jit(lambda t, i: t[i].astype(jnp.int32).sum()),
          [(t64, i) for i in idx2], tag="(1M,64)i16 128B rows, 1.8M rows")
    t42 = jnp.asarray(rng.standard_normal((T2, 42)), dtype=jnp.bfloat16)
    bench(jax.jit(lambda t, i: t[i].astype(jnp.float32).sum()),
          [(t42, i) for i in idx2], tag="(1M,42)bf16 84B rows, 1.8M rows")
    # K=8 contiguous trailing axis as in production (B,R,SR,K) index shape
    idx2k = [i.reshape(-1, 8) for i in idx2]
    bench(jax.jit(lambda t, i: t[i].astype(jnp.float32).sum()),
          [(t42, i) for i in idx2k], tag="same, idx shaped (221k,8)")


if __name__ == "__main__":
    main()
