"""Does TPU sort cost scale with SEGMENT WIDTH at fixed total elements?

The attr-dedup extract sorts (144, 12288) int32 per chunk (~25 ms, the
largest single piece of the 39 ms dedup'd attr stage). Bitonic sorts run
O(log^2 w) passes over the data, so sorting the SAME 1.77M elements as
narrower independent segments (per-ray: (9216, 192)) should cost ~3x less
— IF XLA's TPU sort actually realizes the pass-count saving. This probe
measures jnp.sort at fixed 1.77M elements across widths; if narrow wins,
a two-level extraction (per-ray uniques -> per-tile merge) replaces the
flat tile sort in dedup_tile_gather.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

TOTAL = 144 * 12288
rng = np.random.default_rng(0)


def timeit(fn, xs, iters=12, tag=""):
    _ = float(fn(xs[0]))
    t0 = time.perf_counter()
    rs = [fn(xs[k % 3]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)


@jax.jit
def s(x):
    return jnp.sum(jnp.sort(x, axis=1) % 97)


@jax.jit
def s_unstable(x):
    (out,) = jax.lax.sort((x,), dimension=1, is_stable=False)
    return jnp.sum(out % 97)


for w in (12288, 6144, 3072, 1536, 768, 384, 192, 96):
    n = TOTAL // w
    xs = [jnp.asarray(rng.integers(0, 4_200_000, (n, w)).astype(np.int32))
          for _ in range(3)]
    timeit(s, xs, tag=f"stable   ({n:6d},{w:5d})")
    timeit(s_unstable, xs, tag=f"unstable ({n:6d},{w:5d})")
