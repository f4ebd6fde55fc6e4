"""Sort variants for the attr-dedup extract (the ~25 ms piece).

(144, 12288) int32 ids: (a) jnp.sort (stable), (b) lax.sort unstable,
(c) bitcast-to-f32 sort (order-preserving for non-negative ints < 2^31
with no NaN patterns — ids < 2^25), (d) f32 unstable, (e) descending...
Whatever wins drops straight into dedup_tile_gather.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NT, TW = 144, 12288
rng = np.random.default_rng(0)
idss = [jnp.asarray(rng.integers(0, 4_200_000, (NT, TW)).astype(np.int32))
        for _ in range(3)]


def timeit(fn, iters=12, tag=""):
    _ = float(fn(idss[0]))
    t0 = time.perf_counter()
    rs = [fn(idss[k % 3]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)


@jax.jit
def s_stable(x):
    return jnp.sum(jnp.sort(x, axis=1) % 97)


@jax.jit
def s_unstable(x):
    (out,) = jax.lax.sort((x,), dimension=1, is_stable=False)
    return jnp.sum(out % 97)


@jax.jit
def s_f32(x):
    f = jax.lax.bitcast_convert_type(x, jnp.float32)
    out = jnp.sort(f, axis=1)
    return jnp.sum(jax.lax.bitcast_convert_type(out, jnp.int32) % 97)


@jax.jit
def s_f32_unstable(x):
    f = jax.lax.bitcast_convert_type(x, jnp.float32)
    (out,) = jax.lax.sort((f,), dimension=1, is_stable=False)
    return jnp.sum(jax.lax.bitcast_convert_type(out, jnp.int32) % 97)


# correctness: bitcast order preservation
a = np.asarray(jax.lax.bitcast_convert_type(
    jnp.sort(jax.lax.bitcast_convert_type(idss[0], jnp.float32), axis=1),
    jnp.int32))
b = np.sort(np.asarray(idss[0]), axis=1)
print("bitcast-sort correct:", bool((a == b).all()), flush=True)

timeit(s_stable, tag="jnp.sort (stable) int32")
timeit(s_unstable, tag="lax.sort unstable int32")
timeit(s_f32, tag="bitcast f32 stable")
timeit(s_f32_unstable, tag="bitcast f32 unstable")
