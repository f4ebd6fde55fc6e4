"""Isolate why the row-major-forced cache table makes train_step 18x
slower (953.8 vs 54.0 ms/step, probe_pin_layout) even though the AOT HLO
is ideal (gather reads the parameter, no copies): time a BARE row gather
against (a) the old column-major table (in-program relayout + gather),
(b) the out_shardings-forced row-major table, (c) the forced table washed
through a PLAIN jit identity (physically row-major, no custom Format).
If (b) is slow and (c) fast, the axon backend mishandles explicitly
formatted arrays per dispatch (same family as the device_put
INVALID_ARGUMENT lore in PERFORMANCE.md)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])


def build(rm):
    os.environ["SGNERF_CACHE_RM"] = rm
    cloud = make_point_cloud(xyz, np.zeros((n, 32), np.float32))
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    g = build_grid(cloud, spec)
    jax.block_until_ready(g.nbr_packed)
    return g.nbr_packed


t_rm = build("1")
print("rm table layout", t_rm.format.layout.major_to_minor, flush=True)
t_cm = build("0")
print("cm table layout", t_cm.format.layout.major_to_minor, flush=True)
washed = jax.jit(lambda a: a)(t_rm)
jax.block_until_ready(washed)
print("washed layout", washed.format.layout.major_to_minor,
      "format", washed.format == t_rm.format, flush=True)

max_d = t_rm.shape[0]
idx = jnp.asarray(rng.integers(0, max_d, size=221_184, dtype=np.int64),
                  jnp.int32)


@jax.jit
def rows(tab, ix):
    return jnp.sum(tab[ix].astype(jnp.float32))


for name, tab in [("colmajor", t_cm), ("rowmajor-fmt", t_rm),
                  ("rowmajor-washed", washed)]:
    try:
        float(rows(tab, idx))
        t0 = time.perf_counter()
        for i in range(8):
            float(rows(tab, jnp.roll(idx, i)))
        dt = (time.perf_counter() - t0) / 8
        print(f"gather[{name}]: {dt*1e3:.1f} ms/call (incl ~38 ms tunnel)",
              flush=True)
    except Exception as e:
        print(f"gather[{name}] FAILED: {type(e).__name__} {str(e)[:160]}",
              flush=True)
