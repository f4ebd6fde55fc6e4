"""Does restructuring pack_cache change the nbr_packed OUTPUT layout?

The planar packing is currently moveaxis+reshape (a transpose), which
biases XLA layout assignment to emit the cache table column-major; every
consumer then pays a full-table relayout copy (13.8 ms/dispatch at 4.2M
pts, probe_aot_copies.py). Explicit Format forcing is a measured dead
end on axon (PERFORMANCE.md). This probe builds a small grid via BOTH
build paths and prints the table layout + a bare row-gather timing, so a
slice+concat pack_cache rewrite can be judged by re-running it.
"""
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
from sgnerf_tpu.ops import grid as grid_mod

rng = np.random.default_rng(0)
n = 120_000
xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
cloud = make_point_cloud(xyz, np.zeros((n, 8), np.float32))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.02] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=120000, P=16, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")

g = build_grid(cloud, spec)
jax.block_until_ready(g.nbr_packed)
print("oneshot nbr_packed", g.nbr_packed.shape,
      "layout", g.nbr_packed.format.layout.major_to_minor, flush=True)

core = grid_mod._build_grid_core(cloud.xyz, cloud.active, spec)
max_d = g.nbr_packed.shape[0]
dil_slot, packed_b = grid_mod._build_nbr_cache_blocked(core, spec, max_d)
jax.block_until_ready(packed_b)
print("blocked nbr_packed", packed_b.shape,
      "layout", packed_b.format.layout.major_to_minor, flush=True)

# value parity between paths (and vs any pack_cache rewrite, via the
# oneshot values staying fixed)
a = np.asarray(g.nbr_packed)
b = np.asarray(packed_b)[: a.shape[0]]
print("paths bit-equal:", bool((a == b).all()), flush=True)

idx = jnp.asarray(rng.integers(0, max_d, size=221_184, dtype=np.int64),
                  jnp.int32)


@jax.jit
def rows(tab, ix):
    return jnp.sum(tab[ix].astype(jnp.float32))


for name, tab in [("oneshot", g.nbr_packed), ("blocked", packed_b)]:
    float(rows(tab, idx))
    t0 = time.perf_counter()
    for i in range(8):
        float(rows(tab, jnp.roll(idx, i)))
    dt = (time.perf_counter() - t0) / 8
    print(f"gather[{name}]: {dt*1e3:.1f} ms/call (incl ~38 ms tunnel)",
          flush=True)
