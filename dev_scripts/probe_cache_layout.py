"""What physical layout does nbr_packed actually have at runtime, per
build path — and does a jitted-identity relayout to row-major stick?

AOT (probe_aot_copies.py) shows the train_step program copying the full
s16[4.88M,320] cache to row-major ({1,0}) before the row gather — 13.8
ms/dispatch (xprof). _force_row_major is default-off because device_put
relayout trips an axon INVALID_ARGUMENT; this probe checks (a) the real
layouts both build paths emit, (b) whether an out_shardings=Format jit
identity relayout works through the tunnel.
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
n = 1_000_000
xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
emb = np.zeros((n, 32), np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")

g = build_grid(cloud, spec)
jax.block_until_ready(g.nbr_packed)
print("one-shot path nbr_packed", g.nbr_packed.shape,
      "layout", g.nbr_packed.format.layout.major_to_minor, flush=True)

# blocked path at the same scale (the >6.3M-row regime normally uses it)
core = grid_mod._build_grid_core(cloud.xyz, cloud.active, spec)
max_d = g.nbr_packed.shape[0]
one_shot = g.nbr_packed
g = None
t0 = time.perf_counter()
dil_slot, packed = grid_mod._build_nbr_cache_blocked(core, spec, max_d)
jax.block_until_ready(packed)
print(f"blocked path nbr_packed {packed.shape} layout "
      f"{packed.format.layout.major_to_minor} "
      f"({time.perf_counter()-t0:.1f}s)", flush=True)

# feed both tables into a jitted row gather at production row count
idx = jnp.asarray(rng.integers(0, max_d, size=221_000, dtype=np.int64),
                  jnp.int32)
@jax.jit
def rows(tab, ix):
    return jnp.sum(tab[ix].astype(jnp.float32))

for name, tab in [("oneshot", one_shot), ("blocked", packed)]:
    try:
        v = float(rows(tab, idx))
        t0 = time.perf_counter()
        for i in range(6):
            v = float(rows(tab, jnp.roll(idx, i)))
        dt = (time.perf_counter() - t0) / 6
        print(f"gather[{name}] ok {dt*1e3:.1f} ms/call", flush=True)
    except Exception as e:
        print(f"gather[{name}] FAILED: {type(e).__name__} "
              f"{str(e)[:200]}", flush=True)
