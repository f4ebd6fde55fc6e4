"""Deviceless memory analysis of the 4.2M-point grid build (the bench OOMed
in _build_grid_core at the first host sync). Prints the auto spec and XLA's
temp/output sizes for the core build + one cache block."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies

topo = topologies.get_topology_desc("v5e:2x2", "tpu")
mesh = jax.sharding.Mesh(np.array(topo.devices[:1]), ("d",))
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

rep = NamedSharding(mesh, P())

from sgnerf_tpu.ops.grid import (  # noqa: E402
    compute_grid_spec, _build_grid_core, _fill_cache_block, _CACHE_BLOCK,
    _cache_width, GridSpec, PointGrid)

rng = np.random.default_rng(0)
n_points = int(os.environ.get("SGNERF_BENCH_POINTS", 4_200_000))
import importlib.util  # noqa: E402
_s = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
_bench = importlib.util.module_from_spec(_s)
_s.loader.exec_module(_bench)
xyz = _bench._room_scan(rng, n_points)

spec = compute_grid_spec(
    xyz, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
print("spec:", spec.vdim, "max_o", spec.max_o, "P", spec.P, flush=True)
nvox = spec.vdim[0] * spec.vdim[1] * spec.vdim[2]
print(f"nvox {nvox/1e6:.1f}M  bucket_pnts {spec.max_o*spec.P*4/2**30:.2f} GB"
      f"  bucket_xyz {spec.max_o*spec.P*12/2**30:.2f} GB", flush=True)


def sds(shape, dt):
    return jax.ShapeDtypeStruct(shape, dt, sharding=rep)


N = xyz.shape[0]
xs = sds((N, 3), jnp.float32)
ms = sds((N,), jnp.bool_)

c = jax.jit(_build_grid_core, static_argnames=("spec",)).lower(
    xs, ms, spec=spec).compile()
ma = c.memory_analysis()
print(f"core build: temp {ma.temp_size_in_bytes/2**30:.2f} GB  "
      f"out {ma.output_size_in_bytes/2**30:.2f} GB  "
      f"args {ma.argument_size_in_bytes/2**30:.2f} GB", flush=True)

# the one-shot cache build program at the ACTUAL max_d of this scene
from sgnerf_tpu.ops.grid import _build_nbr_cache_jit  # noqa: E402
X, Y, Z = spec.vdim
grid_sds = PointGrid(
    occ_mask=sds((X, Y, Z), jnp.uint8),
    vox_slot=sds((X, Y, Z), jnp.int32),
    bucket_pnts=sds((spec.max_o, spec.P), jnp.int32),
    bucket_cnt=sds((spec.max_o,), jnp.int32),
    bucket_xyz=sds((spec.max_o, spec.P, 3), jnp.float32),
    dil_slot=sds((X, Y, Z), jnp.int32),
    nbr_packed=sds((0, 0), jnp.int16),
    coarse_occ=sds(((X + 3) // 4, (Y + 3) // 4, (Z + 3) // 4), jnp.uint8),
    spec=spec)
max_d = int(os.environ.get("SGNERF_MAXD", 2 * 262144 * 6))  # ~3.1M
c2 = jax.jit(_build_nbr_cache_jit, static_argnames=("spec", "max_d")).lower(
    grid_sds, spec=spec, max_d=max_d).compile()
ma2 = c2.memory_analysis()
print(f"one-shot cache (max_d={max_d/1e6:.2f}M): "
      f"temp {ma2.temp_size_in_bytes/2**30:.2f} GB  "
      f"out {ma2.output_size_in_bytes/2**30:.2f} GB  "
      f"args {ma2.argument_size_in_bytes/2**30:.2f} GB", flush=True)

# blocked variant block program
W = _cache_width(spec.cache_dtype)
out = sds((max_d, spec.nbr_cache * W), jnp.int16)
blk = sds((_CACHE_BLOCK, 3), jnp.int32)
off = sds((), jnp.int32)
c3 = jax.jit(_fill_cache_block, static_argnames=("spec",),
             donate_argnums=(0,)).lower(out, grid_sds, blk, off,
                                        spec=spec).compile()
ma3 = c3.memory_analysis()
print(f"blocked fill block: temp {ma3.temp_size_in_bytes/2**30:.2f} GB  "
      f"out {ma3.output_size_in_bytes/2**30:.2f} GB  "
      f"args {ma3.argument_size_in_bytes/2**30:.2f} GB", flush=True)
