"""Deviceless AOT inspection of the train_step program: find the copy /
transpose ops XLA inserts around the grid volumes (xprof measured a
13.8 ms/step 'copy of occ_mask+dil_slot' at G=1) and report the layouts
involved — no tunnel needed (tests/test_mosaic_aot.py topology pattern).

The build emits default-layout arrays (probe_pin_layout: major_to_minor
(0,1,2) with the pin OFF), so the copy is INSIDE the consumer program:
this probe shows which instruction it is and whether a non-default
parameter layout would remove it.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig
from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                     train_step)

topo = topologies.get_topology_desc("v5e:2x2", "tpu")
mesh = Mesh(np.array(topo.devices[:1]), ("d",))
REP = NamedSharding(mesh, P())

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

# grid via eval_shape (the CPU build at 1M points is too slow to run)
grid_sds = jax.eval_shape(lambda c: build_grid(c, spec), cloud)
cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")
tcfg = TrainConfig()
params = init_aggregator_params(jax.random.key(0), cfg.agg)
state_sds = jax.eval_shape(lambda p, c: create_train_state(p, c, tcfg),
                           params, cloud)
R = 1024
batch = {"campos": jnp.zeros((1, 3)), "raydir": jnp.zeros((1, R, 3)),
         "camrotc2w": jnp.zeros((1, 3, 3)), "near": jnp.zeros(()),
         "far": jnp.zeros(()), "bg_color": jnp.zeros(3),
         "gt_image": jnp.zeros((1, R, 3))}
key_sds = jax.eval_shape(lambda: jax.random.key(0))


def sds(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=REP),
        tree)


lowered = train_step.lower(sds(state_sds), sds(grid_sds), cfg, tcfg,
                           sds(batch), sds(key_sds))
compiled = lowered.compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)} chars", flush=True)

# Big-volume shapes to watch (>=8 MB tensors of the grid's dims)
pat = re.compile(r"^\s*(\S+) = (\S+\[[^\]]*\]\{[^}]*\}[^ ]*) "
                 r"(copy|transpose|bitcast)\(", re.M)
found = 0
for m in pat.finditer(txt):
    name, shty, op = m.groups()
    nums = re.findall(r"\[([0-9,]+)\]", shty)
    if not nums:
        continue
    elems = 1
    for d in nums[0].split(","):
        if d:
            elems *= int(d)
    dt = shty.split("[")[0]
    bytes_ = elems * {"u8": 1, "s8": 1, "pred": 1, "bf16": 2, "s16": 2,
                      "u16": 2, "f32": 4, "s32": 4, "u32": 4}.get(dt, 4)
    if bytes_ >= 8 << 20:
        found += 1
        print(f"{op:10} {bytes_/2**20:8.1f} MB  {shty}  {name}")
print(f"{found} big copy/transpose ops")

# parameter layouts XLA chose / was given
try:
    for i, fmtt in enumerate(compiled.input_formats[0][:12]):
        print("arg", i, fmtt)
except Exception as e:
    print("input_formats unavailable:", e)
