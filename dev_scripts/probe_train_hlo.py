"""Deviceless v5e compile of ONE train step (R=1024) — dump scatter/sort/
gather ops from the optimized HLO with shapes, to see what the backward's
attribute-gather transpose actually lowers to (scatter A/B context).

env SGNERF_VJP=sorted switches the gather transpose variant.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies

import sgnerf_tpu.ops.fused_agg as fa
import sgnerf_tpu.ops.fused_knn as fk
fa._interpret = lambda: False
fk._interpret = lambda: False

topo = topologies.get_topology_desc("v5e:2x2", "tpu")
mesh = jax.sharding.Mesh(np.array(topo.devices[:1]), ("d",))
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
rep = NamedSharding(mesh, P())

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, grid_spec_for_cloud, build_grid)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step)

N, R = 1_000_000, 1024
rng = np.random.default_rng(0)
xyz = rng.normal(size=(2000, 3)).astype(np.float32)
cloud = make_point_cloud(xyz, np.zeros((2000, 32), np.float32),
                         color=np.zeros((2000, 3), np.float32),
                         dir=xyz, capacity=N)
spec = grid_spec_for_cloud(cloud, vsize=[0.008] * 3, vscale=[2, 2, 2],
                           kernel_size=[3, 3, 3], max_o=610000, P=26,
                           ranges=[-10.0] * 3 + [10.0] * 3,
                           cache_dtype="bfloat16")
grid = build_grid(cloud, spec)

vjp = os.environ.get("SGNERF_VJP", "scatter")
cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused", gather_vjp=vjp)
tcfg = TrainConfig()
params = init_aggregator_params(jax.random.key(0), cfg.agg)
st = create_train_state(params, cloud, tcfg)
batch = {
    "campos": jnp.zeros((1, 3)), "raydir": jnp.zeros((1, R, 3)),
    "camrotc2w": jnp.zeros((1, 3, 3)),
    "near": jnp.zeros(()), "far": jnp.zeros(()),
    "bg_color": jnp.zeros(3), "gt_image": jnp.zeros((1, R, 3)),
}
key = jax.random.key(1)


def sds(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(
        jnp.shape(x), jnp.result_type(x), sharding=rep), tree)


c = train_step.lower(sds(st), sds(grid), cfg, tcfg, sds(batch),
                     sds(key)).compile()
ma = c.memory_analysis()
print(f"[{vjp}] temp {ma.temp_size_in_bytes/2**30:.2f} GB", flush=True)
hlo = c.as_text()
out = f"/tmp/train_step_{vjp}.hlo"
with open(out, "w") as f:
    f.write(hlo)
print("wrote", out, len(hlo), "bytes")
for line in hlo.splitlines():
    ls = line.strip()
    if (" scatter(" in ls or " sort(" in ls) and " = " in ls:
        print("  ", ls.split(" = ")[1][:140])
