"""Collective census of the ray-DP programs on the REAL TPU toolchain
(deviceless v5e AOT — no hardware, no tunnel).

Round-5 findings this probe established (and now regression-checks):
- GSPMD sharding propagation is NOT a viable ray-DP mechanism for the
  production path: Mosaic kernels cannot be automatically partitioned —
  a GSPMD-sharded fused render refuses to compile ("Please wrap the call
  in a shard_map"), and the CPU partitioner (not the TPU one) additionally
  all-gathers at `lax.top_k`.
- The shipped shard_map path (parallel/sharded.py render_rays_sharded /
  train_step ray_mesh) compiles the SAME fused-Pallas program per device:
  forward census zero collectives, train census all-reduce only.

Usage: python dev_scripts/probe_raydp_aot.py   (CPU-only, ~minutes)
"""
import os
import re
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgnerf_tpu.models.aggregator import AggregatorConfig, init_aggregator_params
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.models.train import TrainConfig, create_train_state, train_step
import sgnerf_tpu.ops.fused_agg as fused_agg
import sgnerf_tpu.ops.fused_knn as fused_knn

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "all-to-all", "reduce-scatter", "collective-broadcast")


def census(txt):
    return {c: len(re.findall(c, txt)) for c in _COLLECTIVES}


def sites(txt, name):
    out = []
    for line in txt.splitlines():
        if name in line and "= " in line and "metadata" in line:
            m = re.search(r'op_name="([^"]+)"', line)
            out.append(m.group(1) if m else line.strip()[:160])
    return out


def main():
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices), ("data",))
    rep = NamedSharding(mesh, P())
    ray = NamedSharding(mesh, P(None, "data"))

    # production-flavored tiny scene (bf16 cache -> fused KNN eligible)
    rng = np.random.default_rng(0)
    n = 20000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    cloud = make_point_cloud(
        xyz, (rng.normal(size=(n, 32)) * .1).astype(np.float32),
        color=np.clip(xyz * .5 + .5, 0, 1), dir=xyz)

    def build(cache_dtype):
        spec = grid_spec_for_cloud(cloud, vsize=[0.02] * 3, vscale=[2, 2, 2],
                                   kernel_size=[3, 3, 3], max_o=65536, P=16,
                                   cache_dtype=cache_dtype)
        return build_grid(cloud, spec)

    R = 256
    batch = {"campos": jnp.zeros((1, 3)), "raydir": jnp.zeros((1, R, 3)),
             "camrotc2w": jnp.zeros((1, 3, 3)), "near": jnp.asarray(1.0),
             "far": jnp.asarray(5.0), "bg_color": jnp.ones(3),
             "gt_image": jnp.zeros((1, R, 3))}

    def sds(t, sh):
        return jax.tree.map(lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x), sharding=sh), t)

    def batch_sds():
        out = {}
        for k, v in batch.items():
            sh = ray if k in ("raydir", "gt_image") else rep
            out[k] = jax.tree.map(lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.result_type(x), sharding=sh), v)
        return out

    # force Mosaic lowering for the fused path (deviceless AOT)
    fused_agg._interpret = lambda: False
    fused_knn._interpret = lambda: False

    for label, cache_dtype, knn_mode, agg in (
        ("exact-xla", "float32", "exact",
         AggregatorConfig()),
        ("fused-pallas", "bfloat16", "fused",
         AggregatorConfig(compute_dtype="bfloat16", fused_mlp="pallas")),
    ):
        grid = build(cache_dtype)
        cfg = RenderConfig(agg=agg, z_depth_dim=64, SR=8, K=8,
                           vsize=(0.02,) * 3, knn_mode=knn_mode,
                           gather_dtype=("bfloat16" if knn_mode == "fused"
                                         else "float32"))
        params = init_aggregator_params(jax.random.key(0), agg)

        from sgnerf_tpu.parallel.sharded import render_rays_sharded

        def fwd(params, cloud, grid, campos, raydir, camrotc2w, near, far,
                bg):
            return render_rays_sharded(
                params, cloud, grid, cfg, mesh, campos=campos,
                raydir=raydir, camrotc2w=camrotc2w, near=near, far=far,
                bg_color=bg)

        b = batch_sds()
        txt = jax.jit(fwd).lower(
            sds(params, rep), sds(cloud, rep), sds(grid, rep),
            b["campos"], b["raydir"], b["camrotc2w"], b["near"], b["far"],
            b["bg_color"]).compile().as_text()
        print(f"[{label}] FWD census:", census(txt))
        for s in sites(txt, "all-gather")[:8]:
            print(f"  all-gather @ {s}")

        tcfg = TrainConfig()
        st = create_train_state(params, cloud, tcfg)
        txt2 = jax.jit(
            lambda s, g, bb, k: train_step(s, g, cfg, tcfg, bb, k,
                                           ray_mesh=mesh)).lower(
                sds(st, rep), sds(grid, rep), b,
                sds(jax.random.key(1), rep)).compile().as_text()
        print(f"[{label}] TRAIN census:", census(txt2))
        for nm in ("all-gather", "all-to-all", "collective-permute"):
            for s in sites(txt2, nm)[:8]:
                print(f"  {nm} @ {s}")


if __name__ == "__main__":
    main()
