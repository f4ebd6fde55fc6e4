"""Deviceless v5e AOT comparison of the queued render/train variants.

Compiles each variant with the real XLA-TPU/Mosaic toolchain via libtpu
topology AOT (no hardware) and prints XLA's own memory + cost analysis:
compile success kills the "does it even compile at scale" risk (the remote
compiler RET_CHECK class), temp_size checks HBM feasibility, and
bytes-accessed / flops give a static ranking signal for the wall-clock
A/Bs (NOT a substitute for them: bytes-accessed is HLO-level and ignores
fusion locality — see PERFORMANCE.md finding 3 about isolated probes).

Run on CPU: env -u PYTHONPATH JAX_PLATFORMS=cpu python dev_scripts/aot_compare.py
"""
import os
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
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402

import dataclasses  # noqa: E402

N, R, CHUNKS = 1_000_000, 9216, 8


def build_structs(coarse=None):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2000, 3)).astype(np.float32)
    cloud = make_point_cloud(xyz, np.zeros((2000, 32), np.float32),
                             color=np.zeros((2000, 3), np.float32),
                             dir=xyz, capacity=N)
    kw = dict(coarse_factor=coarse[0], seg_len=coarse[1],
              seg_cap=coarse[2]) if coarse else {}
    spec = grid_spec_for_cloud(cloud, vsize=[0.008] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=610000, P=26,
                               ranges=[-10.0] * 3 + [10.0] * 3,
                               cache_dtype="bfloat16", **kw)
    return cloud, build_grid(cloud, spec)


def sds_of(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(
        jnp.shape(x), jnp.result_type(x), sharding=rep), tree)


BASE = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                         fused_mlp="pallas"),
                    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
                    gather_dtype="bfloat16", knn_mode="fused")


def render_step(cfg, B):
    G = CHUNKS // B
    campos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.5]), (B, 3))
    rot = jnp.broadcast_to(jnp.eye(3, dtype=np.float32), (B, 3, 3))
    bg = jnp.ones(3)

    def step(params, cloud, grid, raydirs):          # (G,B,R,3)
        def one(rd):
            out = render_rays(params, cloud, grid, cfg, campos=campos,
                              raydir=rd, camrotc2w=rot, near=0.1, far=8.0,
                              bg_color=bg)
            return jnp.sum(out["coarse_raycolor"])
        return jnp.sum(jax.lax.map(one, raydirs))
    return step, (CHUNKS // B, B, R, 3)


def report(tag, fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
    except Exception as e:
        print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    ma = c.memory_analysis()
    ca = c.cost_analysis() or {}
    print(f"{tag:28s} temp {ma.temp_size_in_bytes / 2**30:6.2f} GB  "
          f"bytes {ca.get('bytes accessed', 0) / 1e9:7.2f} GB  "
          f"flops {ca.get('flops', 0) / 1e9:7.1f} G  "
          f"code {ma.generated_code_size_in_bytes >> 20} MB", flush=True)


def main():
    cloud, grid = build_structs()
    params = init_aggregator_params(jax.random.key(0), BASE.agg)
    p, cl, gr = sds_of(params), sds_of(cloud), sds_of(grid)

    def rd_sds(shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=rep)

    variants = [
        ("B=1 lax.map x8 (current)", BASE, 1),
        ("B=2 lax.map x4", BASE, 2),
        ("B=4 lax.map x2", BASE, 4),
        ("B=8 single call", BASE, 8),
        ("fused_color off", dataclasses.replace(
            BASE, agg=dataclasses.replace(BASE.agg, fused_color=False)), 1),
        ("fused_march on", dataclasses.replace(
            BASE, agg=dataclasses.replace(BASE.agg, fused_march=True)), 1),
        ("march + B=8", dataclasses.replace(
            BASE, agg=dataclasses.replace(BASE.agg, fused_march=True)), 8),
    ]
    for tag, cfg, B in variants:
        fn, shape = render_step(cfg, B)
        report(tag, fn, p, cl, gr, rd_sds(shape))

    # two-level coarse occupancy grids (the remote compiler RET_CHECKed on
    # big cumsum+scatter programs once — compile-check the render per grid)
    for F, L, C in [(4, 8, 32), (2, 4, 32)]:
        cloud2, grid2 = build_structs(coarse=(F, L, C))
        fn, shape = render_step(BASE, 1)
        report(f"coarse F={F} L={L} C={C}", fn, p, sds_of(cloud2),
               sds_of(grid2), rd_sds(shape))

    # training step: fused backward xla vs pallas (G=4 multi-step)
    from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                         train_step_multi)
    tcfg = TrainConfig()
    Rt, G = 1024, 4
    for bwd in ("xla", "pallas"):
        cfgt = dataclasses.replace(
            BASE, agg=dataclasses.replace(BASE.agg, fused_bwd=bwd),
            knn_mode="fused")
        st = create_train_state(params, cloud, tcfg)
        batch = {
            "campos": jnp.zeros((G, 1, 3)), "raydir": jnp.zeros((G, 1, Rt, 3)),
            "camrotc2w": jnp.zeros((G, 1, 3, 3)),
            "near": jnp.zeros((G,)), "far": jnp.zeros((G,)),
            "bg_color": jnp.zeros((G, 3)),
            "gt_image": jnp.zeros((G, 1, Rt, 3)),
        }
        keys = jax.random.split(jax.random.key(1), G)

        def tstep(st, grid, batch, keys, cfgt=cfgt):
            return train_step_multi(st, grid, cfgt, tcfg, batch, keys)
        report(f"train G=4 bwd={bwd}", tstep, sds_of(st), gr,
               sds_of(batch), sds_of(keys))


if __name__ == "__main__":
    main()
