"""Compile-prove the R=4096 @ 4.2M `--scene_shards 8` training escape route
(VERDICT-r3 item 3).

Single-chip training at the reference scene scale (4.2M points) OOMs at
R=4096 (PERFORMANCE.md: the 786k-row backward residuals + scatter temps do
not fit next to the 2.5 GiB cache + point tables + both Adam states);
`--scene_shards` is the shipped route past that wall. This probe AOT-
compiles the ACTUAL spatial_train_step at the full production shape —
4.2M-point room scan, 8 slabs, R=4096, bf16 cache + gathers, fused Pallas
kernels — for a deviceless v5e-8 (2x4) topology via libtpu, and prints the
compiler's per-chip HBM figures. No tunnel, no hardware: the same
Mosaic/XLA-TPU toolchain that would run it.

Shapes come from plan_sharded_scene on the real bench cloud (the host-side
planner build_sharded_scene itself uses), so capacities are the production
ones, not guesses; the state tree comes from jax.eval_shape over the real
create_spatial_train_state.

Usage: python dev_scripts/probe_spatial_aot_42m.py [n_points]
"""
import os
import sys
import time

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _room_scan                                   # noqa: E402
from sgnerf_tpu.models.aggregator import (AggregatorConfig,    # noqa: E402
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (make_point_cloud,   # noqa: E402
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig            # noqa: E402
from sgnerf_tpu.models.train import TrainConfig                # noqa: E402
from sgnerf_tpu.ops.grid import _cache_width                   # noqa: E402
from sgnerf_tpu.parallel.spatial import (ShardedScene,         # noqa: E402
                                         SpatialTrainState,
                                         create_spatial_train_state,
                                         plan_sharded_scene,
                                         spatial_train_step)
import sgnerf_tpu.ops.fused_agg as fused_agg                   # noqa: E402
import sgnerf_tpu.ops.fused_knn as fused_knn                   # noqa: E402

# the kernels check jax.default_backend() to pick interpret mode; AOT must
# lower through Mosaic
fused_agg._interpret = lambda: False
fused_knn._interpret = lambda: False


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 4_200_000
    n_shards = 8
    R = int(os.environ.get("SGNERF_PROBE_R", 4096))

    rng = np.random.default_rng(0)
    t0 = time.time()
    xyz = _room_scan(rng, n_points)
    # production grid config (bench.py): 8 mm voxels, vscale 2, bf16 cache
    tmpl = make_point_cloud(
        xyz[:64], np.zeros((64, 32), np.float32),
        color=np.zeros((64, 3), np.float32),
        dir=np.zeros((64, 3), np.float32), capacity=64)
    # full-cloud spec: grid_spec_for_cloud only needs xyz ranges, so feed it
    # the real xyz through a lightweight replace
    import dataclasses as dc
    full = dc.replace(tmpl, xyz=jnp.asarray(xyz),
                      active=jnp.ones(len(xyz), bool),
                      n_active=jnp.asarray(len(xyz), jnp.int32))
    gspec = grid_spec_for_cloud(
        full, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    capacity = len(xyz)
    sspec, sels = plan_sharded_scene(
        xyz, np.ones(len(xyz), bool), gspec, n_shards, capacity)
    print(f"[plan] {time.time()-t0:.1f}s  vdim={gspec.vdim} "
          f"cap_pts={sspec.cap_pts} max_o_s={sspec.max_o_s} "
          f"max_d_s={sspec.max_d_s} halo={sspec.halo} Lx={sspec.Lx}",
          flush=True)

    # ---- scene SDS at production shapes (never materialized)
    n = n_shards
    CAP_T = 64  # template capacity sentinel

    def cloud_sds(a):
        a = np.asarray(a)
        if a.ndim >= 1 and a.shape[0] == CAP_T:
            shape = (n, sspec.cap_pts) + a.shape[1:]
        else:
            shape = (n,) + a.shape
        return jax.ShapeDtypeStruct(shape, a.dtype)

    X, Y, Z = gspec.vdim
    W = _cache_width(gspec.cache_dtype)
    C = gspec.nbr_cache
    scene_sds = ShardedScene(
        cloud=jax.tree.map(cloud_sds, tmpl),
        occ_mask=jax.ShapeDtypeStruct((n, sspec.Lx, Y, Z), jnp.uint8),
        dil_slot=jax.ShapeDtypeStruct((n, sspec.Lx, Y, Z), jnp.int32),
        nbr_packed=jax.ShapeDtypeStruct((n, sspec.max_d_s, C * W), jnp.int16),
        x_off=jax.ShapeDtypeStruct((n,), jnp.int32),
        own_lo=jax.ShapeDtypeStruct((n,), jnp.int32),
        own_hi=jax.ShapeDtypeStruct((n,), jnp.int32),
        gid=jax.ShapeDtypeStruct((n, sspec.cap_pts), jnp.int32),
    )

    agg = AggregatorConfig(compute_dtype="bfloat16", fused_mlp="pallas",
                           fused_bwd="pallas")
    cfg = RenderConfig(agg=agg, z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008,) * 3, gather_dtype="bfloat16",
                       knn_mode="fused")
    tcfg = TrainConfig()
    params = init_aggregator_params(jax.random.key(0), agg)
    params_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        params)

    st_sds = jax.eval_shape(
        lambda p, s: create_spatial_train_state(p, s, tcfg),
        params_sds, scene_sds)

    batch_sds = {
        "campos": jax.ShapeDtypeStruct((1, 3), jnp.float32),
        "raydir": jax.ShapeDtypeStruct((1, R, 3), jnp.float32),
        "camrotc2w": jax.ShapeDtypeStruct((1, 3, 3), jnp.float32),
        "near": jax.ShapeDtypeStruct((), jnp.float32),
        "far": jax.ShapeDtypeStruct((), jnp.float32),
        "bg_color": jax.ShapeDtypeStruct((3,), jnp.float32),
        "gt_image": jax.ShapeDtypeStruct((1, R, 3), jnp.float32),
        "pixel_label": jax.ShapeDtypeStruct((1, R), jnp.int32),
    }
    key_sds = jax.eval_shape(lambda: jax.random.key(0))

    # ---- deviceless v5e-8 topology + sharded lowering
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))

    def with_sh(t, sh):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), t)

    st_in = SpatialTrainState(
        params=with_sh(st_sds.params, rep),
        scene=with_sh(st_sds.scene, shd),
        opt_state_net=with_sh(st_sds.opt_state_net, rep),
        opt_state_pts=with_sh(st_sds.opt_state_pts, shd),
        step=with_sh(st_sds.step, rep))

    def tstep(st, batch, key):
        return spatial_train_step(st, sspec, cfg, tcfg, batch, key, mesh)

    t0 = time.time()
    # donate the state, like the production multi-step dispatch does —
    # the big tables alias in-place and must not double-count
    c = jax.jit(tstep, donate_argnums=(0,)).lower(
        st_in, with_sh(batch_sds, rep), with_sh(key_sds, rep)).compile()
    m = c.memory_analysis()
    gib = 1024 ** 3
    print(f"[aot] compiled in {time.time()-t0:.1f}s")
    print(f"[aot] per-chip HBM: args {m.argument_size_in_bytes/gib:.2f} GiB"
          f" + outputs {m.output_size_in_bytes/gib:.2f} GiB"
          f" + temps {m.temp_size_in_bytes/gib:.2f} GiB"
          f" - aliased {m.alias_size_in_bytes/gib:.2f} GiB")
    peak = (m.argument_size_in_bytes + m.output_size_in_bytes
            + m.temp_size_in_bytes - m.alias_size_in_bytes)
    print(f"[aot] peak estimate {peak/gib:.2f} GiB of 16 GiB v5e HBM "
          f"(R={R}, {n_points} pts, {n_shards} shards)")
    assert peak < 16 * gib, "does not fit per-chip HBM"
    print("OK")


if __name__ == "__main__":
    main()
