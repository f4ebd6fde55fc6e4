"""A/B the batch-dedup gather transpose at 4.2M (the pts-grad scatter is
46.8 ms of the 68.4 ms step — probe_bwd_split_42m).

gather_vjp=batchdedup: sort the batch's 196k ids, aggregate duplicate
cotangent rows into a U_cap-slot compact f32 table, ONE U_cap-row scatter
into the big table (isolated: 55.6 vs 75.0 ms, probe_scatter_size). This
probe measures the real train step; also checks the overflow margin
(n_uniq vs the auto U_cap = 2/3 rows).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import dataclasses  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models import train as T  # noqa: E402

n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
_color = np.clip(xyz * 0.2 + 0.5, 0, 1)
_dir = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)

cloud0 = make_point_cloud(xyz, emb, color=_color, dir=_dir)
spec = grid_spec_for_cloud(
    cloud0, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)

R, G = 1024, 16
base = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")


def mk_batch(i):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {"campos": jnp.asarray([[0., 0., -1.5]]),
            "raydir": jnp.asarray(d),
            "camrotc2w": jnp.eye(3, dtype=np.float32)[None],
            "near": jnp.asarray(0.1), "far": jnp.asarray(8.0),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(
                r.uniform(0, 1, (1, R, 3)).astype(np.float32))}


groups, kg = [], []
keys = jax.random.split(jax.random.key(1), 4096)
for g in range(3):
    bs = [mk_batch(G * g + i) for i in range(G)]
    groups.append(jax.tree.map(lambda *xs: jnp.stack(xs), *bs))
    kg.append(jnp.stack(keys[g * G:(g + 1) * G]))

tc = T.TrainConfig()


def run(tag, cfg, iters=96):
    cloud = make_point_cloud(xyz, emb, color=_color, dir=_dir)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = T.create_train_state(params, cloud, tc)
    t0 = time.perf_counter()
    st, l = T.train_step_multi(st, grid, cfg, tc, groups[0], kg[0])
    losses0 = {k: float(v[-1]) for k, v in l.items()}
    print(f"{tag}: compile {time.perf_counter()-t0:.1f}s "
          f"loss {losses0['total']:.4f} "
          f"overflow {losses0.get('gvjp_overflow', -1):.0f}", flush=True)
    n_disp = max(2, iters // G)
    t0 = time.perf_counter()
    for i in range(n_disp):
        st, l = T.train_step_multi(st, grid, cfg, tc, groups[i % 3],
                                   kg[i % 3])
    float(l["total"][-1])
    dt = (time.perf_counter() - t0) / (n_disp * G)
    print(f"{tag}: {dt*1e3:.2f} ms/step = {1/dt:.1f} it/s", flush=True)
    del st
    return dt


d0 = run("scatter", base)
for U in (0, 98304, 65536):
    cfg = dataclasses.replace(base, gather_vjp="batchdedup", gvjp_batch_U=U)
    d1 = run(f"batchdedup U={U or 'auto'}", cfg)
    print(f"  -> {(d0/d1-1)*100:+.1f}% vs scatter", flush=True)
