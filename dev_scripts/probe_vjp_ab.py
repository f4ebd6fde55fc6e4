"""A/B the attribute-gather transpose in the training backward:
gather_vjp=scatter (XLA native scatter-add) vs sorted (argsort +
segment_sum, f32 accumulation), at train chunk sizes; plus a G=32 point
on the dispatch-batching curve (NEXT.md queue).

Round-1 context: sorted lost at R=1024 when the step was 128 ms; the
fused backward since removed most other cost (step ~41 ms), so the
scatter's share grew — re-measure.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig
from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                     train_step, train_step_multi)

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)

_cloud0 = make_point_cloud(
    xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
    dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
spec = grid_spec_for_cloud(
    _cloud0, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(_cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)


def mk_batch(i, R):
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


def run(vjp, G, R, iters=48):
    cloud = make_point_cloud(
        xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
        dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
    cfg = RenderConfig(
        agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
        z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
        gather_dtype="bfloat16", knn_mode="fused", gather_vjp=vjp)
    tcfg = TrainConfig()
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = create_train_state(params, cloud, tcfg)
    keys = jax.random.split(jax.random.key(1), 4096)
    tag = f"vjp={vjp} G={G} R={R}"
    t0 = time.perf_counter()
    if G == 1:
        batches = [mk_batch(i, R) for i in range(6)]
        st, l = train_step(st, grid, cfg, tcfg, batches[0], keys[0])
        v0 = float(l["total"])
        print(f"{tag}: compile {time.perf_counter()-t0:.1f}s "
              f"loss={v0:.5f}", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            st, l = train_step(st, grid, cfg, tcfg, batches[i % 6],
                               keys[i + 1])
        float(l["total"])
        dt = (time.perf_counter() - t0) / iters
    else:
        groups = []
        for g in range(3):
            bs = [mk_batch(G * g + i, R) for i in range(G)]
            groups.append(jax.tree.map(
                lambda *xs: jnp.stack(xs), *bs))
        kg = [keys[g * G:(g + 1) * G] for g in range(3)]
        st, l = train_step_multi(st, grid, cfg, tcfg, groups[0],
                                 jnp.stack(kg[0]))
        v0 = float(l["total"][-1])
        print(f"{tag}: compile {time.perf_counter()-t0:.1f}s "
              f"loss={v0:.5f}", flush=True)
        n_disp = max(2, iters // G)
        t0 = time.perf_counter()
        for i in range(n_disp):
            st, l = train_step_multi(st, grid, cfg, tcfg,
                                     groups[i % 3], jnp.stack(kg[i % 3]))
        float(l["total"][-1])
        dt = (time.perf_counter() - t0) / (n_disp * G)
    print(f"{tag}: {dt*1e3:.1f} ms/step = {1/dt:.1f} it/s "
          f"({R/dt:.0f} rays/s)", flush=True)
    del st
    return dt


# head-to-head at the G=16 train headline + the 4096-ray scaling point
run("scatter", 16, 1024)
run("sorted", 16, 1024)
run("sorted", 4, 4096)
run("scatter", 4, 4096)
# dispatch-batching tail: does G=32 still help?
run("scatter", 32, 1024)
