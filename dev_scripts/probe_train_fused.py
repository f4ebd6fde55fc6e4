"""A/B the fused Pallas aggregator in the TRAINING step vs the plain XLA
path, 1024-ray batches at bench scale. Sweeps the backward too:
fused_bwd=xla (custom_vjp recomputes the un-fused XLA path) vs
fused_bwd=pallas (the fused backward kernel, ops/fused_agg.py
_pallas_backward)."""
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
                                     train_step)

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)


def mk_batch(i, R=1024):
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


# The grid (multi-GB cache) is variant-independent and never donated:
# build it ONCE. Rebuilding per variant kept two grids alive at the same
# time (the old one referenced until rebound) and OOMed the chip.
_cloud0 = make_point_cloud(
    xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
    dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
spec = grid_spec_for_cloud(
    _cloud0, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(_cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)

for fused, fbwd in (("none", "xla"), ("pallas", "xla"),
                    ("pallas", "pallas")):
    # fresh cloud per variant: train_step donates the state, which holds
    # the cloud buffers (models/train.py donate_argnums=(0,))
    cloud = make_point_cloud(
        xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
        dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
    cfg = RenderConfig(agg=AggregatorConfig(fused_mlp=fused, fused_bwd=fbwd),
                       z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008,) * 3, gather_dtype="float32")
    tcfg = TrainConfig()
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = create_train_state(params, cloud, tcfg)

    batches = [mk_batch(i) for i in range(6)]
    keys = jax.random.split(jax.random.key(1), 64)
    t0 = time.perf_counter()
    st, l = train_step(st, grid, cfg, tcfg, batches[0], keys[0])
    v0 = float(l["total"])
    print(f"fused={fused} bwd={fbwd}: compile "
          f"{time.perf_counter()-t0:.1f}s loss={v0:.5f}")
    iters = 20
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        st, l = train_step(st, grid, cfg, tcfg, batches[i % 6], keys[i])
        last = l
    float(last["total"])
    dt1 = (time.perf_counter() - t0) / iters * 1e3
    print(f"fused={fused} bwd={fbwd}: {dt1:.1f} ms/step (pipelined)")
