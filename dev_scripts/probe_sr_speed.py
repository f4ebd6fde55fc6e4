"""Train-step speed A/B: bf16 gather with nearest vs stochastic rounding.

--gather_round stochastic re-quantizes the packed attribute table every
step with fresh random bits (ops/quant.py): one uint16 draw + integer add
over the ~[N,44] f32 master table, fused by XLA into the cast it replaces.
Quality was measured on CPU (probe_sr_convergence.py: SR >= nearest); this
measures what the per-step RNG costs on the TPU at the training workload
(1024-ray batches, G=4 multi-step dispatch) to decide the recommended
training default.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step_multi)

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate(
    [walls, rng.normal(scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)


def mk_batch(i, R=1024):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {"campos": jnp.asarray([[0.0, 0.0, -1.5]]),
            "raydir": jnp.asarray(d),
            "camrotc2w": jnp.eye(3, dtype=np.float32)[None],
            "near": jnp.asarray(0.1), "far": jnp.asarray(8.0),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(
                r.uniform(0, 1, (1, R, 3)).astype(np.float32))}


G, ITERS = 4, 20
for rnd in ("nearest", "stochastic"):
    cloud = make_point_cloud(
        xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
        dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))
    grid = build_grid(cloud, grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16"))
    jax.block_until_ready(grid.bucket_pnts)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008,) * 3, gather_dtype="bfloat16",
                       gather_round=rnd)
    tcfg = TrainConfig()
    st = create_train_state(init_aggregator_params(jax.random.key(0), cfg.agg),
                            cloud, tcfg)
    keys = jax.random.split(jax.random.key(1), 64)
    stacked = [jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[mk_batch(10 * g + j) for j in range(G)])
               for g in range(3)]
    st, l = train_step_multi(st, grid, cfg, tcfg, stacked[0], keys[:G])
    float(l["total"][-1])
    t0 = time.perf_counter()
    for i in range(ITERS // G):
        st, l = train_step_multi(st, grid, cfg, tcfg, stacked[i % 3],
                                 keys[i * G:(i + 1) * G])
    float(l["total"][-1])
    dt = (time.perf_counter() - t0) / (ITERS // G) / G * 1e3
    print(f"[bf16 gather, {rnd:10s}] {dt:6.1f} ms/step "
          f"({1000 / dt:.1f} it/s) @ G={G}", flush=True)
