"""Split the 21.1 ms pts-grad marginal into scatter-transpose vs point-Adam.

probe_scatter_char's micro programs all sat at the ~25 ms host-enqueue
floor (one-op programs measure the dispatch, not the op) — so split by
full-step marginals instead:
  full      - default (Adam on points)           [40.3 ms round-3]
  sgd_pts   - point optimizer swapped to plain SGD (same scatter, no m/v)
  frozen    - point grads off                    [19.2 ms round-3]
full - sgd_pts = Adam state cost; sgd_pts - frozen = scatter + concat VJP.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import dataclasses  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models import train as T  # noqa: E402

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
_color = np.clip(xyz * 0.2 + 0.5, 0, 1)
_dir = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)

cloud0 = make_point_cloud(xyz, emb, color=_color, dir=_dir)
spec = grid_spec_for_cloud(
    cloud0, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)

R, G = 1024, 16
cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")

_orig_make = T.make_optimizers


def make_sgd(tcfg):
    net_tx, _ = _orig_make(tcfg)
    labels = {f: ("train" if tcfg.grad_switch(f) else "freeze")
              for f in T.POINT_FIELDS}
    pts_tx = optax.multi_transform(
        {"train": optax.sgd(T._schedule(tcfg, tcfg.plr)),
         "freeze": optax.set_to_zero()}, labels)
    return net_tx, pts_tx


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


def run(tag, tcfg, sgd=False, iters=96):
    T.make_optimizers = make_sgd if sgd else _orig_make
    cloud = make_point_cloud(xyz, emb, color=_color, dir=_dir)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = T.create_train_state(params, cloud, tcfg)
    t0 = time.perf_counter()
    st, l = T.train_step_multi(st, grid, cfg, tcfg, groups[0], kg[0])
    float(l["total"][-1])
    print(f"{tag}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    n_disp = max(2, iters // G)
    t0 = time.perf_counter()
    for i in range(n_disp):
        st, l = T.train_step_multi(st, grid, cfg, tcfg, groups[i % 3],
                                   kg[i % 3])
    float(l["total"][-1])
    dt = (time.perf_counter() - t0) / (n_disp * G)
    print(f"{tag}: {dt*1e3:.2f} ms/step = {1/dt:.1f} it/s", flush=True)
    T.make_optimizers = _orig_make
    del st
    return dt


tc = T.TrainConfig()
full = run("full(adam)", tc)
# NOTE: perturb plr so the jit cache (keyed on the static tcfg) does not
# reuse the Adam-compiled program for the monkeypatched SGD variant
sgd = run("sgd_pts", dataclasses.replace(tc, plr=tc.plr * (1 + 1e-7)),
          sgd=True)
frozen = run("frozen_pts", dataclasses.replace(
    tc, feat_grad=0, conf_grad=0, color_grad=0))
print(f"split: adam-state={1e3*(full-sgd):.1f} ms, "
      f"scatter+concatVJP={1e3*(sgd-frozen):.1f} ms, "
      f"rest={1e3*frozen:.1f} ms of {1e3*full:.1f}", flush=True)
