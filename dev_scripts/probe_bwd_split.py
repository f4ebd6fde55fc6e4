"""Backward-cost split at 1M points: what does the attr-gather scatter-add
transpose (+ the point Adam) actually cost per step?

VERDICT r2 item 2 names "a fused backward that subsumes the attr-gather
scatter-add" as the remaining training lever. Before building anything,
bound the lever: freeze ALL point fields (feat/conf/color_grad=0) so the
gather VJP and the point optimizer vanish from the program, and diff
against the default step. If the marginal is small, the lever is dead and
the honest answer is a floor analysis.

Variants (R=1024, G=16, bf16 gathers, fused fwd/bwd):
  full        - default trainable fields (embedding, conf, color)
  frozen_pts  - all point grads off (MLP-only training)
  fwd_only    - loss value only, no grad at all (forward + loss cost)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import dataclasses  # noqa: E402
import functools  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"))
def fwd_only_multi(state, grid, cfg, tcfg, batches, keys_):
    """G forward+loss evaluations in one dispatch (no grad, no update)."""
    from sgnerf_tpu.models.renderer import render_rays
    from sgnerf_tpu.models.losses import compute_losses

    def body(acc, xs):
        batch, key = xs
        out = render_rays(
            state.params, state.cloud, grid, cfg,
            campos=batch["campos"], raydir=batch["raydir"],
            camrotc2w=batch["camrotc2w"], near=batch["near"],
            far=batch["far"], bg_color=batch.get("bg_color"),
            key=key, is_train=True)
        total, _ = compute_losses(
            out, batch["gt_image"],
            color_loss_items=tcfg.color_loss_items,
            color_loss_weights=tcfg.color_loss_weights,
            zero_one_loss_items=tcfg.zero_one_loss_items,
            zero_one_loss_weights=tcfg.zero_one_loss_weights,
            sparse_loss_weight=tcfg.sparse_loss_weight,
            zero_epsilon=tcfg.zero_epsilon)
        return acc + total, total
    acc, totals = jax.lax.scan(body, jnp.asarray(0.0), (batches, keys_))
    return acc, totals


def run(tag, tcfg, fwd=False, iters=96):
    cloud = make_point_cloud(xyz, emb, color=_color, dir=_dir)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = T.create_train_state(params, cloud, tcfg)
    t0 = time.perf_counter()
    if fwd:
        acc, _ = fwd_only_multi(st, grid, cfg, tcfg, groups[0], kg[0])
        float(acc)
    else:
        st, l = T.train_step_multi(st, grid, cfg, tcfg, groups[0], kg[0])
        float(l["total"][-1])
    print(f"{tag}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    n_disp = max(2, iters // G)
    t0 = time.perf_counter()
    for i in range(n_disp):
        if fwd:
            acc, _ = fwd_only_multi(st, grid, cfg, tcfg, groups[i % 3],
                                    kg[i % 3])
        else:
            st, l = T.train_step_multi(st, grid, cfg, tcfg, groups[i % 3],
                                       kg[i % 3])
    if fwd:
        float(acc)
    else:
        float(l["total"][-1])
    dt = (time.perf_counter() - t0) / (n_disp * G)
    print(f"{tag}: {dt*1e3:.2f} ms/step = {1/dt:.1f} it/s", flush=True)
    del st
    return dt


tc = T.TrainConfig()
full = run("full", tc)
frozen = run("frozen_pts", dataclasses.replace(
    tc, feat_grad=0, conf_grad=0, color_grad=0))
fwd = run("fwd_only", tc, fwd=True)
print(f"split: fwd+loss={fwd*1e3:.1f} ms, mlp-bwd+opt="
      f"{(frozen-fwd)*1e3:.1f} ms, pts-grad(scatter+pAdam)="
      f"{(full-frozen)*1e3:.1f} ms of {full*1e3:.1f} ms total", flush=True)
