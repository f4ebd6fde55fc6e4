"""Training stage split at 4.2M points + the int8 forward-gather A/B
(VERDICT-r3 item 2).

The only published backward split was 1M-only; at 4.2M "scatter/gather
table costs dominate" was asserted from the 66.5 ms total, not measured.
This probe re-runs the fwd_only / frozen_pts / full split at the 4.2M
room scan, then A/Bs gather_dtype=int8 (per-channel affine quantized
TRAINING forward gather, renderer.gather_rows_int8 — the byte-scaling
probe priced int8x42 at 54.0 ms vs bf16x42 at 89.9 ms on 4.2M-scale
tables) with the backward transpose held identical (bf16 scatter both
sides).

R=1024, G=16, fused Pallas fwd/bwd, fused KNN, auto caps.
"""
import os
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
t0 = time.time()
grid = build_grid(cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)
print(f"grid built {time.time()-t0:.0f}s "
      f"(cache {grid.nbr_packed.nbytes/2**30:.2f} GiB)", flush=True)

R, G = 1024, 16
cfg_bf16 = RenderConfig(
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


def run(tag, cfg, tcfg, fwd=False, iters=96):
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
full = run("full_bf16", cfg_bf16, tc)
frozen = run("frozen_pts", cfg_bf16, dataclasses.replace(
    tc, feat_grad=0, conf_grad=0, color_grad=0))
fwd = run("fwd_only_bf16", cfg_bf16, tc, fwd=True)
print(f"4.2M split: fwd+loss={fwd*1e3:.1f} ms, mlp-bwd+opt="
      f"{(frozen-fwd)*1e3:.1f} ms, pts-grad(scatter+pAdam)="
      f"{(full-frozen)*1e3:.1f} ms of {full*1e3:.1f} ms total", flush=True)

cfg_int8 = dataclasses.replace(cfg_bf16, gather_dtype="int8")
full8 = run("full_int8", cfg_int8, tc)
fwd8 = run("fwd_only_int8", cfg_int8, tc, fwd=True)
print(f"int8 A/B: full {full8*1e3:.1f} vs {full*1e3:.1f} ms "
      f"({(full/full8-1)*100:+.1f}%), fwd {fwd8*1e3:.1f} vs {fwd*1e3:.1f}",
      flush=True)
