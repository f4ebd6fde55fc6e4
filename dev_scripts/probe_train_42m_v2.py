"""Training at 4.2M: does the raydedup transpose pay where the scatter is
byte-scaled up? (It lost at 1M: 43.9 vs 40.3 ms — but the dedup overhead
is scale-independent while the scatter cost grows with the table.)"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step_multi)

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
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
t0 = time.time()
grid = build_grid(cloud0, spec)
jax.block_until_ready(grid.bucket_pnts)
print(f"grid built in {time.time()-t0:.0f}s", flush=True)

R, G = 1024, 16


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


def run(vjp, U=64, iters=64):
    cloud = make_point_cloud(xyz, emb, color=_color, dir=_dir)
    cfg = RenderConfig(
        agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
        z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
        gather_dtype="bfloat16", knn_mode="fused", gather_vjp=vjp,
        gvjp_U=U)
    tcfg = TrainConfig()
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    st = create_train_state(params, cloud, tcfg)
    keys = jax.random.split(jax.random.key(1), 4096)
    groups = []
    for g in range(3):
        bs = [mk_batch(G * g + i) for i in range(G)]
        groups.append(jax.tree.map(lambda *xs: jnp.stack(xs), *bs))
    kg = [jnp.stack(keys[g * G:(g + 1) * G]) for g in range(3)]
    tag = f"vjp={vjp}" + (f" U={U}" if vjp == "raydedup" else "")
    try:
        t0 = time.perf_counter()
        st, l = train_step_multi(st, grid, cfg, tcfg, groups[0], kg[0])
        print(f"{tag}: compile {time.perf_counter()-t0:.1f}s "
              f"loss={float(l['total'][-1]):.5f}", flush=True)
        n_disp = max(2, iters // G)
        t0 = time.perf_counter()
        for i in range(n_disp):
            st, l = train_step_multi(st, grid, cfg, tcfg, groups[i % 3],
                                     kg[i % 3])
        float(l["total"][-1])
        dt = (time.perf_counter() - t0) / (n_disp * G)
        print(f"{tag}: {dt*1e3:.2f} ms/step = {1/dt:.1f} it/s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    del st


run("scatter")
run("raydedup", U=64)
run("raydedup", U=96)
