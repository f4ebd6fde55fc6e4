"""Capture a profiler trace of the bench render step and print the top
device ops by total duration (parses the perfetto trace.json.gz offline —
no tensorboard needed)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

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
from sgnerf_tpu.models.renderer import RenderConfig, render_rays

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)

cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                        fused_mlp="pallas"),
                   z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
                   gather_dtype="bfloat16", knn_mode="fused")
params = init_aggregator_params(jax.random.key(0), cfg.agg)
R = 9216


def mk_raydir(i):
    d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
         ).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d)


@jax.jit
def step(params, cloud, grid, raydir):
    out = render_rays(params, cloud, grid, cfg, campos=jnp.asarray(
        [[0.0, 0.0, -1.5]]), raydir=raydir, camrotc2w=jnp.eye(3)[None],
        near=0.1, far=8.0, bg_color=jnp.ones(3))
    return jnp.sum(out["coarse_raycolor"])


rds = [mk_raydir(i) for i in range(3)]
float(step(params, cloud, grid, rds[0]))  # compile

outdir = "/tmp/xprof_render"
with jax.profiler.trace(outdir):
    for i in range(3):
        float(step(params, cloud, grid, rds[i % 3]))

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if not files:
    sys.exit(0)
with gzip.open(sorted(files)[-1], "rt") as f:
    trace = json.load(f)
ev = trace.get("traceEvents", [])
# device op events: pid/tid mapped tracks; aggregate by name
tot = defaultdict(float)
cnt = defaultdict(int)
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        pname = names.get(e.get("pid"), "")
        if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
if not tot:   # fall back: aggregate everything with a duration
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
print(f"{'total_ms':>10} {'n':>5}  op")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{us/1e3:10.2f} {cnt[name]:5d}  {name[:110]}")
