"""Profile ONE train step (1024 rays, fused fwd/bwd) and print the top
device ops by total duration — where do the ~41 ms/step go? (NEXT.md: the
suspected residual is the attribute-gather transpose scatter-add.)"""
import faulthandler
import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import signal
faulthandler.enable()
faulthandler.register(signal.SIGUSR1)
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
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
print("spec ready; building grid", flush=True)
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)

R = 1024
cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")
tcfg = TrainConfig()
params = init_aggregator_params(jax.random.key(0), cfg.agg)
st = create_train_state(params, cloud, tcfg)
keys = jax.random.split(jax.random.key(1), 64)


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


batches = [mk_batch(i) for i in range(6)]
st, l = train_step(st, grid, cfg, tcfg, batches[0], keys[0])
print("compiled; loss", float(l["total"]), flush=True)
# settle
for i in range(3):
    st, l = train_step(st, grid, cfg, tcfg, batches[(i + 1) % 6],
                       keys[i + 1])
float(l["total"])

outdir = "/tmp/xprof_train"
with jax.profiler.trace(outdir):
    for i in range(4):
        st, l = train_step(st, grid, cfg, tcfg, batches[(i + 4) % 6],
                           keys[i + 8])
    float(l["total"])

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if not files:
    sys.exit(0)
with gzip.open(sorted(files)[-1], "rt") as f:
    trace = json.load(f)
ev = trace.get("traceEvents", [])
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
if not tot:
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
print(f"{'total_ms':>10} {'n':>5}  op")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{us/1e3:10.2f} {cnt[name]:5d}  {name[:110]}")
