"""Identify the remaining big copies (copy.179 / copy.190 / ...) in the
bench render HLO: print each copy op >= 1 MB with shapes, layouts, producer
op and source line, to find what forces the relayout."""
import re
import sys

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
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402

rng = np.random.default_rng(0)
n = 1_000_000
xyz = rng.normal(scale=0.7, size=(n, 3)).astype(np.float32)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(cloud, spec)

cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                        fused_mlp="pallas"),
                   z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
                   gather_dtype="bfloat16", knn_mode="fused")
params = init_aggregator_params(jax.random.key(0), cfg.agg)
R = 9216
raydir = jnp.zeros((1, R, 3), jnp.float32).at[..., 2].set(1.0)


@jax.jit
def step(params, cloud, grid, raydir):
    out = render_rays(params, cloud, grid, cfg, campos=jnp.asarray(
        [[0.0, 0.0, -1.5]]), raydir=raydir, camrotc2w=jnp.eye(3)[None],
        near=0.1, far=8.0, bg_color=jnp.ones(3))
    return jnp.sum(out["coarse_raycolor"])


txt = step.lower(params, cloud, grid, raydir).compile().as_text()

DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "s16": 2, "u16": 2,
            "u8": 1, "s8": 1, "pred": 1, "f16": 2}


def nbytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    cnt = 1
    for d in dims.split(","):
        if d:
            cnt *= int(d)
    return cnt * DT_BYTES.get(dt, 4)


# collect all named ops so we can look up producers
defs = {}
for ln in txt.splitlines():
    m = re.match(r"\s*(%[\w.\-]+) = (.*)", ln)
    if m:
        defs[m.group(1)] = m.group(2)

for name, body in defs.items():
    if not re.match(r"%copy(\.\d+)?$", name.split("=")[0].strip()):
        continue
    shape = body.split(" ", 1)[0]
    sz = nbytes(shape)
    if sz < 1_000_000:
        continue
    src = re.search(r'source_file="([^"]+)"[^}]*source_line=(\d+)', body)
    srcs = f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else "?"
    args = re.findall(r"copy\((%[\w.\-]+)", body)
    prod = ""
    if args and args[0] in defs:
        p = defs[args[0]]
        psrc = re.search(r'source_file="([^"]+)"[^}]*source_line=(\d+)', p)
        ps = (f"{psrc.group(1).split('/')[-1]}:{psrc.group(2)}"
              if psrc else "?")
        prod = f"\n    <- {args[0]} = {p[:160]}  [{ps}]"
    print(f"{name}: {sz/1e6:.1f} MB {body[:180]}  [{srcs}]{prod}\n",
          flush=True)
