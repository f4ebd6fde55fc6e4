"""Map the xprof top ops (fusion / fusion.3 / copy.179...) of the bench
render step to HLO definitions + source lines (compiles the same program and
greps the optimized HLO text)."""
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
# tiny grid build not needed for HLO; but shapes must match the traced ones —
# reuse the real build (cached)
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
print(f"HLO chars: {len(txt)}")

want = ["%fusion ", "%fusion.1 ", "%fusion.2 ", "%fusion.3 ", "%fusion.8 ",
        "%fusion.10 ", "%copy.179 ", "%copy.190 ", "%while.4 ", "%while.5 "]
lines = txt.splitlines()
for w in want:
    for ln in lines:
        if w in ln and "=" in ln.split(w)[0] + w:
            s = ln.strip()
            # pull shape + fusion kind + metadata source line
            m = re.search(r'metadata=\{[^}]*source_file="([^"]+)"[^}]*'
                          r'source_line=(\d+)', s)
            src = f"{m.group(1).split('/')[-1]}:{m.group(2)}" if m else "?"
            kindm = re.search(r'kind=(\w+)', s)
            kind = kindm.group(1) if kindm else ""
            calls = re.search(r'calls=(\S+)', s)
            callee = calls.group(1).rstrip(",") if calls else ""
            print(f"\n== {w.strip()} {kind} src={src} callee={callee}")
            print("   " + s[:240])
            break

# for the big fusions, also dump their computation op histogram
for comp in re.finditer(r"%?(fused_computation[^\s]*) \(", txt):
    pass


def comp_ops(name):
    # find computation body and histogram its op kinds
    m = re.search(rf"^\s*%?{re.escape(name)}\s.*?\{{(.*?)^\}}", txt,
                  re.S | re.M)
    if not m:
        return {}
    ops = re.findall(r"= \S+ (\w+)\(", m.group(1))
    from collections import Counter
    return Counter(ops)


for w in ["%fusion ", "%fusion.3 ", "%fusion.10 "]:
    for ln in lines:
        if w in ln:
            calls = re.search(r'calls=%?(\S+)', ln)
            if calls:
                cname = calls.group(1).rstrip(",")
                c = comp_ops(cname)
                print(f"\n{w.strip()} -> {cname} ops: "
                      f"{dict(sorted(c.items(), key=lambda kv: -kv[1]))}")
                # show gather/dot/sort lines with shapes
                m = re.search(rf"^\s*%?{re.escape(cname)}\s.*?\{{(.*?)^\}}",
                              txt, re.S | re.M)
                if m:
                    for bl in m.group(1).splitlines():
                        if re.search(r"= \S+ (gather|dot|sort|scatter|iota"
                                     r"|transpose)\(", bl):
                            s = bl.strip()
                            mm = re.search(
                                r'source_file="([^"]+)"[^}]*source_line=(\d+)',
                                s)
                            src = (f"{mm.group(1).split('/')[-1]}:"
                                   f"{mm.group(2)}" if mm else "?")
                            print(f"    {s[:150]}  [{src}]")
            break
