"""BPNet full-cloud semantic step at REFERENCE scale (4.2M points).

Round-2 measured the semantic step on a 48k-voxel cloud (303 ms bf16).
The reference's real workload runs BPNet over the WHOLE ~4.2M-point
ScanNet cloud each refresh (neural_points_volumetric_model.py:464-540).
Measures at 4.2M: link building (native C++), 5 cm voxelization,
sparse-UNet forward, devoxelize — wall clock per refresh, plus the
amortized cost at --bpnet_refresh_every.
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.bpnet.bpnet import BPNet, BPNetConfig  # noqa: E402

n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n).astype(np.float32)
xyz -= xyz.min(0) - 0.1                      # voxelize wants positive coords
feats = rng.integers(0, 255, size=(n, 3)).astype(np.float32)

# fabricate 3 camera views on disk (320x240, the reference's bpnet res)
W, H = 320, 240
tmp = tempfile.mkdtemp(prefix="bpnet42_")
for sub in ("color", "depth", "pose", "label"):
    os.makedirs(os.path.join(tmp, sub), exist_ok=True)
from PIL import Image  # noqa: E402

intr4 = np.eye(4)
intr4[:3, :3] = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])
paths = []
for i in range(3):
    ang = 2 * np.pi * i / 3
    campos = np.array([2.5 + 2 * np.sin(ang), 2.5 + 2 * np.cos(ang), 1.5])
    c2w = np.eye(4)
    fwd = np.array([2.5, 2.5, 1.5]) - campos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0, 0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    upv = np.cross(right, fwd)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, -upv, fwd, campos
    p = os.path.join(tmp, f"color/{i}.jpg")
    Image.fromarray(rng.integers(0, 255, (H, W, 3)).astype(np.uint8)).save(p)
    Image.fromarray((np.full((H, W), 2.5) * 1000).astype(np.uint16)).save(
        os.path.join(tmp, f"depth/{i}.png"))
    np.savetxt(os.path.join(tmp, f"pose/{i}.txt"), c2w)
    paths.append(p)

for dtype in ("float32", "bfloat16"):
    cfg = BPNetConfig(classes=20, view_num=3, img_wh=(W, H),
                      compute_dtype=dtype)
    net = BPNet(cfg, key=jax.random.key(0))
    t0 = time.time()
    labels, probs, l2d, feat, _ = net.train_bpnet(
        xyz, feats, [paths], paths[0], intr4)
    t_first = time.time() - t0
    t0 = time.time()
    labels, probs, l2d, feat, _ = net.train_bpnet(
        xyz, feats, [paths], paths[0], intr4)
    t_warm = time.time() - t0
    print(f"[{dtype}] 4.2M-point semantic refresh: first {t_first:.1f}s "
          f"(compile), warm {t_warm:.2f}s; labels {labels.shape} "
          f"probs {probs.shape} feat {feat.shape}", flush=True)
    del net

# device_out: the (N,20)+(N,96) devoxelize stays on device (the driver's
# refresh path) — time the same forward without the host round-trip
cfg = BPNetConfig(classes=20, view_num=3, img_wh=(W, H),
                  compute_dtype="bfloat16")
net = BPNet(cfg, key=jax.random.key(0))
_ = net.train_bpnet(xyz, feats, [paths], paths[0], intr4, device_out=True)
t0 = time.time()
lb, pr, l2, ft, _ = net.train_bpnet(xyz, feats, [paths], paths[0], intr4,
                                    device_out=True)
jax.block_until_ready(ft)
print(f"[bf16 device_out] warm {time.time()-t0:.2f}s "
      f"(probs/feat stay on device)", flush=True)
