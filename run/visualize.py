"""Visualization utility: dump the neural point cloud (+labels/colors) from a
checkpoint as ;-separated txt / ply for external viewers.

Reference: /root/reference/run/visualize.py (misc point-cloud visualization).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.options import TestOptions  # noqa: E402
from sgnerf_tpu.editor import NeuralPointCloudEdit  # noqa: E402


def main():
    opt = TestOptions().parse()
    base = os.path.join(opt.checkpoints_dir, opt.name or "default")
    from sgnerf_tpu.runtime.scene_model import get_latest_epoch
    it = (get_latest_epoch(base) if opt.resume_iter == "latest"
          else opt.resume_iter)
    path = None
    for ext in (".npz", ".pth"):
        p = os.path.join(base, f"{it}_net_ray_marching{ext}")
        if os.path.exists(p):
            path = p
            break
    assert path, f"no checkpoint found under {base}"
    cloud = NeuralPointCloudEdit.from_checkpoint(path)
    out_dir = os.path.join(base, "visual")
    os.makedirs(out_dir, exist_ok=True)
    data = np.concatenate(
        [cloud.xyz, cloud.color, cloud.label.reshape(-1, 1)], axis=-1)
    np.savetxt(os.path.join(out_dir, "cloud.txt"), data, delimiter=";")
    cloud.save_as_ply(os.path.join(out_dir, "cloud_neuralpcd.ply"))
    print(f"wrote {cloud.n} points to {out_dir}")


if __name__ == "__main__":
    main()
