"""Visualize point growing: run the hole probe on a trained checkpoint and
dump the candidate points without modifying the model.

Reference: /root/reference/run/vis_grow_train.py (grow visualization).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.runtime.jax_setup import setup as _jax_setup  # noqa: E402
_jax_setup()

import jax  # noqa: E402

from sgnerf_tpu.options import TestOptions  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.runtime import SceneModel  # noqa: E402
from sgnerf_tpu.runtime.growing import render_probe_maps  # noqa: E402


def main():
    opt = TestOptions().parse()
    opt.split = "train"
    dataset = create_dataset(opt)
    model = SceneModel(opt)
    ckpt = model.resolve_resume()
    assert ckpt, "no checkpoint to probe"
    model.load_checkpoint(ckpt)

    out_dir = os.path.join(model.expr_dir, "grow_vis")
    os.makedirs(out_dir, exist_ok=True)
    n = min(len(dataset), max(1, opt.test_num))
    for i in range(n):
        item = dataset.get_item(i, full_img=True)
        maps = render_probe_maps(model, item)
        mask = (maps["ray_mask"][..., 0] > 0) & (
            maps["ray_max_shading_opacity"][..., 0] > opt.prob_thresh)
        pts = maps["ray_max_sample_loc_w"][mask]
        np.savetxt(os.path.join(out_dir, f"probe_{i}.txt"), pts,
                   delimiter=";")
        print(f"frame {i}: {len(pts)} probe points")


if __name__ == "__main__":
    main()
