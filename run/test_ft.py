"""Test-split evaluation: full renders + PSNR/SSIM/RMSE report.

Reference: /root/reference/run/test_ft.py (chunked full-frame renders,
per-image PSNR prints, report_metrics -> scores.txt, optional video).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.runtime.jax_setup import setup as _jax_setup  # noqa: E402
_jax_setup()

from sgnerf_tpu.options import TestOptions  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.runtime import SceneModel  # noqa: E402
from sgnerf_tpu.utils.visualizer import Visualizer  # noqa: E402
from sgnerf_tpu.utils.metrics import psnr  # noqa: E402
from evaluate import report_metrics  # noqa: E402


def main():
    opt = TestOptions().parse()
    # --test_train evaluates on the training split (reference test_ft flag)
    opt.split = "train" if opt.test_train else "test"
    opt.random_sample = "no_crop"
    visualizer = Visualizer(opt)
    dataset = create_dataset(opt)

    model = SceneModel(opt)
    ckpt = model.resolve_resume()
    assert ckpt is not None, "no checkpoint found to evaluate"
    model.load_checkpoint(ckpt)

    total_steps = int(model.state.step)
    subdir = f"test_{total_steps}"
    out_dir = os.path.join(visualizer.image_dir, subdir)
    ids = list(range(len(dataset)))[::max(opt.test_num_step, 1)]

    # --bgmodel *plane: per-ray plane backgrounds sampled from the MVS
    # source views (reference test_ft.py:340-344 create_all_bg; the bg is
    # built per frame here — same math, no precomputed list needed)
    plane_bg = str(getattr(opt, "bgmodel", "no")).endswith("plane")
    init_views = None
    cloud_xyz = None
    if plane_bg and hasattr(dataset, "get_init_item"):
        init_views = dataset.get_init_item(0)
        active = np.asarray(model.state.cloud.active)
        cloud_xyz = np.asarray(model.state.cloud.xyz)[active]

    psnrs = []
    for i in ids:
        item = dataset.get_item(i, full_img=True)
        bg_image = None
        if plane_bg and init_views is not None \
                and item.get("plane_pnt") is not None:
            from sgnerf_tpu.models.background import plane_bg_ray
            bg_image = plane_bg_ray(item, init_views, cloud_xyz)
        t0 = time.time()
        col = model.render_image(item, bg_image=bg_image)
        pix = item["pixel_idx"]
        W = int(pix[:, 0].max() - pix[:, 0].min() + 1)
        Hh = len(col) // W
        img = col[:Hh * W].reshape(Hh, W, 3)
        gt = item["gt_image"][:Hh * W].reshape(Hh, W, 3)
        p = psnr(img, gt)
        psnrs.append(p)
        print(f"num.{i} psnr: {p:.4f}  time used: {time.time()-t0:.3f} s",
              flush=True)
        visualizer.display_current_results(
            {"coarse_raycolor": img, "gt_image": gt}, i, subdir=subdir)

    print(f"mean psnr: {np.mean(psnrs):.4f} over {len(psnrs)} images")
    # full reference metric set (run/evaluate.py:34-97): lpips/vgglpips
    # report nan unless weights are provisioned (README 'LPIPS weights')
    report_metrics(out_dir, out_dir, out_dir)
    if opt.vid > 0:
        visualizer.gen_video(out_dir, r"step-\d+-coarse_raycolor\.png",
                             os.path.join(out_dir, "video.mp4"))


if __name__ == "__main__":
    main()
