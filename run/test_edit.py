"""Test-split eval + predicted-semantic point-cloud dumps.

Reference: /root/reference/run/test_edit.py — test_ft-style evaluation that
additionally runs the semantic branch and saves predicted label point clouds
(scored by result.py's IoU vs the GT labeled mesh).
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


def save_label_cloud(path, xyz, labels):
    data = np.concatenate([xyz, labels.reshape(-1, 1)], axis=-1)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, data, delimiter=";")


def main():
    opt = TestOptions().parse()
    opt.split = "test"
    opt.random_sample = "no_crop"
    visualizer = Visualizer(opt)
    dataset = create_dataset(opt)

    model = SceneModel(opt)
    ckpt = model.resolve_resume()
    assert ckpt is not None, "no checkpoint found"
    model.load_checkpoint(ckpt)

    if opt.save_predict_label:
        cloud = model.state.cloud
        act = np.asarray(cloud.active)
        save_label_cloud(
            os.path.join(visualizer.image_dir, "pred_label_cloud.txt"),
            np.asarray(cloud.xyz)[act], np.asarray(cloud.label)[act])
        print("saved predicted label cloud")

    # --bgmodel *plane (reference run/test_edit.py:75-87): per-ray plane
    # backgrounds, same wiring as run/test_ft.py
    plane_bg = str(getattr(opt, "bgmodel", "no")).endswith("plane")
    init_views = None
    cloud_xyz = None
    if plane_bg and hasattr(dataset, "get_init_item"):
        init_views = dataset.get_init_item(0)
        act = np.asarray(model.state.cloud.active)
        cloud_xyz = np.asarray(model.state.cloud.xyz)[act]

    psnrs = []
    subdir = "test_edit"
    for i in range(len(dataset))[::max(opt.test_num_step, 1)]:
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
        H = len(col) // W
        img = col[:H * W].reshape(H, W, 3)
        gt = item["gt_image"][:H * W].reshape(H, W, 3)
        p = psnr(img, gt)
        psnrs.append(p)
        print(f"num.{i} psnr: {p:.4f}  time used: {time.time()-t0:.3f} s")
        visualizer.display_current_results(
            {"coarse_raycolor": img, "gt_image": gt}, i, subdir=subdir)
    print(f"mean psnr: {np.mean(psnrs):.4f}")


if __name__ == "__main__":
    main()
