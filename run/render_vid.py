"""Render a camera-path video from a trained checkpoint.

Reference: /root/reference/run/render_vid.py:26-79 (renders along
dataset.render_poses / the test split, writes a video via the visualizer).
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

    subdir = "vid"
    out_dir = os.path.join(visualizer.image_dir, subdir)
    for i in range(len(dataset)):
        item = dataset.get_item(i, full_img=True)
        t0 = time.time()
        col = model.render_image(item)
        pix = item["pixel_idx"]
        W = int(pix[:, 0].max() - pix[:, 0].min() + 1)
        H = len(col) // W
        img = col[:H * W].reshape(H, W, 3)
        print(f"frame {i}: render time: {time.time()-t0:.3f} s", flush=True)
        visualizer.display_current_results({"coarse_raycolor": img}, i,
                                           subdir=subdir)
    visualizer.gen_video(out_dir, r"step-\d+-coarse_raycolor\.png",
                         os.path.join(out_dir, "video.mp4"))


if __name__ == "__main__":
    main()
