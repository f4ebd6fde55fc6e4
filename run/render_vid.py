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

    # frame source: blender-style render_poses when the dataset has them,
    # else a SLERP-interpolated path through the test poses (reference uses
    # dataset.render_poses / get_dummyrot_item, run/render_vid.py:26-79)
    if hasattr(dataset, "get_dummyrot_item"):
        n_frames = max(len(dataset), opt.render_stride)
        get = dataset.get_dummyrot_item
    else:
        keys = [dataset.get_item(i)["c2w"] for i in range(len(dataset))]
        from sgnerf_tpu.utils.camera_path import interpolate_poses
        n_frames = max(2 * len(keys), opt.render_stride)
        path = interpolate_poses(np.stack(keys), n_frames)

        def get(i):
            item = dataset.get_item(0, full_img=False)
            pose = path[i]
            item["campos"] = pose[:3, 3]
            item["camrotc2w"] = pose[:3, :3]
            from sgnerf_tpu.ops.camera import get_dtu_raydir
            import jax.numpy as jnp
            pix = item["pixel_idx"]
            item["raydir"] = np.asarray(get_dtu_raydir(
                jnp.asarray(pix), jnp.asarray(item["intrinsic"]),
                jnp.asarray(item["camrotc2w"]), True)).astype(np.float32)
            return item

    for i in range(n_frames):
        item = get(i)
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
