"""Semantic editing + render: compose edited neural point clouds, render path.

Reference: /root/reference/run/editing.py:123-237 — for each
(neural_points_name, parts_index_name, Transformation_name) triple: load the
checkpoint, select the part's point indices (txt mask), apply the 4x4
transform to the part, compose everything into one cloud, set it as the
model's points (no optimizer), render the test split and write a video.

Per-part Rw2c: the reference expands a per-point (N,3,3) Rw2c so rotated
parts keep their view-dependent shading frame (editing.py:201-205); here
each part contributes one row of a (T,3,3) rotation table plus a per-point
rot_idx — the renderer gathers from the tiny table instead.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.runtime.jax_setup import setup as _jax_setup  # noqa: E402
_jax_setup()

from sgnerf_tpu.options import EditOptions  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.runtime import SceneModel  # noqa: E402
from sgnerf_tpu.utils.visualizer import Visualizer  # noqa: E402
from sgnerf_tpu.editor import (NeuralPointCloudEdit,  # noqa: E402
                               transform_point_cloud_global, add_point_cloud)
from sgnerf_tpu.models.point_cloud import make_point_cloud  # noqa: E402
from sgnerf_tpu.models.point_cloud import build_grid, grid_spec_for_cloud  # noqa: E402


def load_parts(opt):
    """Load and transform each named part; returns (composed cloud,
    rotation table (T,3,3), per-point rot_idx). Each rotated part's
    Rw2c row is its right-multiplied R (reference editing.py:201:
    "w2c is reversed against movement")."""
    base_dir = opt.resume_dir or os.path.join(opt.checkpoints_dir,
                                              opt.name or "default")
    composed = None
    rot_rows = [np.eye(3, dtype=np.float32)]
    rot_idx = np.zeros(0, np.int32)
    for i, name in enumerate(opt.neural_points_names or []):
        path = name if os.path.isabs(name) else os.path.join(base_dir, name)
        part = NeuralPointCloudEdit.from_checkpoint(path)
        if opt.parts_index_names and i < len(opt.parts_index_names) \
                and opt.parts_index_names[i] not in ("all", "None"):
            idx = np.loadtxt(os.path.join(
                base_dir, opt.parts_index_names[i])).astype(np.int64)
            part = part.select(idx.reshape(-1))
        row = 0
        if opt.Transformation_names and i < len(opt.Transformation_names) \
                and opt.Transformation_names[i] not in ("identity", "None"):
            T = np.loadtxt(os.path.join(
                base_dir, opt.Transformation_names[i])).reshape(4, 4)
            part = transform_point_cloud_global(part, T)
            R = np.asarray(T[:3, :3], np.float32)
            if not np.allclose(R, np.eye(3), atol=1e-7):
                rot_rows.append(R)
                row = len(rot_rows) - 1
        # add_point_cloud puts the new part FIRST (child, father)
        rot_idx = np.concatenate(
            [np.full(part.n, row, np.int32), rot_idx])
        composed = part if composed is None else add_point_cloud(part,
                                                                 composed)
    assert composed is not None, "no neural_points_names given"
    table = np.stack(rot_rows) if len(rot_rows) > 1 else rot_rows[0]
    return composed, table, rot_idx


def main():
    opt = EditOptions().parse()
    opt.split = "test"
    opt.random_sample = "no_crop"
    visualizer = Visualizer(opt)
    dataset = create_dataset(opt)

    composed, rot_table, rot_idx = load_parts(opt)
    model = SceneModel(opt)
    cloud = make_point_cloud(
        composed.xyz, composed.embedding, conf=composed.conf.reshape(-1, 1),
        dir=composed.dir, color=composed.color, label=composed.label,
        Rw2c=rot_table, rot_idx=rot_idx)
    model._finish_setup(composed.params, cloud)

    subdir = opt.render_name or "edit"
    out_dir = os.path.join(visualizer.image_dir, subdir)
    for i in range(len(dataset)):
        item = dataset.get_item(i, full_img=True)
        t0 = time.time()
        col = model.render_image(item)
        pix = item["pixel_idx"]
        W = int(pix[:, 0].max() - pix[:, 0].min() + 1)
        H = len(col) // W
        img = col[:H * W].reshape(H, W, 3)
        print(f"edit frame {i}: render time: {time.time()-t0:.3f} s",
              flush=True)
        visualizer.display_current_results({"coarse_raycolor": img}, i,
                                           subdir=subdir)
    visualizer.gen_video(out_dir, r"step-\d+-coarse_raycolor\.png",
                         os.path.join(out_dir, "video.mp4"))


if __name__ == "__main__":
    main()
