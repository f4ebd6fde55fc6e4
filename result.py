"""IoU scoring of saved label point clouds against the GT labeled mesh.

Reference: /root/reference/result.py:66 — match each predicted point to its
nearest GT mesh vertex and compute the 20-class IoU.
"""
from __future__ import annotations

import argparse

import numpy as np

from sgnerf_tpu.utils.util import miou
from sgnerf_tpu.utils.ply import read_ply


def load_label_cloud(path):
    data = np.loadtxt(path, delimiter=";")
    return data[:, :3], data[:, 3].astype(np.int64)


def score(pred_path: str, gt_labels_ply: str, classes: int = 20):
    from scipy.spatial import cKDTree
    xyz, labels = load_label_cloud(pred_path)
    d = read_ply(gt_labels_ply)
    gt_xyz = np.stack([d["x"], d["y"], d["z"]], -1)
    gt_label = np.asarray(d["label"], np.int64)
    from sgnerf_tpu.data.prepare_scannet import label_remapper_150
    gt20 = label_remapper_150()[np.clip(gt_label, 0, 149)].astype(np.int64)
    tree = cKDTree(gt_xyz)
    _, idx = tree.query(xyz, k=1)
    m, per_class = miou(labels, gt20[idx], classes)
    print(f"mIoU: {m:.4f}")
    for c, v in enumerate(per_class):
        print(f"  class {c}: {v:.4f}")
    return m


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt_labels_ply", required=True)
    ap.add_argument("--classes", type=int, default=20)
    a = ap.parse_args()
    score(a.pred, a.gt_labels_ply, a.classes)
