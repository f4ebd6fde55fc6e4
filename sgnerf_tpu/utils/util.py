"""Semantic-segmentation metrics and misc helpers.

Reference: /root/reference/utils/util.py:15-61 (AverageMeter,
intersectionAndUnionGPU) used for IoU scoring of predicted labels.
"""
from __future__ import annotations

import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = np.asarray(val, dtype=np.float64)
        self.val = val
        self.sum = self.sum + val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def intersection_and_union(output: np.ndarray, target: np.ndarray, K: int,
                           ignore_index: int = 255):
    """Per-class intersection/union/target counts (reference
    intersectionAndUnionGPU semantics)."""
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1).copy()
    output[target == ignore_index] = ignore_index
    inter = output[output == target]
    area_inter = np.histogram(inter, bins=K, range=(0, K - 1))[0]
    area_out = np.histogram(output, bins=K, range=(0, K - 1))[0]
    area_tgt = np.histogram(target, bins=K, range=(0, K - 1))[0]
    return area_inter, area_out + area_tgt - area_inter, area_tgt


def miou(output, target, K: int, ignore_index: int = 255):
    i, u, t = intersection_and_union(output, target, K, ignore_index)
    valid = u > 0
    iou = np.where(valid, i / np.maximum(u, 1), np.nan)
    return float(np.nanmean(iou)), iou
