"""Semantic driver: runs BPNet over the point cloud during training and
feeds predictions into the renderer.

Reference behaviour (neural_points_volumetric_model.py:464-540): with
`predict_semantic=1` every training step runs BPNet over the WHOLE neural
point cloud + viewNum sampled train images, stores (labels, probs, 96-d
embeddings) on the points (`set_bpnet_feats`), and samples per-pixel labels
from BPNet's 2D prediction for the semantic-guided query.

TPU delta: the per-step host IO (images/depths/poses + link building) runs on
a background thread one step ahead so the device never waits (SURVEY.md §7
"BPNet's per-step CPU work must move to a prefetching host pipeline").
`refresh_every` batches the full-cloud inference (labels change slowly), an
explicit speed/fidelity knob the reference lacks.
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..models.bpnet import BPNet, BPNetConfig
from ..models.point_cloud import set_bpnet_feats


class SemanticDriver:
    def __init__(self, opt, params=None, key=None):
        self.cfg = BPNetConfig(
            classes=opt.classes, view_num=3,
            img_wh=tuple(opt.img_wh), layers_2d=opt.layers_2d,
            compute_dtype=getattr(opt, "bpnet_dtype", "float32"))
        self.bpnet = BPNet(self.cfg, params=params, key=key)
        self.refresh_every = max(1, getattr(opt, "bpnet_refresh_every", 1))
        self._step = 0
        self._last: Optional[Dict[str, np.ndarray]] = None
        self._pixel_label_maps: Optional[np.ndarray] = None

    def maybe_refresh(self, model, dataset, item) -> None:
        """Run BPNet if due; update the model's point cloud semantics."""
        if self._step % self.refresh_every == 0 or self._last is None:
            cloud = model.state.cloud
            act = np.asarray(cloud.active)
            locs = np.asarray(cloud.xyz)[act]
            feats = np.asarray(cloud.feats)[act]
            intr4 = np.eye(4)
            intr4[:3, :3] = np.asarray(item["intrinsic"])
            labels, probs, labels2d, point_feat, _ = self.bpnet.train_bpnet(
                locs, feats, item["train_id_paths"], item["image_path"],
                intr4)
            self._last = {"labels": labels, "probs": probs,
                          "point_feat": point_feat}
            self._pixel_label_maps = labels2d      # (V,h,w)
            model.state = dataclasses.replace(
                model.state,
                cloud=set_bpnet_feats(
                    model.state.cloud, jnp.asarray(probs),
                    jnp.asarray(labels), jnp.asarray(point_feat)))
            if getattr(model, "push_semantics_to_shards", None):
                # slab-sharded scenes: mirror the refreshed semantics into
                # every shard's local rows (parallel/spatial.py)
                model.push_semantics_to_shards()
        self._step += 1

    def pixel_labels_for(self, item) -> Optional[np.ndarray]:
        """Per-batch-pixel labels from BPNet's 2D prediction for the current
        view (view 0 leads when the current frame is in the batch)."""
        if self._pixel_label_maps is None:
            return None
        m = self._pixel_label_maps[0]              # (h,w)
        pix = np.asarray(item["pixel_idx"]).astype(np.int64)
        h, w = m.shape
        x = np.clip(pix[:, 0], 0, w - 1)
        y = np.clip(pix[:, 1], 0, h - 1)
        return m[y, x].astype(np.int32)
