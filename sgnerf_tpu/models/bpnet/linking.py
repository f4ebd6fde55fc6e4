"""Bidirectional projection module (BPM / `Linking`).

Reference: /root/reference/models/bpneter/bpm.py:21-98 — at each pyramid
level:
  * 3D->2D: a sparse conv maps 3D features to 2D width, scattered into the
    image planes at each voxel's linked pixel; fused with the 2D map by a
    Conv2d+BN+ReLU on the concatenation;
  * 2D->3D: per-view gathers of 2D features at the linked pixels concatenated
    (V*C2d), pushed through two sparse convs (view_fusion), concatenated with
    the 3D features and fused by a sparse conv (fuseTo3d).

Links: (M, 4, V) int arrays per voxel row = [batch, row(y), col(x), valid]
(bpnet.py LinkCreator). Coordinate ancestry across strides is handled by the
caller passing links already mapped to the current level's rows.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse import SparseGrid, sparse_conv, sparse_batch_norm
from ..mvs import conv2d, batch_norm
from .unet3d import _he_conv, _bn


def _conv2(key, ci, co):
    fan = 9 * ci
    return jax.random.normal(key, (3, 3, ci, co)) * np.sqrt(2.0 / fan)


def init_linking_params(key, fea2d_dim: int, fea3d_dim: int, view_num: int):
    ks = iter(jax.random.split(key, 8))
    return {
        "view_fusion": {
            "conv1": _he_conv(next(ks), 27, fea2d_dim * view_num, fea2d_dim),
            "bn1": _bn(fea2d_dim),
            "conv2": _he_conv(next(ks), 27, fea2d_dim, fea3d_dim),
            "bn2": _bn(fea3d_dim)},
        "fuseTo3d": {
            "conv": _he_conv(next(ks), 27, fea3d_dim * 2, fea3d_dim),
            "bn": _bn(fea3d_dim)},
        "view_sep": {
            "conv": _he_conv(next(ks), 27, fea3d_dim, fea2d_dim),
            "bn": _bn(fea2d_dim)},
        "fuseTo2d": {
            "conv": _conv2(next(ks), fea2d_dim * 2, fea2d_dim),
            "bn": _bn(fea2d_dim)},
        "fea2d_dim": fea2d_dim,
    }


def apply_linking(p, feat_2d_all: jnp.ndarray, grid3d: SparseGrid,
                  links: jnp.ndarray, view_num: int
                  ) -> Tuple[SparseGrid, jnp.ndarray]:
    """feat_2d_all: (V*B, H, W, C2d) [B=1]; grid3d: current-level sparse grid;
    links: (M, 4, V) already scaled to this level's H,W and mapped to rows.

    Returns (fused 3D grid, fused 2D maps (V*B,H,W,C2d))."""
    relu = jax.nn.relu
    VB, H, W, C2 = feat_2d_all.shape
    M = grid3d.M

    # 3D -> per-view 2D scatter
    f3_for_2d = sparse_conv(grid3d, p["view_sep"]["conv"], kernel_size=3)
    f3_for_2d = sparse_batch_norm(f3_for_2d, grid3d.mask, p["view_sep"]["bn"],
                                  act=relu)

    feat_3d_to_2d = jnp.zeros_like(feat_2d_all)
    gathers = []
    for v in range(view_num):
        y = links[:, 1, v]
        x = links[:, 2, v]
        valid = (links[:, 3, v] > 0) & grid3d.mask
        yc = jnp.clip(y, 0, H - 1)
        xc = jnp.clip(x, 0, W - 1)
        # 2D -> 3D gather
        g = feat_2d_all[v, yc, xc, :] * valid[:, None]
        gathers.append(g)
        # 3D -> 2D scatter (last-writer wins, like the reference's indexed put)
        upd = jnp.where(valid[:, None], f3_for_2d, 0.0)
        feat_3d_to_2d = feat_3d_to_2d.at[v, yc, xc, :].set(
            upd, mode="drop", unique_indices=False)

    fused_2d = conv2d(jnp.concatenate([feat_2d_all, feat_3d_to_2d], axis=-1),
                      p["fuseTo2d"]["conv"])
    fused_2d = batch_norm(fused_2d, p["fuseTo2d"]["bn"], slope=0.0)

    # 2D -> 3D fusion
    f2_to_3d = jnp.concatenate(gathers, axis=-1)      # (M, V*C2)
    g = dataclasses.replace(grid3d, feats=f2_to_3d)
    f = sparse_conv(g, p["view_fusion"]["conv1"], kernel_size=3)
    f = sparse_batch_norm(f, g.mask, p["view_fusion"]["bn1"], act=relu)
    g = dataclasses.replace(g, feats=f)
    f = sparse_conv(g, p["view_fusion"]["conv2"], kernel_size=3)
    f = sparse_batch_norm(f, g.mask, p["view_fusion"]["bn2"], act=relu)

    cat = jnp.concatenate([grid3d.feats, f], axis=-1)
    g = dataclasses.replace(grid3d, feats=cat)
    f = sparse_conv(g, p["fuseTo3d"]["conv"], kernel_size=3)
    f = sparse_batch_norm(f, g.mask, p["fuseTo3d"]["bn"], act=relu)
    return dataclasses.replace(grid3d, feats=f), fused_2d
