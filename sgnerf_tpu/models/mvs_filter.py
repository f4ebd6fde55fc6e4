"""Cross-view geometric-consistency filtering of MVS depth maps.

Reference: /root/reference/models/mvs/filter_utils.py:140-295
(reproject_with_depth / check_geometric_consistency / filter_by_masks_gpu):
a depth pixel survives if, reprojected into >= geo_cnsst_num source views and
back, it lands within 1 px and 1% relative depth of itself; surviving depths
are averaged over agreeing views; a confidence threshold and range mask apply.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mvs import bilinear_interpolate


def reproject_with_depth(depth_ref, intr_ref, extr_ref, depth_src, intr_src,
                         extr_src):
    """All depths (H,W); intrinsics (3,3); extrinsics (4,4) world->cam.
    Returns (depth_reprojected, x2d, y2d, oor_mask) in the ref view."""
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # ref pixel -> ref cam -> world
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)       # (H,W,3)
    cam_ref = (pix @ jnp.linalg.inv(intr_ref).T) * depth_ref[..., None]
    ones = jnp.ones_like(cam_ref[..., :1])
    world = (jnp.concatenate([cam_ref, ones], -1)
             @ jnp.linalg.inv(extr_ref).T)[..., :3]
    # world -> src cam -> src pixel
    cam_src = (jnp.concatenate([world, ones], -1) @ extr_src.T)[..., :3]
    z_src = jnp.maximum(cam_src[..., 2], 1e-6)
    pix_src = (cam_src / z_src[..., None]) @ intr_src.T
    xs, ys = pix_src[..., 0], pix_src[..., 1]
    oor = (xs < 0) | (xs > W - 1) | (ys < 0) | (ys > H - 1)
    # sample src depth, lift to world, project back to ref
    d_src = bilinear_interpolate(depth_src[..., None], xs, ys)[..., 0]
    cam_src2 = (jnp.stack([xs, ys, jnp.ones_like(xs)], -1)
                @ jnp.linalg.inv(intr_src).T) * d_src[..., None]
    world2 = (jnp.concatenate([cam_src2, ones], -1)
              @ jnp.linalg.inv(extr_src).T)[..., :3]
    cam_ref2 = (jnp.concatenate([world2, ones], -1) @ extr_ref.T)[..., :3]
    depth_re = cam_ref2[..., 2]
    z2 = jnp.maximum(depth_re, 1e-6)
    pix_re = (cam_ref2 / z2[..., None]) @ intr_ref.T
    return depth_re, pix_re[..., 0], pix_re[..., 1], oor


def check_geometric_consistency(depth_ref, intr_ref, extr_ref, depth_src,
                                intr_src, extr_src):
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    depth_re, x2, y2, oor = reproject_with_depth(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src)
    dist = jnp.sqrt((x2 - x) ** 2 + (y2 - y) ** 2)
    rel = jnp.abs(depth_re - depth_ref) / jnp.maximum(depth_ref, 1e-6)
    mask = (dist < 1) & (rel < 0.01)
    return mask, ~oor, jnp.where(mask, depth_re, 0.0)


def filter_depths(depths: Sequence[jnp.ndarray],
                  intrinsics: Sequence[jnp.ndarray],
                  extrinsics: Sequence[jnp.ndarray],
                  confidences: Sequence[jnp.ndarray],
                  depth_conf_thresh: float = 0.8,
                  geo_cnsst_num: int = 2
                  ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Returns per-view (world_xyz (M,3), confidence (M,)) of surviving
    pixels."""
    V = len(depths)
    out = []
    for ref in range(V):
        H, W = depths[ref].shape
        geo_sum = jnp.zeros((H, W), jnp.int32)
        depth_sum = jnp.zeros((H, W))
        for src in range(V):
            if src == ref:
                continue
            m, _, d = check_geometric_consistency(
                depths[ref], intrinsics[ref], extrinsics[ref],
                depths[src], intrinsics[src], extrinsics[src])
            geo_sum = geo_sum + m.astype(jnp.int32)
            depth_sum = depth_sum + d
        depth_avg = (depth_sum + depths[ref]) / (geo_sum + 1)
        final = (confidences[ref] > depth_conf_thresh)
        if V > 1:
            final = final & (geo_sum >= geo_cnsst_num)
        y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                            jnp.arange(W, dtype=jnp.float32), indexing="ij")
        pix = jnp.stack([x, y, jnp.ones_like(x)], -1)
        cam = (pix @ jnp.linalg.inv(intrinsics[ref]).T) * depth_avg[..., None]
        ones = jnp.ones_like(cam[..., :1])
        world = (jnp.concatenate([cam, ones], -1)
                 @ jnp.linalg.inv(extrinsics[ref]).T)[..., :3]
        fm = np.asarray(final)
        out.append((np.asarray(world)[fm], np.asarray(confidences[ref])[fm]))
    return out


def alpha_masking(xyz, alphas, intrinsics, w2cs, near_far,
                  alpha_range: int = 0, inall_img: int = 1):
    """Visual-hull mask over MVS-bootstrap points (reference
    mvs_utils.py:572-607 `alpha_masking`, called from
    run/train_ft.py:132-137 when the dataset exposes per-view alpha
    masks): a point survives only if EVERY view's alpha image is >0.1 at
    its floor-pixel projection (out-of-frame pixels count as pass unless
    alpha_range>0 / inall_img==0 adds the in-frame range mask), ANDed
    with a per-view near/far depth window when near_far is given.
    The reference's c2ws argument is dead (never read) and dropped here.

    xyz (N,3); alphas: sequence of (1,H,W) or (H,W) arrays; intrinsics:
    (3,3) or (4,4) per view; w2cs: (4,4) per view. Returns (N,) bool.
    """
    xyz = np.asarray(xyz, np.float32)
    w1 = np.concatenate([xyz[:, :3], np.ones_like(xyz[:, :1])], axis=-1)
    vishull = None
    for i in range(len(alphas)):
        alpha = np.asarray(alphas[i], np.float32)
        alpha = alpha[0] if alpha.ndim == 3 else alpha
        H, W = alpha.shape
        intr = np.asarray(intrinsics[i], np.float32)[:3, :3]
        w2c = np.asarray(w2cs[i], np.float32)
        cam = w1 @ w2c.T
        nf_mask = None
        if near_far is not None:
            nf_mask = (cam[:, 2] >= near_far[0] - 1.0) \
                & (cam[:, 2] <= near_far[1])
        pix = cam[:, :3] @ intr.T
        img_xy = np.floor(pix[:, :2] / pix[:, 2:3]).astype(np.int64)
        range_mask = None
        if alpha_range > 0 or inall_img == 0:
            range_mask = np.all(
                (img_xy >= 0) & (img_xy < np.asarray([[W, H]])), axis=-1)
        x = np.clip(img_xy[:, 0], 0, W - 1)
        y = np.clip(img_xy[:, 1], 0, H - 1)
        mask = alpha[y, x]
        if range_mask is not None:
            # reference :597: out-of-frame pixels pass the alpha test
            mask = mask + (~range_mask).astype(np.float32)
        mask = mask > 0.1
        m = (mask & nf_mask) if nf_mask is not None else mask
        vishull = m if vishull is None else (vishull & m)
    return vishull
