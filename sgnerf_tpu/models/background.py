"""Plane background model (`--bgmodel *plane`).

The reference's DTU generalizable-inference configs
(dev_scripts/dtu_test_inf/*.sh) render the DTU table background by
intersecting each miss ray with a hardcoded ground plane and sampling the
plane point's color from the MVS source views:

  * ray-plane intersection: /root/reference/models/mvs/mvs_utils.py:379-407
    (`gen_bg_points` / `get_rayplane_cross`)
  * per-view color harvest + foreground suppression + plane-color fit
    filter + max-over-views: /root/reference/models/mvs_points_volumetric_model.py:305-343
    (`set_bg`)
  * blending: /root/reference/models/neural_points_volumetric_model.py:175-177
    (`coarse_raycolor = bgT * bg_ray (+ fg)`; the plane configs run
    bg_color=black so the in-march background contributes nothing)

TPU-first deltas: everything is dense masked jnp (static shapes — the
reference compacts by boolean mask); the foreground mask is a scattered
(H, W) boolean image built with one `at[].set` instead of per-point Python;
and blending happens OUTSIDE the jitted render as
`color + bgT * (bg_ray - bg_const)`, which equals the reference exactly for
its shipped black-background configs and stays self-consistent for any
other bg_color (the reference itself composes hit rays as bg_const + bg_ray
but miss rays as bg_ray only).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .mvs import homo_warp_nongrid, grid_sample_norm


def rayplane_cross(campos, raydir, plane_pnt, plane_normal, epsilon=1e-3):
    """World-space ray/plane intersections (reference mvs_utils.py:386-407).

    campos (3,), raydir (R,3), plane_pnt (3,), plane_normal (3,).
    Returns (R,3) intersection points, zeros where the ray is (near-)
    parallel or points away (`dot < epsilon` — the reference keeps the
    same one-sided test, so planes are only hit from their normal side).
    """
    campos = jnp.asarray(campos, jnp.float32).reshape(3)
    raydir = jnp.asarray(raydir, jnp.float32)
    p_co = jnp.asarray(plane_pnt, jnp.float32).reshape(3)
    p_no = jnp.asarray(plane_normal, jnp.float32).reshape(3)
    dot = jnp.sum(p_no * raydir, axis=-1)                       # (R,)
    ok = dot >= epsilon
    fac = -jnp.sum(p_no * (campos - p_co)) / jnp.where(ok, dot, 1.0)
    cross = campos + raydir * fac[..., None]
    return jnp.where(ok[..., None], cross, 0.0)


def _pixel_coords(xyz, w2c, intrinsic, HD, WD):
    """Raw pixel xy of world points in a source view + in-frame mask —
    the same projection as homo_warp_nongrid (reference :299-314) but
    WITHOUT the [-1,1] grid round-trip: the reference takes
    `ceil(src_grid)` on raw pixel coords (:311), and re-deriving pixels
    from the normalized grid perturbs exact-integer coordinates
    (19.0 -> 19.0000003 -> ceil 20)."""
    xyz = jnp.asarray(xyz, jnp.float32)
    ones = jnp.ones_like(xyz[:, :1])
    src = (jnp.concatenate([xyz, ones], -1)
           @ jnp.asarray(w2c, jnp.float32).T)[:, :3]
    pix = (src / src[:, 2:3]) @ jnp.asarray(intrinsic, jnp.float32).T
    gxy = pix[:, :2]
    mask = jnp.all((gxy >= 0) & (gxy <= jnp.asarray([WD - 1.0, HD - 1.0])),
                   axis=-1)
    return gxy, mask


def foreground_mask_image(xyz, w2c, intrinsic, HD, WD):
    """(HD, WD) bool image marking pixels covered by the neural point cloud
    in a source view (reference homo_warp_fg_mask + id2mask,
    mvs_utils.py:317-330): points project to `ceil(pixel)` coords; any
    landing inside the frame marks that pixel foreground."""
    gxy, mask = _pixel_coords(xyz, w2c, intrinsic, HD, WD)
    px = jnp.ceil(gxy[:, 0]).astype(jnp.int32)
    py = jnp.ceil(gxy[:, 1]).astype(jnp.int32)
    px = jnp.where(mask, jnp.clip(px, 0, WD - 1), WD)  # OOB -> dropped
    py = jnp.where(mask, jnp.clip(py, 0, HD - 1), HD)
    img = jnp.zeros((HD + 1, WD + 1), bool)
    img = img.at[py, px].set(True, mode="drop")
    return img[:HD, :WD]


def plane_bg_colors(xyz_world, images, w2cs, intrinsics, plane_color,
                    fg_xyz=None, thresh=0.03):
    """Per-ray plane background colors (reference set_bg,
    mvs_points_volumetric_model.py:305-343).

    xyz_world (R,3) ray/plane intersections (zeros = no intersection),
    images (V,H,W,3) in [0,1], w2cs (V,4,4), intrinsics (V,3,3),
    plane_color (3,). fg_xyz (N,3): neural points whose projected pixels
    are suppressed (a view's own foreground must not bleed into the
    background). Returns (R,3): per view, bilinear color samples at the
    projected plane points, kept only where inside frame, not on
    foreground, and within +-thresh of the plane color; then max over
    views (the reference zeroes non-fitting samples and takes the max).
    """
    xyz_world = jnp.asarray(xyz_world, jnp.float32)
    plane_color = jnp.asarray(plane_color, jnp.float32)
    hit = jnp.any(xyz_world != 0.0, axis=-1)                    # (R,)
    eye = jnp.eye(4, dtype=jnp.float32)
    per_view = []
    for v in range(len(images)):
        img = jnp.asarray(images[v], jnp.float32)
        H, W = img.shape[:2]
        w2c = jnp.asarray(w2cs[v], jnp.float32)
        intr = jnp.asarray(intrinsics[v], jnp.float32)
        grid, mask = homo_warp_nongrid(eye, w2c, intr, xyz_world, H, W)
        if fg_xyz is not None:
            fg = foreground_mask_image(fg_xyz, w2c, intr, H, W)
            gxy, _ = _pixel_coords(xyz_world, w2c, intr, H, W)
            px = jnp.clip(jnp.ceil(gxy[:, 0]).astype(jnp.int32), 0, W - 1)
            py = jnp.clip(jnp.ceil(gxy[:, 1]).astype(jnp.int32), 0, H - 1)
            mask = mask & ~fg[py, px]
        col = grid_sample_norm(img, grid)                       # (R,3)
        fit = jnp.all((col >= plane_color - thresh)
                      & (col <= plane_color + thresh), axis=-1)
        keep = (mask & fit & hit)[..., None]
        per_view.append(jnp.where(keep, col, 0.0))
    return jnp.max(jnp.stack(per_view, axis=0), axis=0)         # (R,3)


def plane_bg_ray(item: Dict, init_views: Dict, cloud_xyz=None,
                 thresh: float = 0.03) -> Optional[np.ndarray]:
    """Build the per-ray background image for one frame/batch.

    item: campos (3,), raydir (R,3), plane_pnt/plane_normal/plane_color
    (the dtu_ft dataset emits them). init_views: {"images" (V,H,W,3),
    "w2cs" (V,4,4), "intrinsics" (V,3,3)} (dataset.get_init_item).
    Returns (R,3) float32, or None when the item carries no plane."""
    if item.get("plane_pnt") is None:
        return None
    cross = rayplane_cross(item["campos"], item["raydir"],
                           item["plane_pnt"], item["plane_normal"])
    bg = plane_bg_colors(cross, init_views["images"], init_views["w2cs"],
                         init_views["intrinsics"], item["plane_color"],
                         fg_xyz=cloud_xyz, thresh=thresh)
    return np.asarray(bg, np.float32)


def create_all_bg(dataset, cloud_xyz=None, thresh: float = 0.03):
    """Precompute a full-frame plane background per dataset frame
    (reference run/train_ft.py:559-586): training batches then just index
    their sampled pixels into the frame's background image instead of
    re-warping per batch. Returns {frame_idx: (H, W, 3)} or None when the
    dataset carries no plane."""
    if not hasattr(dataset, "get_init_item"):
        return None
    init_views = dataset.get_init_item(0)
    bgs = {}
    for i in range(len(dataset)):
        item = dataset.get_item(i, full_img=True)
        if item.get("plane_pnt") is None:
            return None
        bg = plane_bg_ray(item, init_views, cloud_xyz, thresh)
        h, w = int(item["h"]), int(item["w"])
        bgs[i] = np.asarray(bg, np.float32).reshape(h, w, 3)
    return bgs
