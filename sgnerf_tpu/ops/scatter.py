"""Voxel-downsampling / segment ops (torch_scatter replacement).

Reference semantics: `construct_vox_points[_xyz/_ind/_closest]`
(/root/reference/models/mvs/mvs_utils.py:483-562): cube-bounded voxelization
at `vox_res` voxels along the largest scene edge (x1.05), centroid per
occupied voxel, and "closest-to-centroid" representative selection.

These run host-side at point-cloud-initialization time, so they use plain
numpy (sorting + np.add.reduceat); the jnp segment variants are provided for
in-jit use.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _vox_space(xyz: np.ndarray, vox_res: int,
               space_min=None, space_max=None):
    if space_min is None:
        mn, mx = xyz.min(0), xyz.max(0)
        edge = (mx - mn).max() * 1.05
        mid = (mx + mn) / 2
        space_min = mid - edge / 2
    else:
        edge = np.asarray(space_max) - np.asarray(space_min)
    return np.asarray(space_min, np.float64), edge / vox_res


def _unique_voxels(xyz: np.ndarray, vox_res: int, space_min=None,
                   space_max=None):
    smin, vsz = _vox_space(xyz, vox_res, space_min, space_max)
    coords = np.floor((xyz - smin) / vsz).astype(np.int64)
    grid, inv = np.unique(coords, axis=0, return_inverse=True)
    return grid, inv.reshape(-1), smin, vsz


def construct_vox_points_xyz(xyz, vox_res: int, space_min=None,
                             space_max=None) -> np.ndarray:
    """Voxel centroids (reference :504-518)."""
    xyz = np.asarray(xyz, np.float64)
    _, inv, _, _ = _unique_voxels(xyz, vox_res, space_min, space_max)
    order = np.argsort(inv, kind="stable")
    sinv = inv[order]
    starts = np.flatnonzero(np.r_[True, sinv[1:] != sinv[:-1]])
    sums = np.add.reduceat(xyz[order], starts, axis=0)
    counts = np.diff(np.r_[starts, len(sinv)])
    return (sums / counts[:, None]).astype(np.float32)


# jnp-friendly alias used by dataset depth unprojection
def voxel_downsample_xyz(xyz, vox_res: int):
    return jnp.asarray(construct_vox_points_xyz(np.asarray(xyz), vox_res))


def construct_vox_points_closest(xyz, vox_res: int, space_min=None,
                                 space_max=None
                                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(centroids, sparse_grid_idx, min_idx): min_idx[i] is the index of the
    input point closest to centroid i (reference :538-562) — the reference's
    voxel-downsampling used at init (run/train_ft.py:701-727)."""
    xyz = np.asarray(xyz, np.float64)
    grid, inv, _, _ = _unique_voxels(xyz, vox_res, space_min, space_max)
    order = np.argsort(inv, kind="stable")
    sinv = inv[order]
    starts = np.flatnonzero(np.r_[True, sinv[1:] != sinv[:-1]])
    sums = np.add.reduceat(xyz[order], starts, axis=0)
    counts = np.diff(np.r_[starts, len(sinv)])
    centroids = sums / counts[:, None]
    resid = np.linalg.norm(xyz - centroids[inv], axis=-1)
    # per-voxel argmin: sort by (voxel, residual); first row of each segment
    order2 = np.lexsort((resid, inv))
    sinv2 = inv[order2]
    starts2 = np.flatnonzero(np.r_[True, sinv2[1:] != sinv2[:-1]])
    min_idx = order2[starts2]
    return centroids.astype(np.float32), grid, min_idx


def segment_mean(values: jnp.ndarray, seg_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    s = jax.ops.segment_sum(values, seg_ids, num_segments)
    c = jax.ops.segment_sum(jnp.ones_like(seg_ids, values.dtype), seg_ids,
                            num_segments)
    return s / jnp.maximum(c, 1.0)[..., None] if values.ndim > 1 else \
        s / jnp.maximum(c, 1.0)


def segment_min(values: jnp.ndarray, seg_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_min(values, seg_ids, num_segments)
