"""Camera math: world<->camera transforms and per-pixel ray directions.

Reference semantics:
  * w2pers: /root/reference/models/neural_points/neural_points.py:838-850
    (camera coords c = R_c2w^T (x - campos); perspective = [cx/cz, cy/cz, cz])
  * get_dtu_raydir: /root/reference/data/data_utils.py:55-69
"""
from __future__ import annotations

import jax.numpy as jnp


def w2pers(point_xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """World -> perspective camera coords.

    point_xyz_w: (..., 3); camrotc2w: (3, 3) camera-to-world rotation;
    campos: (3,). Returns (..., 3) = [x/z, y/z, z] in camera frame.
    """
    shift = point_xyz_w - campos
    xyz_c = shift @ camrotc2w  # == R^T shift per point
    z = xyz_c[..., 2]
    # guard the division: masked/padded inputs can sit exactly at the camera
    # (z == 0) and a NaN here would poison downstream cummax/ray_dist
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack([xyz_c[..., 0] / zs, xyz_c[..., 1] / zs, z], axis=-1)


def pers2w(point_xyz_pers: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`w2pers`."""
    z = point_xyz_pers[..., 2]
    x = point_xyz_pers[..., 0] * z
    y = point_xyz_pers[..., 1] * z
    xyz_c = jnp.stack([x, y, z], axis=-1)
    return xyz_c @ camrotc2w.T + campos


def get_dtu_raydir(pixelcoords: jnp.ndarray, intrinsic: jnp.ndarray,
                   rot: jnp.ndarray, dir_norm: bool = True) -> jnp.ndarray:
    """Per-pixel ray directions in world space.

    pixelcoords: (..., 2) as (x, y); intrinsic: (3, 3);
    rot: (3, 3) camera-to-world rotation. Returns (..., 3).
    """
    x = (pixelcoords[..., 0] + 0.5 - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (pixelcoords[..., 1] + 0.5 - intrinsic[1, 2]) / intrinsic[1, 1]
    z = jnp.ones_like(x)
    dirs = jnp.stack([x, y, z], axis=-1)
    dirs = dirs @ rot.T
    if dir_norm:
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs


def get_blender_raydir(pixelcoords: jnp.ndarray, height: float, width: float,
                       focal: float, rot: jnp.ndarray, dir_norm: bool = True) -> jnp.ndarray:
    """Blender/NeRF-synthetic per-pixel ray dirs (y/z flipped camera convention).

    Reference: /root/reference/data/data_utils.py:40-52.
    """
    x = (pixelcoords[..., 0] + 0.5 - width / 2.0) / focal
    y = (pixelcoords[..., 1] + 0.5 - height / 2.0) / focal
    z = jnp.ones_like(x)
    dirs = jnp.stack([x, -y, -z], axis=-1)
    dirs = jnp.sum(dirs[..., None, :] * rot, axis=-1)
    if dir_norm:
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs
