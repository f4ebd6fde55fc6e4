"""Ray-direction helpers (API-parity shim over ops/camera).

Reference: /root/reference/data/data_utils.py — the numpy helpers live in
sgnerf_tpu.ops.camera as jittable jnp versions; this module keeps the
reference import surface for external code.
"""
import numpy as np
import jax.numpy as jnp

from ..ops.camera import (get_dtu_raydir as _dtu, get_blender_raydir as _bld)


def get_dtu_raydir(pixelcoords, intrinsic, rot, dir_norm=True):
    return np.asarray(_dtu(jnp.asarray(pixelcoords), jnp.asarray(intrinsic),
                           jnp.asarray(rot), dir_norm))


def get_blender_raydir(pixelcoords, height, width, focal, rot, dir_norm=True):
    return np.asarray(_bld(jnp.asarray(pixelcoords), height, width, focal,
                           jnp.asarray(rot), dir_norm))


def flip_z(poses):
    z_flip = np.eye(4, dtype=np.float32)
    z_flip[2, 2] = -1.0
    return np.matmul(poses, z_flip[None, ...])
