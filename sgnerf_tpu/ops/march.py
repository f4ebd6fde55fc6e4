"""Volume rendering math: opacity, transmission, blending, tone mapping.

Reference semantics:
  * ray_march / alpha_ray_march: /root/reference/models/rendering/diff_ray_marching.py:509-573
  * render/blend/tonemap registries: /root/reference/models/rendering/diff_render_func.py:8-67
  * ray_dist via cummax of camera-space z:
    /root/reference/models/neural_points_volumetric_model.py:569-578
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------- registries

def radiance_render(ray_feature):
    return ray_feature[..., 1:4]


def white_color(ray_feature):
    return jnp.ones_like(ray_feature[..., 1:4])


def alpha_blend(opacity, acc_transmission):
    return opacity * acc_transmission


def alpha2_blend(opacity, acc_transmission):
    return opacity * acc_transmission * acc_transmission


def simple_tone_map(color, gamma=2.2, exposure=1.0):
    return jnp.clip((color * exposure + 1e-5) ** (1.0 / gamma), 0.0, 1.0)


def no_tone_map(color):
    return color


def normalize_tone_map(color):
    color = color / (jnp.linalg.norm(color, axis=-1, keepdims=True) + 1e-12)
    return color * 0.5 + 0.5


def find_render_function(name: str):
    return {"radiance": radiance_render, "white": white_color}[name]


def find_blend_function(name: str):
    return {"alpha": alpha_blend, "alpha2": alpha2_blend}[name]


def find_tone_map(name: str):
    return {"gamma": simple_tone_map, "off": no_tone_map,
            "normalize": normalize_tone_map}[name]


# ---------------------------------------------------------------- ray march

def ray_march(ray_dist, ray_valid, ray_features, render_func, blend_func,
              bg_color=None):
    """Alpha-composite per-sample features along each ray.

    ray_dist: (B,R,S); ray_valid: (B,R,S) bool; ray_features: (B,R,S,C)
    with features[..., 0] = sigma and [..., 1:4] = raw color.

    Returns (ray_color (B,R,3), point_color, opacity, acc_transmission,
    blend_weight (B,R,S,1), background_transmission (B,R,1),
    background_blend_weight).
    """
    point_color = render_func(ray_features)
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)

    acc_transmission = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc_transmission[..., -1:]
    # exclusive cumprod: shift right, prepend ones
    acc_transmission = jnp.concatenate(
        [jnp.ones_like(acc_transmission[..., :1]), acc_transmission[..., :-1]],
        axis=-1)

    blend_weight = blend_func(opacity, acc_transmission)[..., None]
    ray_color = jnp.sum(point_color * blend_weight, axis=-2)
    if bg_color is not None:
        bg = jnp.asarray(bg_color, dtype=ray_color.dtype).reshape(-1, 1, 3)
        ray_color = ray_color + bg * background_transmission
    background_blend_weight = blend_func(1.0, background_transmission)
    return (ray_color, point_color, opacity, acc_transmission, blend_weight,
            background_transmission, background_blend_weight)


def alpha_ray_march(ray_dist, ray_valid, ray_features, blend_func):
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    acc_transmission = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc_transmission[..., -1:]
    acc_transmission = jnp.concatenate(
        [jnp.ones_like(acc_transmission[..., :1]), acc_transmission[..., :-1]],
        axis=-1)
    blend_weight = blend_func(opacity, acc_transmission)[..., None]
    background_blend_weight = blend_func(1.0, background_transmission)
    return (opacity, acc_transmission, blend_weight, background_transmission,
            background_blend_weight)


def ray_dist_from_z(sample_loc_z, ray_valid, vsize_z, raydist_mode_unit=1):
    """Per-sample marching distance from monotonicized camera-space z.

    sample_loc_z: (B,R,SR) camera-space z of shading points (0 in masked
    slots); vsize_z: scalar voxel size. Matches the reference exactly:
    cummax(z) -> adjacent diffs -> trailing vsize_z -> degenerate (tiny or
    >2*vsize) diffs replaced by vsize_z -> zeroed on invalid samples.
    """
    z = lax.cummax(sample_loc_z, axis=sample_loc_z.ndim - 1)
    dist = jnp.concatenate(
        [z[..., 1:] - z[..., :-1],
         jnp.full(z.shape[:-1] + (1,), vsize_z, dtype=z.dtype)], axis=-1)
    mask = dist < 1e-8
    if raydist_mode_unit > 0:
        mask = jnp.logical_or(mask, dist > 2 * vsize_z)
    dist = jnp.where(mask, vsize_z, dist)
    return dist * ray_valid.astype(dist.dtype)
