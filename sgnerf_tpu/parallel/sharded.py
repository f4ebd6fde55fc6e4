"""Sharded training/rendering over a device mesh (pure ray DP).

Rays are embarrassingly parallel in this workload (SURVEY.md §2.6): each
shading computation touches only its own ray's neighbors. We therefore shard
the R axis of the batch over the "data" mesh axis, replicate the point
cloud/grid/params, and let GSPMD place the gradient all-reduce (psum over ICI)
at the loss reduction. This replaces the reference's nn.DataParallel
scatter/gather (neural_points_volumetric_model.py:238-245).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh

from .mesh import ray_sharding, replicated
from ..models.renderer import render_rays
from ..models.train import train_step


_RAY_KEYS = ("raydir", "gt_image", "pixel_label", "pixel_idx")


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place per-ray tensors sharded over the mesh, the rest replicated."""
    rs = ray_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif k in _RAY_KEYS:
            out[k] = jax.device_put(v, rs)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def sharded_train_step(state, grid, cfg, tcfg, batch, key, mesh: Mesh,
                       pspec=None):
    """One training step with the batch rays sharded over `mesh`.

    The jitted `train_step` is reused unchanged: input shardings steer GSPMD,
    which partitions the forward/backward along rays and all-reduces the
    (replicated-param) gradients over ICI. `pspec` (static) routes the
    forward through the perspective-space querier (--wcoord_query 0): its
    per-frame frustum grid build is replicated compute; the query and
    everything downstream shard by rays like the world path.
    """
    batch = shard_batch(batch, mesh)
    state = replicate_tree(state, mesh)
    grid = replicate_tree(grid, mesh)
    return train_step(state, grid, cfg, tcfg, batch, key, pspec=pspec)


def sharded_render(params, cloud, grid, cfg, mesh: Mesh, **inputs):
    for k in ("raydir", "pixel_label"):
        if inputs.get(k) is not None:
            inputs[k] = jax.device_put(inputs[k], ray_sharding(mesh))
    return render_rays(params, cloud, grid, cfg, **inputs)
