"""Sharded training/rendering over a device mesh (pure ray DP).

Rays are embarrassingly parallel in this workload (SURVEY.md §2.6): each
shading computation touches only its own ray's neighbors. We therefore shard
the R axis of the batch over the "data" mesh axis, replicate the point
cloud/grid/params, and run the render inside `shard_map` — each device
executes the complete single-chip program on its ray block, so the forward
has ZERO cross-device collectives by construction and the backward's only
collectives are the psums shard_map's transpose inserts for the replicated
params/point-attribute gradients (tests/test_scaling_proof.py pins both).
This replaces the reference's nn.DataParallel scatter/gather
(neural_points_volumetric_model.py:238-245).

Why shard_map and not GSPMD sharding propagation: the production query and
aggregation kernels are Pallas, and XLA cannot partition Mosaic custom
calls — a GSPMD-sharded render with the fused kernels fails to compile on
real multi-chip TPU ("Mosaic kernels cannot be automatically partitioned.
Please wrap the call in a shard_map.", dev_scripts/probe_raydp_aot.py).
Inside shard_map the kernels run per-device and need no partitioner.
Per-ray randomness (sample jitter, semantic-guidance acceptance) is drawn
OUTSIDE the mapped region at global shape (models/renderer.py
draw_render_noise) and sharded like the rays, so sharded and unsharded
runs are bit-identical.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .mesh import ray_sharding, replicated
from ..models.renderer import render_rays, render_rays_perspective


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


def _noise_spec(noise: Optional[Dict[str, Any]]):
    """Noise leaves are (B,R,...) per-ray draws except `kg` (a PRNG key,
    replicated)."""
    if noise is None:
        return None
    return {k: (P() if k == "kg" else P(None, "data")) for k in noise}


def render_rays_sharded(params, cloud, grid, cfg, mesh: Mesh, *,
                        campos, raydir, camrotc2w, near, far,
                        bg_color=None, pixel_label=None, noise=None,
                        key=None, pspec=None, is_train=False, prob=False):
    """`render_rays` (or the perspective path when `pspec` is given) with
    the ray axis sharded over `mesh` via shard_map.

    Per-ray outputs come back sharded P(None, "data"); scalar outputs (the
    attr_dedup / gather-VJP overflow counters) are psum'd to global counts.
    Randomness: pass `noise` already drawn at GLOBAL shape
    (draw_render_noise), or a `key` — this function then draws the noise
    itself, outside the mapped region, which is the same thing.
    """
    ray = P(None, "data")
    rep = P()

    if noise is None and key is not None:
        from ..models.renderer import draw_render_noise
        use_sem = (bool(cfg.semantic_guidance) and is_train
                   and pspec is None and pixel_label is not None)
        noise = draw_render_noise(key, cfg, raydir.shape[0],
                                  raydir.shape[1], grid=grid,
                                  guidance=use_sem,
                                  perspective=pspec is not None,
                                  is_train=is_train, dtype=raydir.dtype)

    def core(params, cloud, grid, campos, raydir, camrotc2w, near, far,
             bg_color, pixel_label, noise):
        if pspec is not None:
            return render_rays_perspective(
                params, cloud, pspec, cfg, campos=campos, raydir=raydir,
                camrotc2w=camrotc2w, near=near, far=far, bg_color=bg_color,
                noise=noise, is_train=is_train, prob=prob)
        return render_rays(
            params, cloud, grid, cfg, campos=campos, raydir=raydir,
            camrotc2w=camrotc2w, near=near, far=far, bg_color=bg_color,
            pixel_label=pixel_label, noise=noise, is_train=is_train,
            prob=prob)

    def body(params, cloud, grid, campos, raydir, camrotc2w, near, far,
             bg_color, pixel_label, noise):
        out = core(params, cloud, grid, campos, raydir, camrotc2w, near,
                   far, bg_color, pixel_label, noise)
        # scalar diagnostics (overflow counters) sum across ray shards
        return {k: (jax.lax.psum(v, "data") if v.ndim == 0 else v)
                for k, v in out.items()}

    in_specs = (rep, rep, rep, rep, ray, rep, rep, rep, rep,
                ray if pixel_label is not None else rep,
                _noise_spec(noise))
    # output structure (local shapes) -> per-ray P(None,"data") vs scalar
    # P(). Probed on `core`, NOT `body`: eval_shape runs outside the mesh
    # axis binding, where body's psum("data") would raise an unbound-axis
    # error (psum does not change shape/dtype, so core's shapes are body's).
    shapes = jax.eval_shape(
        lambda *a: core(*a),
        params, cloud, grid, campos,
        jax.ShapeDtypeStruct((raydir.shape[0],
                              raydir.shape[1] // mesh.size, 3),
                             raydir.dtype),
        camrotc2w, jnp.asarray(near), jnp.asarray(far),
        bg_color,
        (None if pixel_label is None else jax.ShapeDtypeStruct(
            (pixel_label.shape[0], pixel_label.shape[1] // mesh.size),
            pixel_label.dtype)),
        (None if noise is None else jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape if x.ndim == 0
                else (x.shape[0], x.shape[1] // mesh.size) + x.shape[2:],
                x.dtype), noise)))
    out_specs = {k: (rep if v.ndim == 0 else ray) for k, v in shapes.items()}

    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # vma annotation, which the vma checker rejects inside shard_map (the
    # spatial path hit the same constraint, parallel/spatial.py). The
    # CLAUDE.md psum-transpose hazard does not apply: the only in-body
    # psums are the integer overflow counters, which carry no gradient.
    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(
        params, cloud, grid, campos, raydir, camrotc2w,
        jnp.asarray(near), jnp.asarray(far), bg_color, pixel_label, noise)


def sharded_train_step(state, grid, cfg, tcfg, batch, key, mesh: Mesh,
                       pspec=None):
    """One training step with the batch rays sharded over `mesh`.

    The render forward (incl. the Pallas kernels) runs inside shard_map on
    each device's ray block; the loss math and both optimizers run on the
    replicated state under GSPMD, whose only collectives are the small loss
    reductions and the gradient psums (models/train.py `ray_mesh`)."""
    from ..models.train import train_step
    batch = shard_batch(batch, mesh)
    state = replicate_tree(state, mesh)
    grid = replicate_tree(grid, mesh)
    return train_step(state, grid, cfg, tcfg, batch, key, pspec=pspec,
                      ray_mesh=mesh)


def sharded_render(params, cloud, grid, cfg, mesh: Mesh, **inputs):
    for k in ("raydir", "pixel_label"):
        if inputs.get(k) is not None:
            inputs[k] = jax.device_put(inputs[k], ray_sharding(mesh))
    return render_rays_sharded(params, cloud, grid, cfg, mesh, **inputs)
