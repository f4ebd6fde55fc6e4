"""Ray sample generation along camera rays.

Reference semantics: /root/reference/models/rendering/diff_ray_marching.py
  * near_far_linear (:349, the ScanNet default): D+1 linearly spaced bin edges
    in [near, far], per-segment jitter of the segment *lengths*, midpoints as
    sample depths, segment_length scaled by ||raydir||.
  * near_far_disparity_linear (:201): same but bin edges linear in disparity.
  * nerf_near_far_(disparity_)linear (:252/:302): NeRF-style stratified jitter
    of the sample positions with a trailing 1e10 segment.

All functions are jittable; randomness comes from an explicit jax PRNG key
(the reference uses torch's global RNG).

Shapes:  campos (B,3), raydir (B,R,3) normalized ->
  raypos (B,R,D,3), segment_length (B,R,D), valid (B,R,D), ts (B,R,D)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _jitter_lengths(key, base_lengths, B, R, D, jitter, u=None):
    # `u` (B,R,D): pre-drawn uniforms (draw_render_noise) — the ray-DP
    # shard_map path draws per-ray randomness OUTSIDE the mapped region so
    # sharded and unsharded runs see identical bits (parallel/sharded.py)
    if jitter <= 0.0 or (key is None and u is None):
        return jnp.broadcast_to(base_lengths, (B, R, D))
    if u is None:
        u = jax.random.uniform(key, (B, R, D), dtype=base_lengths.dtype)
    return base_lengths * (1.0 + jitter * (u - 0.5))


def near_far_linear_ray_generation(campos, raydir, point_count, near=0.1, far=10.0,
                                   jitter=0.0, key: Optional[jax.Array] = None,
                                   u=None, **_):
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    tvals = jnp.linspace(0.0, 1.0, D + 1, dtype=raydir.dtype)
    tvals = near * (1.0 - tvals) + far * tvals  # (D+1,)
    seg = (tvals[1:] - tvals[:-1])[None, None, :]  # (1,1,D)
    seg = _jitter_lengths(key, seg, B, R, D, jitter, u=u)
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), seg.dtype), jnp.cumsum(seg, axis=-1)], axis=-1)
    ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])  # (B,R,D)
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    valid = jnp.ones_like(ts)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, valid, ts


def near_far_disparity_linear_ray_generation(campos, raydir, point_count, near=0.1,
                                             far=10.0, jitter=0.0,
                                             key: Optional[jax.Array] = None,
                                             u=None, **_):
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    t = jnp.linspace(0.0, 1.0, D + 1, dtype=raydir.dtype)
    tvals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    seg = (tvals[1:] - tvals[:-1])[None, None, :]
    seg = _jitter_lengths(key, seg, B, R, D, jitter, u=u)
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), seg.dtype), jnp.cumsum(seg, axis=-1)], axis=-1)
    ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    valid = jnp.ones_like(ts)
    # NOTE: the reference does not scale seg by ||raydir|| in this variant.
    return raypos, seg, valid, ts


def _nerf_stratified(key, tvals, B, R, D, jitter, u=None):
    """NeRF-style stratified resampling of sample positions."""
    if jitter <= 0.0 or (key is None and u is None):
        return jnp.broadcast_to(tvals[None, None, :], (B, R, D))
    mids = 0.5 * (tvals[1:] + tvals[:-1])
    upper = jnp.concatenate([mids, tvals[-1:]], axis=-1)
    lower = jnp.concatenate([tvals[:1], mids], axis=-1)
    if u is None:
        u = jax.random.uniform(key, (B, R, D), dtype=tvals.dtype)
    return lower[None, None, :] + (upper - lower)[None, None, :] * u


def nerf_near_far_linear_ray_generation(campos, raydir, point_count, near=0.1,
                                        far=10.0, jitter=1.0,
                                        key: Optional[jax.Array] = None,
                                        u=None, **_):
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    t = jnp.linspace(0.0, 1.0, D, dtype=raydir.dtype)
    tvals = near * (1.0 - t) + far * t
    ts = _nerf_stratified(key, tvals, B, R, D, jitter, u=u)
    seg = jnp.concatenate(
        [ts[..., 1:] - ts[..., :-1],
         jnp.full((B, R, 1), 1e10, dtype=ts.dtype)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    return raypos, seg, jnp.ones_like(ts), ts


def nerf_near_far_disparity_linear_ray_generation(campos, raydir, point_count,
                                                  near=0.1, far=10.0, jitter=1.0,
                                                  key: Optional[jax.Array] = None,
                                                  u=None, **_):
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    t = jnp.linspace(0.0, 1.0, D, dtype=raydir.dtype)
    tvals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    ts = _nerf_stratified(key, tvals, B, R, D, jitter, u=u)
    seg = jnp.concatenate(
        [ts[..., 1:] - ts[..., :-1],
         jnp.full((B, R, 1), 1e10, dtype=ts.dtype)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    return raypos, seg, jnp.ones_like(ts), ts


def sample_pdf(bins, weights, n_samples, key: Optional[jax.Array] = None, det=False):
    """Importance-resample sample depths from per-bin weights (NeRF fine pass).

    bins: (N,R,S,1) bin edge depths; weights: (N,R,S,1).
    Returns sorted samples (N,R,n_samples+S,1).
    Reference: diff_ray_marching.py:36-82 (implemented there in numpy; here XLA).
    """
    N, R, S, _ = bins.shape
    b = bins[..., 0]
    centers = 0.5 * (b[..., 1:] + b[..., :-1])  # (N,R,S-1)
    w = weights[..., 1:-1, 0] + 1e-5  # (N,R,S-2)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N,R,S-1)
    if det or key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=b.dtype),
                             (N, R, n_samples))
    else:
        u = jax.random.uniform(key, (N, R, n_samples), dtype=b.dtype)
    inds = jax.vmap(jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right")))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(centers, jnp.minimum(below, S - 2), axis=-1)
    bin_a = jnp.take_along_axis(centers, jnp.minimum(above, S - 2), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    samples = bin_b + t * (bin_a - bin_b)
    samples = jnp.concatenate([samples, b], axis=-1)
    samples = jnp.sort(samples, axis=-1)
    return jax.lax.stop_gradient(samples[..., None])


def cube_ray_generation(campos, raydir, point_count, near=0.1, far=10.0,
                        jitter=0.0, key: Optional[jax.Array] = None,
                        domain_size=1.0, u=None, **_):
    """Linear samples on the ray span clipped to the [-domain_size,
    domain_size]^3 cube. The reference registers `cube` as its feedforward
    default (diff_ray_marching.py:9-10) but never defines the function (a
    NameError if selected); the cube semantics survive in
    refine_cube_ray_generation (:473-506, valid = inside the cube) — this
    implements the generator to match: ray-AABB entry/exit bounds
    intersected with [near, far], samples outside the cube marked invalid."""
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    # slab intersection per axis (raydir may have zero components)
    inv = 1.0 / jnp.where(jnp.abs(raydir) < 1e-9,
                          jnp.where(raydir < 0, -1e-9, 1e-9), raydir)
    t0 = (-domain_size - campos[:, None, :]) * inv     # (B,R,3)
    t1 = (domain_size - campos[:, None, :]) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)         # (B,R)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn = jnp.maximum(tn, near)
    tf = jnp.minimum(tf, far)
    hit = tf > tn
    tn = jnp.where(hit, tn, near)
    tf = jnp.where(hit, tf, far)

    t = jnp.linspace(0.0, 1.0, D + 1, dtype=raydir.dtype)
    tvals = tn[..., None] * (1.0 - t) + tf[..., None] * t    # (B,R,D+1)
    seg = tvals[..., 1:] - tvals[..., :-1]
    if jitter > 0 and (key is not None or u is not None):
        if u is None:
            u = jax.random.uniform(key, seg.shape, seg.dtype, -1.0, 1.0)
        seg = seg * (1.0 + jitter * u)
    end_ts = tn[..., None] + jnp.concatenate(
        [jnp.zeros((B, R, 1), seg.dtype), jnp.cumsum(seg, axis=-1)], axis=-1)
    ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    valid = (jnp.all((raypos > -domain_size) & (raypos < domain_size),
                     axis=-1) & hit[..., None]).astype(raydir.dtype)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, valid, ts


_RAYGEN = {
    "cube": cube_ray_generation,
    "near_far_linear": near_far_linear_ray_generation,
    "near_far_disparity_linear": near_far_disparity_linear_ray_generation,
    "nerf_near_far_linear": nerf_near_far_linear_ray_generation,
    "nerf_near_far_disparity_linear": nerf_near_far_disparity_linear_ray_generation,
}


def find_ray_generation_method(name: str):
    if name not in _RAYGEN:
        raise RuntimeError(f"No such ray generation method: {name}")
    return _RAYGEN[name]


def near_middle_far_ray_generation(campos, raydir, point_count, near=0.1,
                                   middle=2.0, far=10.0, middle_split=0.6,
                                   jitter=0.0, key: Optional[jax.Array] = None,
                                   **_):
    """Linear in [near,middle], disparity-linear in [middle,far]
    (reference diff_ray_marching.py:142-198)."""
    B, R = raydir.shape[0], raydir.shape[1]
    D = point_count
    n0 = int(D * middle_split) + 1
    n1 = int(D * (1 - middle_split)) + 2
    t0 = jnp.linspace(0.0, 1.0, n0, dtype=raydir.dtype)
    vals0 = near * (1 - t0) + middle * t0
    t1 = jnp.linspace(0.0, 1.0, n1, dtype=raydir.dtype)
    vals1 = 1.0 / (1.0 / middle * (1 - t1) + 1.0 / far * t1)
    tvals = jnp.concatenate([vals0, vals1])
    seg = (tvals[1:] - tvals[:-1])[None, None, :]
    seg = _jitter_lengths(key, seg, B, R, seg.shape[-1], jitter)[..., :D]
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), seg.dtype), jnp.cumsum(seg, axis=-1)], axis=-1)
    ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    return raypos, seg, jnp.ones_like(ts), ts


def refine_ray_generation(campos, raydir, point_count, prev_ts, prev_weights,
                          key: Optional[jax.Array] = None, jitter=0, **_):
    """Importance resampling of sample depths (reference :397-431)."""
    end_ts = sample_pdf(prev_ts[..., None], prev_weights,
                        point_count + 1, key=key, det=jitter <= 0)[..., 0]
    end_ts = end_ts[..., : point_count + 1]
    seg = end_ts[..., 1:] - end_ts[..., :-1]
    ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * ts[..., None]
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, jnp.ones_like(ts), ts


def refine_cube_ray_generation(campos, raydir, point_count, prev_ts,
                               prev_weights, domain_size=1.0,
                               key: Optional[jax.Array] = None, jitter=0,
                               **_):
    """Importance resampling with cube-domain validity (reference
    refine_cube_ray_generation, diff_ray_marching.py:473-506)."""
    raypos, seg, _, ts = refine_ray_generation(
        campos, raydir, point_count, prev_ts, prev_weights, key=key,
        jitter=jitter)
    valid = jnp.all((raypos > -domain_size) & (raypos < domain_size),
                    axis=-1).astype(raypos.dtype)
    return raypos, seg, valid, ts


def find_refined_ray_generation_method(name: str):
    """Reference find_refined_ray_generation_method
    (diff_ray_marching.py:24-32): 'cube' -> cube-validity refine;
    'nerf*' and everything else -> plain importance refine (the
    reference's nerf_refine body is the same sample_pdf midpoint
    scheme, :434-470, and its final branch is a catch-all default)."""
    if name == "cube":
        return refine_cube_ray_generation
    return refine_ray_generation


_RAYGEN["near_middle_far"] = near_middle_far_ray_generation
