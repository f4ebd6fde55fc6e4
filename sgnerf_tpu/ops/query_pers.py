"""Perspective-space neighbor querier (the Point-NeRF original variant).

Reference: /root/reference/models/neural_points/query_point_indices.py
(`lighting_fast_querier`, selected when wcoord_query==0 —
neural_points.py:426): voxelizes the point cloud in CAMERA PERSPECTIVE space
(x/z, y/z, z) per frame, then runs the same mask -> compact -> KNN pipeline
with distances measured in perspective coordinates.

TPU design: perspective coords change every frame, so the grid here is
rebuilt per query (exactly like the reference's per-forward rebuild — the
persistent-grid optimization only applies to the world-space variant). The
machinery is shared: transform to perspective space, reuse
build_point_grid / query_neighbors on the transformed cloud. Used by
NeRF-synthetic parity configs; ScanNet uses the world-space path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import w2pers
from .grid import GridSpec, build_point_grid
from .query import QueryResult, query_neighbors


def perspective_grid_spec(pers_xyz: np.ndarray, vsize, vscale, kernel_size,
                          max_o, P, depth_limit_scale: float = 1.3,
                          near: float = 2.0, far: float = 6.0) -> GridSpec:
    """Host-side spec over perspective coords: x,y in tan-angle units, z in
    depth; z bounded by [near, far] (reference get_hyperparameters in
    query_point_indices.py)."""
    pers_xyz = np.asarray(pers_xyz, np.float64)
    vsize = np.asarray(vsize, np.float64)
    vscale = np.asarray(vscale, np.float64)
    scaled = vsize * vscale
    mn = pers_xyz.min(0)
    mx = pers_xyz.max(0)
    mn[2] = max(mn[2], near)
    mx[2] = min(mx[2], far)
    ks = np.asarray(kernel_size, np.float64)
    mn = mn - scaled * ks / 2
    mx = mx + scaled * ks / 2
    vdim = np.ceil((mx - mn) / vsize / vscale).astype(np.int64)
    return GridSpec(
        min_corner=tuple(float(v) for v in mn),
        vsize=tuple(float(v) for v in scaled),
        vdim=tuple(int(v) for v in vdim),
        max_o=int(max_o), P=int(P),
        kernel_size=tuple(int(k) for k in np.asarray(kernel_size)),
        nbr_cache=0,  # per-frame grid: cache build would not amortize
    )


def query_neighbors_perspective(points_xyz: jnp.ndarray,
                                point_mask: jnp.ndarray,
                                raypos_w: jnp.ndarray,
                                camrotc2w: jnp.ndarray, campos: jnp.ndarray,
                                spec: GridSpec, K: int, SR: int,
                                radius_limit: float,
                                key: Optional[jax.Array] = None
                                ) -> Tuple[QueryResult, jnp.ndarray]:
    """Build the per-frame perspective grid and query.

    raypos_w: (B,R,D,3) world ray samples (B=1 camera). Returns the
    QueryResult (sample_loc_w holds PERSPECTIVE shading coords) plus the
    perspective point cloud for downstream gathers."""
    pers = w2pers(points_xyz, camrotc2w[0], campos[0])
    grid = build_point_grid(pers, point_mask, spec)
    raypos_p = w2pers(raypos_w.reshape(-1, 3), camrotc2w[0],
                      campos[0]).reshape(raypos_w.shape)
    res = query_neighbors(grid, pers, raypos_p, K=K, SR=SR,
                          radius_limit=radius_limit, key=key)
    return res, pers


def perspective_spec_from_camera(intrinsic: np.ndarray, W: int, H: int,
                                 near: float, far: float, vsize, vscale,
                                 kernel_size, max_o, P,
                                 pad_frac: float = 0.1) -> GridSpec:
    """STATIC per-scene perspective grid spec from the camera frustum
    (x,y in tan-angle units bounded by the image extent, z in [near,far]).

    Unlike `perspective_grid_spec` (data-dependent bounds -> per-frame
    recompiles), this gives one fixed grid geometry for the whole scene so
    the per-frame rebuild jits once."""
    fx, fy = float(intrinsic[0, 0]), float(intrinsic[1, 1])
    cx, cy = float(intrinsic[0, 2]), float(intrinsic[1, 2])
    x_lo = -(cx / fx) * (1 + pad_frac)
    x_hi = ((W - cx) / fx) * (1 + pad_frac)
    y_lo = -(cy / fy) * (1 + pad_frac)
    y_hi = ((H - cy) / fy) * (1 + pad_frac)
    vsize = np.asarray(vsize, np.float64)
    vscale = np.asarray(vscale, np.float64)
    scaled = vsize * vscale
    mn = np.array([x_lo, y_lo, near], np.float64)
    mx = np.array([x_hi, y_hi, far], np.float64)
    ks = np.asarray(kernel_size, np.float64)
    mn = mn - scaled * ks / 2
    mx = mx + scaled * ks / 2
    vdim = np.ceil((mx - mn) / vsize / vscale).astype(np.int64)
    return GridSpec(
        min_corner=tuple(float(v) for v in mn),
        vsize=tuple(float(v) for v in scaled),
        vdim=tuple(int(v) for v in vdim),
        max_o=int(max_o), P=int(P),
        kernel_size=tuple(int(k) for k in np.asarray(kernel_size)),
        nbr_cache=0)
