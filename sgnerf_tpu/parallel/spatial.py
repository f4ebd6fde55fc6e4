"""Spatially-sharded neural point scenes: slab decomposition + halo.

The reference is hard-capped at one GPU's memory (single-device design,
SURVEY §2.6); our replicated path (parallel/sharded.py) inherits that cap
per chip — at 8 mm voxels a 1M-point room already carries a ~3 GB
neighborhood cache. This module removes the cap the TPU-native way
anticipated by SURVEY §2.6/§7: the scene (point attributes + voxel grid +
neighborhood cache) is decomposed into X-axis voxel slabs, one per device,
each padded with a halo wide enough to cover the query kernel, and the
renderer runs under `shard_map` with three tiny collectives:

  1. `psum` of the per-slab sample-hit mask (union of dilated occupancy) so
     every chip compacts the SAME shading points;
  2. each chip queries/gathers/shades ONLY the shading points whose voxel it
     owns (ownership is disjoint: slab interval along x), producing zeros
     elsewhere — the per-point work (the expensive part: cache gather,
     attribute gather, per-neighbor MLPs) splits ~1/n per chip;
  3. `psum` of the decoded (B,R,SR,4) features + masks merges the slabs;
     the (cheap) volume march then runs replicated.

Because ownership is disjoint and the halo covers the kernel extent, the
result is numerically the single-device render (exactness asserted in
tests/test_spatial.py on an 8-device CPU mesh). Scene memory per chip is
~1/n_shards (+halo); rays can still be sharded on top by chunking.

Reference mapping: this replaces "render the whole scene on one device";
there is no reference counterpart to cite beyond the querier semantics
already implemented by ops/grid.py + ops/query.py, which this reuses.

Training on sharded scenes (spatial_train_step) adds: per-shard backward
(param grads psum over shards), a halo-duplicate gradient reduction for the
per-point tensors (scatter-add at global ids -> psum -> gather back, so both
copies of every halo point receive the total gradient and evolve in
lockstep), and per-shard optimizer state. Gradient parity with the
replicated train_step is asserted in tests.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exports shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.point_cloud import NeuralPointCloud
from ..models.renderer import RenderConfig, gather_and_aggregate
from ..ops.grid import (GridSpec, _build_grid_core, _build_nbr_cache_jit,
                        take3d, unpack_cache, voxel_coords, in_bounds)
from ..ops.march import (ray_march, ray_dist_from_z, find_render_function,
                         find_blend_function, find_tone_map)
from ..ops.query import compact_hits
from ..ops.raygen import find_ray_generation_method


@dataclasses.dataclass(frozen=True)
class SpatialSpec:
    """Static decomposition geometry (hashable; safe as a jit static)."""
    gspec: GridSpec          # GLOBAL grid spec (full vdim)
    n_shards: int
    slab_w: int              # owned voxels along x per shard (last may own less)
    halo: int                # extra voxels on each side of the slab
    cap_pts: int             # per-shard point capacity (halo included, padded)
    max_o_s: int             # per-shard occupied-voxel capacity
    max_d_s: int             # per-shard dilated-voxel (cache) capacity
    n_global: int = 0        # global point capacity (halo grad-sync buffer)

    @property
    def Lx(self) -> int:
        return self.slab_w + 2 * self.halo

    @property
    def lspec(self) -> GridSpec:
        """Per-shard build/query spec: the global spec windowed to Lx voxels
        along x (points are shifted by -x_off*vsize at build time so one
        static spec serves every shard)."""
        return dataclasses.replace(
            self.gspec, vdim=(self.Lx, self.gspec.vdim[1],
                              self.gspec.vdim[2]),
            max_o=self.max_o_s, coarse_factor=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedScene:
    """All arrays carry a leading (n_shards,) axis, sharded over the mesh."""
    cloud: NeuralPointCloud   # every leaf stacked: (n, cap_pts, ...) etc.
    occ_mask: jnp.ndarray     # (n, Lx, Y, Z) uint8 dilated occupancy
    dil_slot: jnp.ndarray     # (n, Lx, Y, Z) int32 cache slot or -1
    nbr_packed: jnp.ndarray   # (n, max_d_s, C*W) int16 neighborhood cache
    x_off: jnp.ndarray        # (n,) int32 global gx of local x=0 (lo_i - halo)
    own_lo: jnp.ndarray       # (n,) int32 ownership interval [own_lo, own_hi)
    own_hi: jnp.ndarray       # (n,) int32
    gid: jnp.ndarray          # (n, cap_pts) int32 local row -> GLOBAL point id
    #                           (padding rows = global capacity sentinel);
    #                           halo rows appear on two shards — the training
    #                           halo grad sync reduces over this map


def _round_up(v: int, b: int) -> int:
    return max(b, ((v + b - 1) // b) * b)


def plan_sharded_scene(xyz: np.ndarray, active: np.ndarray,
                       gspec: GridSpec, n_shards: int, capacity: int, *,
                       pts_bucket: int = 4096, vox_bucket: int = 8192,
                       halo_override: Optional[int] = None,
                       need_tables: bool = True):
    """Host-side (numpy) slab planning: per-shard point selection and
    capacity sizing, WITHOUT building any device tables. Used by
    build_sharded_scene and by the deviceless AOT memory proof
    (dev_scripts/probe_spatial_aot_42m.py / tests/test_mosaic_aot.py),
    which needs the production SpatialSpec but not the 2.5 GB of tables.

    need_tables=False (perspective-only scenes, wcoord_query=0): skip the
    nbr-cache requirement and the dilated-voxel capacity sizing — the
    world cache is never built there (build_sharded_scene build_tables).

    Returns (SpatialSpec, sels) where sels[i] are the global point indices
    of shard i (halo included)."""
    if need_tables:
        assert gspec.nbr_cache > 0, \
            "sharded rendering requires the nbr cache"
    xyz = np.asarray(xyz)
    active = np.asarray(active)
    X, Y, Z = gspec.vdim
    vsx = gspec.vsize[0]
    minx = gspec.min_corner[0]
    gx = np.floor((xyz[:, 0] - minx) / vsx).astype(np.int64)

    halo = max(max(gspec.kernel_size), max(gspec.dilate)) // 2 + 1
    if halo_override is not None:
        # the perspective querier needs a wider halo than the world
        # kernel's (perspective_halo_voxels)
        halo = max(halo, int(halo_override))
    slab_w = (X + n_shards - 1) // n_shards
    Lx = slab_w + 2 * halo

    # per-shard point selection + capacity sizing
    sels, occ_counts, dil_counts = [], [], []
    voxel = np.stack([gx, np.floor((xyz[:, 1] - gspec.min_corner[1])
                                   / gspec.vsize[1]).astype(np.int64),
                      np.floor((xyz[:, 2] - gspec.min_corner[2])
                               / gspec.vsize[2]).astype(np.int64)], -1)
    inb = active & (gx >= 0) & (gx < X) \
        & (voxel[:, 1] >= 0) & (voxel[:, 1] < Y) \
        & (voxel[:, 2] >= 0) & (voxel[:, 2] < Z)
    for i in range(n_shards):
        lo = i * slab_w
        sel = np.nonzero(inb & (gx >= lo - halo)
                         & (gx < lo + slab_w + halo))[0]
        sels.append(sel)
        if len(sel) and not need_tables:
            # perspective-only: the dilated-voxel sizing below is seconds
            # of host time at multi-million-point scale, for a cache table
            # build_tables=False never constructs
            occ_counts.append(len(np.unique(voxel[sel], axis=0)))
            dil_counts.append(1)
        elif len(sel):
            occ = np.unique(voxel[sel], axis=0)
            # dilation by the dilate extent around occupied voxels, clipped
            # to the shard window — sizes the cache table
            ks = np.asarray(gspec.dilate) // 2
            offs = np.stack(np.meshgrid(*[np.arange(-k, k + 1) for k in ks],
                                        indexing="ij"), -1).reshape(-1, 3)
            dil = (occ[:, None, :] + offs[None]).reshape(-1, 3)
            lox = lo - halo
            # clip to the shard's LOCAL window — NOT the global grid: the
            # per-shard build dilates over the whole (Lx, Y, Z) local
            # array, so boundary shards enumerate dilated cells at global
            # x<0 / x>=X too (their local cells exist; reachable whenever
            # --query_size exceeds kernel_size, whose half-extent sets the
            # global margin); clipping those out here undersized max_d_s
            # and let the fixed-size nonzero in ops/grid.py silently drop
            # owned high-x cache rows (round-5 review fix)
            ok = ((dil[:, 0] >= lox) & (dil[:, 0] < lox + Lx)
                  & (dil[:, 1] >= 0) & (dil[:, 1] < Y)
                  & (dil[:, 2] >= 0) & (dil[:, 2] < Z))
            dil_counts.append(len(np.unique(dil[ok], axis=0)))
            occ_counts.append(len(occ))
        else:
            occ_counts.append(1)
            dil_counts.append(1)

    cap_pts = _round_up(max(len(s) for s in sels), pts_bucket)
    max_o_s = _round_up(max(occ_counts), vox_bucket)
    max_d_s = _round_up(max(dil_counts), vox_bucket)

    return SpatialSpec(gspec=gspec, n_shards=n_shards, slab_w=slab_w,
                       halo=halo, cap_pts=cap_pts, max_o_s=max_o_s,
                       max_d_s=max_d_s, n_global=capacity), sels


def build_sharded_scene(cloud: NeuralPointCloud, gspec: GridSpec,
                        n_shards: int, *, pts_bucket: int = 4096,
                        vox_bucket: int = 8192,
                        halo_override: Optional[int] = None,
                        build_tables: bool = True):
    """Decompose `cloud` into n_shards X-slabs and build per-slab grids.

    Host-side (numpy) slab selection (plan_sharded_scene); per-slab
    grid/cache builds run the same jitted programs as the replicated path
    (one compile each — every shard shares one static local spec).
    Capacities are maxima over shards, bucketed to bound recompiles across
    scenes.

    Returns (ShardedScene, SpatialSpec).
    """
    sspec, sels = plan_sharded_scene(
        cloud.xyz, cloud.active, gspec, n_shards, cloud.capacity,
        pts_bucket=pts_bucket, vox_bucket=vox_bucket,
        halo_override=halo_override, need_tables=build_tables)
    X, _, _ = gspec.vdim
    vsx = gspec.vsize[0]
    slab_w, halo = sspec.slab_w, sspec.halo
    cap_pts = sspec.cap_pts
    max_d_s = sspec.max_d_s
    lspec = sspec.lspec

    def slab_cloud(i: int) -> NeuralPointCloud:
        sel = sels[i]
        n = len(sel)

        def take(a, fill=0.0):
            a = np.asarray(a)
            out = np.full((cap_pts,) + a.shape[1:], fill, a.dtype)
            out[:n] = a[sel]
            return jnp.asarray(out)

        return NeuralPointCloud(
            xyz=take(cloud.xyz, 1e9), embedding=take(cloud.embedding),
            conf=take(cloud.conf), dir=take(cloud.dir),
            color=take(cloud.color), feats=take(cloud.feats),
            label=take(cloud.label), label_prob=take(cloud.label_prob),
            sem_embedding=take(cloud.sem_embedding),
            Rw2c=cloud.Rw2c if np.asarray(cloud.Rw2c).ndim == 2
            else jnp.asarray(cloud.Rw2c),
            rot_idx=take(cloud.rot_idx),
            active=take(cloud.active, False),
            n_active=jnp.asarray(n, jnp.int32),
        )

    occ_l, dil_l, nbr_l, clouds, gids = [], [], [], [], []
    x_offs, own_los, own_his = [], [], []
    for i in range(n_shards):
        lo = i * slab_w
        x_off = lo - halo
        lcloud = slab_cloud(i)
        if build_tables:
            # shift so the shard window starts at local voxel x=0; one
            # static lspec then serves every shard (one compile, not n)
            shift = jnp.asarray([x_off * vsx, 0.0, 0.0], jnp.float32)
            lgrid = _build_grid_core(lcloud.xyz - shift, lcloud.active,
                                     lspec)
            dil_slot, nbr_packed = _build_nbr_cache_jit(lgrid, lspec,
                                                        max_d_s)
            occ_l.append(lgrid.occ_mask)
            dil_l.append(dil_slot)
            nbr_l.append(nbr_packed)
        else:
            # perspective-only scenes (wcoord_query=0): the per-frame
            # frustum grid is rebuilt inside the render, the world tables
            # would never be read
            # (1,1,1) placeholders, not zero-size: a (n,0,...) leaf
            # cannot carry a per-shard sharding through shard_map
            occ_l.append(jnp.zeros((1, 1, 1), jnp.uint8))
            dil_l.append(jnp.full((1, 1, 1), -1, jnp.int32))
            nbr_l.append(jnp.zeros((1, 2), jnp.int16))
        clouds.append(lcloud)
        g = np.full(cap_pts, cloud.capacity, np.int32)
        g[:len(sels[i])] = sels[i]
        gids.append(jnp.asarray(g))
        x_offs.append(x_off)
        own_los.append(lo)
        own_his.append(min(lo + slab_w, X))

    stacked_cloud = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
    return ShardedScene(
        cloud=stacked_cloud,
        occ_mask=jnp.stack(occ_l),
        dil_slot=jnp.stack(dil_l),
        nbr_packed=jnp.stack(nbr_l),
        x_off=jnp.asarray(x_offs, jnp.int32),
        own_lo=jnp.asarray(own_los, jnp.int32),
        own_hi=jnp.asarray(own_his, jnp.int32),
        gid=jnp.stack(gids),
    ), sspec


def shard_scene_put(scene: ShardedScene, mesh: Mesh) -> ShardedScene:
    """Place every scene leaf with its leading shard axis over the mesh."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), scene)


@jax.custom_vjp
def _merge(x):
    """psum with IDENTITY transpose. The slab merge feeds exclusively
    replicated computation (march + losses), whose cotangent is identical
    on every shard; the plain psum transpose under check_vma=False would
    psum those identical cotangents AGAIN, scaling every gradient by
    n_shards (measured: exactly 8x on the 8-device mesh)."""
    return jax.lax.psum(x, "data")


def _merge_fwd(x):
    return _merge(x), None


def _merge_bwd(_, g):
    return (g,)


_merge.defvjp(_merge_fwd, _merge_bwd)


def _local_query(scene_slice, sspec: SpatialSpec, cfg: RenderConfig,
                 sample_loc_w, smask, sample_label=None, points_label=None,
                 points_label_prob=None, key=None,
                 semantic_guidance=False):
    """Per-shard neighbor query: cache lookup restricted to OWNED shading
    points (mirrors ops/query.query_neighbors' cache path on slab-local
    tables, including the semantic-guidance predicate)."""
    (occ_mask, dil_slot, nbr_packed, x_off, own_lo, own_hi) = scene_slice
    gspec, lspec = sspec.gspec, sspec.lspec
    B, R, SR, _ = sample_loc_w.shape

    c = voxel_coords(sample_loc_w, gspec)                  # global (B,R,SR,3)
    own = smask & (c[..., 0] >= own_lo) & (c[..., 0] < own_hi) \
        & in_bounds(c, gspec)
    lc = c - jnp.stack([x_off, jnp.zeros_like(x_off),
                        jnp.zeros_like(x_off)])            # local coords
    ldim = (sspec.Lx, gspec.vdim[1], gspec.vdim[2])
    lcc = jnp.clip(lc, 0, jnp.asarray(ldim, jnp.int32) - 1)
    slot = take3d(dil_slot, lcc, ldim)
    slot_ok = own & (slot >= 0)
    slot_c = jnp.clip(slot, 0, sspec.max_d_s - 1)

    rows = jax.lax.optimization_barrier(nbr_packed[slot_c])
    if (cfg.knn_mode == "fused" and not semantic_guidance
            and lspec.cache_dtype == "bfloat16"):
        # fused Pallas select over the slab-local rows (ops/fused_knn.py),
        # same selection as the XLA path below; runs inside shard_map
        from ..ops.fused_knn import fused_knn_select
        center = (c.astype(jnp.float32) + 0.5) * gspec.vsize_arr \
            + gspec.min_corner_arr
        Mq = B * R * SR
        Cc = rows.shape[-1] // 5
        r2 = jnp.asarray(cfg.radius_limit, jnp.float32) ** 2
        sel = fused_knn_select(
            rows.reshape(Mq, -1), (sample_loc_w - center).reshape(Mq, 3),
            slot_ok.reshape(Mq), r2, C=Cc, K=cfg.K)
        return sel.reshape(B, R, SR, cfg.K), own
    off, cand = unpack_cache(rows, lspec)
    center = (c.astype(jnp.float32) + 0.5) * gspec.vsize_arr \
        + gspec.min_corner_arr
    cxyz = center[..., None, :] + off.astype(jnp.float32)
    cand_ok = slot_ok[..., None] & (cand >= 0)
    d2 = jnp.sum((cxyz - sample_loc_w[..., None, :]) ** 2, axis=-1)

    radius2 = jnp.asarray(cfg.radius_limit, d2.dtype) ** 2
    ok = cand_ok & jnp.where(radius2 > 0, d2 <= radius2, True)

    if semantic_guidance:
        # reference predicate (query_point_indices_worldcoords.py:548-556),
        # identical to ops/query.query_neighbors' branch but over the
        # LOCAL candidate ids
        Np = points_label.shape[0]
        center_label = sample_label[..., None]
        cidx = jnp.clip(cand, 0, Np - 1)
        label_v = points_label[cidx].astype(jnp.int32)
        C = points_label_prob.shape[-1]
        prob_v = jnp.take_along_axis(
            points_label_prob[cidx],
            jnp.clip(label_v, 0, C - 1)[..., None], axis=-1)[..., 0]
        label_prob_i = (prob_v * 10.0).astype(jnp.int32)
        p_acc = jnp.clip(2 - label_prob_i, 0, 10).astype(d2.dtype) / 10.0
        if key is None:
            stochastic = p_acc >= 1.0
        else:
            stochastic = jax.random.uniform(key, d2.shape) < p_acc
        ok = ok & ((center_label == label_v) | (label_v == 0)
                   | (center_label == 0) | stochastic)

    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2m = jnp.where(ok, d2, big)
    neg_top, top_idx = jax.lax.top_k(-d2m, cfg.K)
    top_ok = -neg_top < big
    sample_pidx = jnp.where(
        top_ok, jnp.take_along_axis(cand, top_idx, axis=-1), -1)
    return sample_pidx.astype(jnp.int32), own


def _forward_local(params, cloud, occ_mask, dil_slot, nbr_packed, x_off,
                   own_lo, own_hi, sspec: SpatialSpec, cfg: RenderConfig,
                   campos, raydir, camrotc2w, near, far, bg_color,
                   key=None, is_train=False,
                   pixel_label=None) -> Dict[str, jnp.ndarray]:
    """Per-shard forward pass (runs INSIDE shard_map; all scene operands are
    this shard's slices). Outputs are replicated (post-psum) and match
    render_rays on the equivalent un-sharded scene. The key is split
    exactly like render_rays (raygen jitter / semantic draws); NOTE the
    semantic Bernoulli draws index LOCAL candidate slots, so with a key the
    accepted neighbor sets are statistically but not bitwise identical to
    the replicated path (deterministic with key=None). gather_round=
    "stochastic" is NOT applied here (the per-shard attribute tables use
    nearest rounding) so sharded gradients stay bitwise-checkable against
    the replicated step; SR-bf16 training is a single-device/ray-DP
    feature for now."""
    gspec = sspec.gspec
    B, R, _ = raydir.shape

    kj = ks = None
    if key is not None:
        kj, ks = jax.random.split(key)
    raygen = find_ray_generation_method(cfg.which_ray_generation)
    raypos, _, _, _ = raygen(campos, raydir, cfg.z_depth_dim, near=near,
                             far=far,
                             jitter=cfg.jitter if is_train else 0.0,
                             key=kj, domain_size=cfg.domain_size)

    # (1) slab-local hit mask -> psum union -> identical compaction
    c = voxel_coords(raypos, gspec)
    inb = in_bounds(c, gspec)
    lc = c - jnp.stack([x_off, jnp.zeros_like(x_off),
                        jnp.zeros_like(x_off)])
    ldim = (sspec.Lx, gspec.vdim[1], gspec.vdim[2])
    lin = jnp.all((lc >= 0) & (lc < jnp.asarray(ldim, jnp.int32)),
                  axis=-1)
    lcc = jnp.clip(lc, 0, jnp.asarray(ldim, jnp.int32) - 1)
    occ = take3d(occ_mask, lcc, ldim) > 0
    hit_local = (inb & lin & occ).astype(jnp.int32)
    hit = jax.lax.psum(hit_local, "data") > 0           # union over slabs
    smask, gather_d = compact_hits(hit, cfg.SR)
    loc = jnp.take_along_axis(raypos, gather_d[..., None], axis=2)
    sample_loc_w = jnp.where(smask[..., None], loc, 0.0)

    # (2) owned-slab query + gather + per-neighbor MLPs
    use_sem = bool(cfg.semantic_guidance) and is_train \
        and pixel_label is not None
    sample_label = None
    if use_sem:
        sample_label = jnp.where(
            smask, pixel_label[..., None].astype(jnp.int32), 0)
    sample_pidx, own = _local_query(
        (occ_mask, dil_slot, nbr_packed, x_off, own_lo, own_hi),
        sspec, cfg, sample_loc_w, smask,
        sample_label=sample_label,
        points_label=cloud.label if use_sem else None,
        points_label_prob=cloud.label_prob if use_sem else None,
        key=ks, semantic_guidance=use_sem)
    (decoded, ray_valid, weight, conf_coefficient, sample_loc,
     sampled) = gather_and_aggregate(params, cloud, cfg, sample_pidx,
                                     sample_loc_w, campos, raydir, camrotc2w,
                                     is_train=is_train)
    ownf = own.astype(decoded.dtype)
    decoded = decoded * ownf[..., None]
    weight = weight * ownf[..., None]
    conf_coefficient = conf_coefficient * ownf[..., None]  # (B,R,SR,K)

    # (3) merge slabs: ownership is disjoint, so psum IS the gather
    # (identity-transpose psum: see _merge)
    decoded = _merge(decoded)
    weight = _merge(weight)
    conf_coefficient = _merge(conf_coefficient)
    ray_valid = jax.lax.psum(
        (ray_valid & own).astype(jnp.int32), "data") > 0
    ray_mask = jnp.any(ray_valid, axis=-1)

    ray_dist = ray_dist_from_z(sample_loc[..., 2], ray_valid,
                               cfg.vsize[2], cfg.raydist_mode_unit)
    render_func = find_render_function(cfg.which_render_func)
    blend_func = find_blend_function(cfg.which_blend_func)
    tone_map = find_tone_map(cfg.which_tonemap_func)
    (ray_color, _, opacity, _, blend_weight, background_transmission,
     _) = ray_march(ray_dist, ray_valid, decoded, render_func,
                    blend_func, bg_color)
    return {
        "coarse_raycolor": tone_map(ray_color),
        "coarse_point_opacity": opacity,
        "coarse_is_background": background_transmission,
        "queried_shading": jnp.broadcast_to(
            jnp.logical_not(jnp.any(ray_valid, -1, keepdims=True)
                            ).astype(jnp.float32), (B, R, 3)),
        "ray_mask": ray_mask,
        "ray_valid": ray_valid,
        "weight": jax.lax.stop_gradient(weight),
        "blend_weight": jax.lax.stop_gradient(blend_weight),
        "conf_coefficient": conf_coefficient,
        # eval attr_dedup overflow, summed over shards (each shard counts
        # only its owned rows, so the psum is the global count) — surfaced
        # so --scene_shards renders get the same exactness guarantee as the
        # non-spatial path (overflowed chunks re-render via plain gather)
        **({"attr_dedup_overflow": jax.lax.psum(
            sampled["attr_dedup_overflow"], "data")}
           if "attr_dedup_overflow" in sampled else {}),
        **({"gvjp_overflow": jax.lax.psum(
            sampled["gvjp_overflow"], "data")}
           if "gvjp_overflow" in sampled else {}),
    }


def render_rays_spatial(params: Dict[str, Any], scene: ShardedScene,
                        sspec: SpatialSpec, cfg: RenderConfig, mesh: Mesh, *,
                        campos, raydir, camrotc2w, near, far,
                        bg_color: Optional[jnp.ndarray] = None,
                        pixel_label: Optional[jnp.ndarray] = None,
                        key: Optional[jax.Array] = None,
                        is_train: bool = False) -> Dict[str, jnp.ndarray]:
    """Render over the slab-sharded scene; outputs replicate on every chip
    and match render_rays on the equivalent un-sharded scene (semantic
    guidance included when pixel_label is given and cfg asks for it)."""

    def body(params, cloud, occ_mask, dil_slot, nbr_packed, x_off, own_lo,
             own_hi, campos, raydir, camrotc2w, near, far, bg_color,
             pixel_label):
        cloud = jax.tree.map(lambda a: a[0], cloud)  # strip the shard axis
        return _forward_local(
            params, cloud, occ_mask[0], dil_slot[0], nbr_packed[0],
            x_off[0], own_lo[0], own_hi[0], sspec, cfg, campos, raydir,
            camrotc2w, near, far, bg_color, key=key, is_train=is_train,
            pixel_label=pixel_label)

    if bg_color is None:
        bg_color = jnp.ones(3, jnp.float32)
    if pixel_label is None:
        pixel_label = jnp.zeros(raydir.shape[:2], jnp.int32)
    shard = P("data")
    rep = P()
    fn = _shard_map(
        body, mesh=mesh,
        in_specs=(rep, shard, shard, shard, shard, shard, shard, shard,
                  rep, rep, rep, rep, rep, rep, rep),
        out_specs=rep, check_vma=False)
    return fn(params, scene.cloud, scene.occ_mask, scene.dil_slot,
              scene.nbr_packed, scene.x_off, scene.own_lo, scene.own_hi,
              campos, raydir, camrotc2w, jnp.asarray(near, jnp.float32),
              jnp.asarray(far, jnp.float32), bg_color, pixel_label)


# ------------------------------------------- perspective-space composition

def perspective_halo_voxels(gspec: GridSpec, pspec: GridSpec) -> int:
    """World-voxel halo width that makes the slab decomposition sufficient
    for the PERSPECTIVE querier (wcoord_query=0).

    The perspective kernel accepts neighbors within (kernel_size//2 + 1)
    perspective voxels per axis of the shading point's voxel; a
    perspective-space displacement (dpx, dpy, dpz) in (x/z, y/z, z) units
    bounds the camera/world-space displacement by
        |dX| <= dpx*far + |x/z|_max*dpz   (and likewise for Y; |dZ| = dpz),
    with far and the tan-angle extents read off the static frustum spec.
    Rotation is an isometry, so the same bound holds in world space and a
    halo of ceil(|d|/vsize_world) world voxels guarantees every owned
    shading point finds ALL its perspective neighbors in its shard's
    slab+halo point set (exactness asserted vs the single-device render in
    tests/test_spatial.py)."""
    vs = np.asarray(pspec.vsize, np.float64)
    ks = np.asarray(pspec.kernel_size, np.int64)
    d = (ks // 2 + 1) * vs
    mn = np.asarray(pspec.min_corner, np.float64)
    mx = mn + np.asarray(pspec.vdim, np.float64) * vs
    far = mx[2]
    tanx = max(abs(mn[0]), abs(mx[0]))
    tany = max(abs(mn[1]), abs(mx[1]))
    dx = d[0] * far + tanx * d[2]
    dy = d[1] * far + tany * d[2]
    dw = float(np.sqrt(dx * dx + dy * dy + d[2] * d[2]))
    return int(np.ceil(dw / gspec.vsize[0])) + 1


def _forward_local_perspective(params, cloud, own_lo, own_hi,
                               sspec: SpatialSpec, pspec: GridSpec,
                               cfg: RenderConfig, campos, raydir, camrotc2w,
                               near, far, bg_color, key=None,
                               is_train=False) -> Dict[str, jnp.ndarray]:
    """Per-shard perspective-space forward (runs INSIDE shard_map): rebuild
    the local frustum grid from the slab+halo points, psum-union the hit
    mask, query+shade only OWNED shading points, psum-merge, march.
    Train-time randomness (raygen jitter, shpnt_jitter) splits the key
    exactly like renderer.render_rays_perspective so losses match the
    single-device step given the same key (gather_round=stochastic is not
    applied here, like _forward_local)."""
    from ..ops.grid import build_point_grid
    from ..ops.camera import w2pers, pers2w
    from ..ops.query import bucket_candidates

    gspec = sspec.gspec
    B, R, _ = raydir.shape
    X = gspec.vdim[0]

    kj = ksj = None
    if key is not None:
        kj, ks, _kg = jax.random.split(key, 3)
        ks, ksj = jax.random.split(ks)
    raygen = find_ray_generation_method(cfg.which_ray_generation)
    raypos, _, _, _ = raygen(campos, raydir, cfg.z_depth_dim,
                             near=near, far=far,
                             jitter=cfg.jitter if is_train else 0.0,
                             key=kj, domain_size=cfg.domain_size)
    pers_pts = w2pers(cloud.xyz, camrotc2w[0], campos[0])
    lgrid = build_point_grid(pers_pts, cloud.active, pspec)
    raypos_p = w2pers(raypos.reshape(-1, 3), camrotc2w[0],
                      campos[0]).reshape(raypos.shape)

    # (1) hit-mask union over shards -> identical compaction everywhere
    c = voxel_coords(raypos_p, pspec)
    inb = in_bounds(c, pspec)
    cc = jnp.clip(c, 0, jnp.asarray(pspec.vdim, jnp.int32) - 1)
    occ = take3d(lgrid.occ_mask, cc, pspec.vdim) > 0
    hit = jax.lax.psum((inb & occ).astype(jnp.int32), "data") > 0
    smask, gather_d = compact_hits(hit, cfg.SR)
    loc_p = jnp.take_along_axis(raypos_p, gather_d[..., None], axis=2)
    loc_p = jnp.where(smask[..., None], loc_p, 0.0)
    # train-time shading-point depth jitter (renderer.py: reference
    # query_point_indices.py:96,116-126) — shared key, so every shard
    # jitters identically and ownership/KNN stay consistent
    if is_train and ksj is not None and cfg.shpnt_jitter in ("uniform",
                                                             "gaussian"):
        vz = pspec.vsize[2]
        if cfg.shpnt_jitter == "uniform":
            j = (jax.random.uniform(ksj, loc_p.shape[:-1]) - 0.5) * vz
        else:
            j = jnp.clip(jax.random.normal(ksj, loc_p.shape[:-1]) * (vz / 4),
                         -vz / 2, vz / 2)
        loc_p = loc_p.at[..., 2].add(jnp.where(smask, j, 0.0))
    loc_w = pers2w(loc_p.reshape(-1, 3), camrotc2w[0],
                   campos[0]).reshape(loc_p.shape)
    loc_w = jnp.where(smask[..., None], loc_w, 0.0)

    # (2) ownership by the shading point's WORLD x voxel (border samples
    # clamp to the boundary slab, which the halo covers)
    gx = jnp.floor((loc_w[..., 0] - gspec.min_corner[0])
                   / gspec.vsize[0]).astype(jnp.int32)
    gx = jnp.clip(gx, 0, X - 1)
    own = smask & (gx >= own_lo) & (gx < own_hi)

    # (3) per-shard KNN over the local perspective grid
    cand, cand_ok, d2, flat_shape = bucket_candidates(lgrid, loc_p, smask)
    radius2 = jnp.asarray(cfg.radius_limit, d2.dtype) ** 2
    ok = (cand_ok & jnp.where(radius2 > 0, d2 <= radius2, True)
          & own[..., None, None])
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2m = jnp.where(ok, d2, big).reshape(flat_shape)
    neg_top, top_idx = jax.lax.top_k(-d2m, cfg.K)
    top_ok = -neg_top < big
    sample_pidx = jnp.where(
        top_ok, jnp.take_along_axis(cand.reshape(flat_shape), top_idx,
                                    axis=-1), -1).astype(jnp.int32)

    # (4) shade owned shading points; psum merges the disjoint slabs
    (decoded, ray_valid, weight, conf_coefficient, sample_loc,
     _) = gather_and_aggregate(params, cloud, cfg, sample_pidx, loc_w,
                               campos, raydir, camrotc2w,
                               is_train=is_train)
    ownf = own.astype(decoded.dtype)
    decoded = _merge(decoded * ownf[..., None])
    weight = _merge(weight * ownf[..., None])
    conf_coefficient = _merge(conf_coefficient * ownf[..., None])
    ray_valid = jax.lax.psum(
        (ray_valid & own).astype(jnp.int32), "data") > 0
    ray_mask = jnp.any(ray_valid, axis=-1)

    ray_dist = ray_dist_from_z(sample_loc[..., 2], ray_valid,
                               cfg.vsize[2], cfg.raydist_mode_unit)
    render_func = find_render_function(cfg.which_render_func)
    blend_func = find_blend_function(cfg.which_blend_func)
    tone_map = find_tone_map(cfg.which_tonemap_func)
    (ray_color, _, opacity, _, blend_weight, background_transmission,
     _) = ray_march(ray_dist, ray_valid, decoded, render_func,
                    blend_func, bg_color)
    return {
        "coarse_raycolor": tone_map(ray_color),
        "coarse_point_opacity": opacity,
        "coarse_is_background": background_transmission,
        "queried_shading": jnp.broadcast_to(
            jnp.logical_not(jnp.any(ray_valid, -1, keepdims=True)
                            ).astype(jnp.float32), (B, R, 3)),
        "ray_mask": ray_mask,
        "ray_valid": ray_valid,
        "weight": jax.lax.stop_gradient(weight),
        "blend_weight": jax.lax.stop_gradient(blend_weight),
        "conf_coefficient": conf_coefficient,
    }


def render_rays_spatial_perspective(
        params: Dict[str, Any], scene: ShardedScene, sspec: SpatialSpec,
        pspec: GridSpec, cfg: RenderConfig, mesh: Mesh, *,
        campos, raydir, camrotc2w, near, far,
        bg_color: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Perspective-space (wcoord_query=0) render over the slab-sharded
    scene — closes the round-3 "perspective x --scene_shards" cliff.

    Per shard (inside shard_map): transform the LOCAL slab+halo points to
    camera perspective space and rebuild the per-frame frustum grid (the
    same per-forward rebuild the single-device path does,
    ops/query_pers.py); psum-union the per-sample hit mask so every shard
    compacts the SAME shading points; each shard queries + shades only the
    shading points whose WORLD voxel it owns (clamped at the grid borders
    so out-of-range samples keep their boundary owner) — the perspective
    halo (perspective_halo_voxels) guarantees its local points contain the
    full neighbor set; psum merges the disjoint contributions before the
    replicated march. Build the scene with
    build_sharded_scene(halo_override=perspective_halo_voxels(...)).

    Training on sharded perspective scenes: spatial_train_step(pspec=...)
    routes its forward through the same per-shard body."""

    def body(params, cloud, own_lo, own_hi, campos, raydir, camrotc2w,
             near, far, bg_color):
        cloud = jax.tree.map(lambda a: a[0], cloud)
        return _forward_local_perspective(
            params, cloud, own_lo[0], own_hi[0], sspec, pspec, cfg,
            campos, raydir, camrotc2w, near, far, bg_color)

    if bg_color is None:
        bg_color = jnp.ones(3, jnp.float32)
    shard, rep = P("data"), P()
    fn = _shard_map(
        body, mesh=mesh,
        in_specs=(rep, shard, shard, shard, rep, rep, rep, rep, rep, rep),
        out_specs=rep, check_vma=False)
    return fn(params, scene.cloud, scene.own_lo, scene.own_hi, campos,
              raydir, camrotc2w, jnp.asarray(near, jnp.float32),
              jnp.asarray(far, jnp.float32), bg_color)


# --------------------------------------------------------------- training

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpatialTrainState:
    """Training state for slab-sharded scenes: MLP params + net-optimizer
    state replicate; the scene (incl. point attributes) and the per-point
    optimizer state carry the (n_shards,) leading axis."""
    params: Any
    scene: ShardedScene
    opt_state_net: Any
    opt_state_pts: Any          # leading (n_shards,) axis on every leaf
    step: jnp.ndarray           # () int32


def create_spatial_train_state(params, scene: ShardedScene, tcfg
                               ) -> SpatialTrainState:
    from ..models.train import make_optimizers, _point_subtree
    net_tx, pts_tx = make_optimizers(tcfg)
    pts = _point_subtree(scene.cloud)      # leaves (n, cap_pts, C)
    return SpatialTrainState(
        params=params,
        scene=scene,
        opt_state_net=net_tx.init(params),
        opt_state_pts=jax.vmap(pts_tx.init)(pts),
        step=jnp.asarray(0, jnp.int32),
    )


def _spatial_train_step_impl(st: SpatialTrainState, sspec: SpatialSpec,
                             cfg: RenderConfig, tcfg, batch: Dict[str, Any],
                             key: jax.Array, mesh: Mesh,
                             return_grads: bool = False, pspec=None):
    """One training step on a slab-sharded scene (trace body — call the
    jitted spatial_train_step / spatial_train_step_multi wrappers).

    Matches models/train.train_step on the equivalent replicated scene
    (asserted in tests/test_spatial.py):
      * forward = _forward_local (psum-merged, identical outputs/losses on
        every chip given the shared PRNG key);
      * param grads psum over shards (each shard's backward covers only its
        owned shading points);
      * per-point grads live on local (halo-duplicated) rows; the true
        gradient of a physical point is the sum over its copies, which is
        realized by a scatter-add into a global buffer, a psum, and a
        gather back through the local->global id map (scene.gid). Copies
        therefore receive identical totals and evolve in lockstep, keeping
        halo duplicates consistent without any re-sharding.

    xyz must be frozen (tcfg.xyz_grad == 0): moving points would invalidate
    the slab decomposition (the replicated path has the same grid-staleness
    constraint; reference fine-tuning also freezes xyz).

    pspec: a perspective frustum GridSpec routes the forward through the
    slab-sharded PERSPECTIVE querier (_forward_local_perspective; build the
    scene with halo_override=perspective_halo_voxels(...)). No semantic
    guidance there — the reference only added it to the world-coords
    querier.
    """
    import optax
    from ..models.losses import compute_losses
    from ..models.train import make_optimizers, _point_subtree, _with_points

    assert not tcfg.xyz_grad, "sharded training requires frozen xyz"
    assert pspec is None or not cfg.semantic_guidance, \
        "perspective sharded training has no semantic guidance (reference parity)"
    net_tx, pts_tx = make_optimizers(tcfg)

    def body(params, scene, opt_net, opt_pts, step, campos, raydir,
             camrotc2w, near, far, bg_color, gt_image, pixel_label, key):
        cloud = jax.tree.map(lambda a: a[0], scene.cloud)
        opt_pts = jax.tree.map(lambda a: a[0], opt_pts)
        gid = scene.gid[0]

        def loss_fn(params, pts):
            pts = {k: (v if tcfg.grad_switch(k) else jax.lax.stop_gradient(v))
                   for k, v in pts.items()}
            lcloud = _with_points(cloud, pts)
            if pspec is not None:
                out = _forward_local_perspective(
                    params, lcloud, scene.own_lo[0], scene.own_hi[0],
                    sspec, pspec, cfg, campos, raydir, camrotc2w, near,
                    far, bg_color, key=key, is_train=True)
            else:
                out = _forward_local(
                    params, lcloud, scene.occ_mask[0], scene.dil_slot[0],
                    scene.nbr_packed[0], scene.x_off[0], scene.own_lo[0],
                    scene.own_hi[0], sspec, cfg, campos, raydir, camrotc2w,
                    near, far, bg_color, key=key, is_train=True,
                    pixel_label=pixel_label)
            total, losses = compute_losses(
                out, gt_image,
                color_loss_items=tcfg.color_loss_items,
                color_loss_weights=tcfg.color_loss_weights,
                zero_one_loss_items=tcfg.zero_one_loss_items,
                zero_one_loss_weights=tcfg.zero_one_loss_weights,
                sparse_loss_weight=tcfg.sparse_loss_weight,
                zero_epsilon=tcfg.zero_epsilon)
            if "gvjp_overflow" in out:
                losses = dict(losses, gvjp_overflow=jax.lax.stop_gradient(
                    out["gvjp_overflow"]).astype(jnp.float32))
            return total, losses

        pts = _point_subtree(cloud)
        (_, losses), (g_net, g_pts) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, pts)

        # each shard's backward covers only its owned shading points
        g_net = jax.lax.psum(g_net, "data")

        # halo grad sync: scatter-add local grads at global ids, psum,
        # gather back -> every copy of a physical point gets the total
        def sync(g):
            flat = g.reshape(sspec.cap_pts, -1)
            buf = jnp.zeros((sspec.n_global, flat.shape[1]), flat.dtype)
            buf = buf.at[jnp.clip(gid, 0, sspec.n_global)].add(
                jnp.where((gid < sspec.n_global)[:, None], flat, 0.0),
                mode="drop")
            buf = jax.lax.psum(buf, "data")
            return buf[jnp.clip(gid, 0, sspec.n_global - 1)].reshape(g.shape)

        # frozen leaves (stop_gradient above) carry all-zero grads and the
        # optimizer zeroes their updates anyway — skip their (n_global, C)
        # scatter + psum rather than all-reducing guaranteed zeros over ICI
        # every step (xyz alone is capacity x 3 f32 per step at scale)
        g_pts = {k: (sync(g) if tcfg.grad_switch(k) else g)
                 for k, g in g_pts.items()}

        if tcfg.alter_step > 0:
            phase = (step // tcfg.alter_step) % 3
            net_scale = (phase == 0).astype(jnp.float32)
            pts_scale = (phase == 1).astype(jnp.float32)
        else:
            net_scale = pts_scale = jnp.asarray(1.0)

        up_net, os_net = net_tx.update(g_net, opt_net, params)
        up_net = jax.tree.map(lambda u: u * net_scale, up_net)
        new_params = optax.apply_updates(params, up_net)

        up_pts, os_pts = pts_tx.update(g_pts, opt_pts, pts)
        up_pts = jax.tree.map(lambda u: u * pts_scale, up_pts)
        new_pts = optax.apply_updates(pts, up_pts)

        new_cloud = _with_points(cloud, new_pts)
        new_scene = dataclasses.replace(
            scene, cloud=jax.tree.map(lambda a: a[None], new_cloud))
        os_pts = jax.tree.map(lambda a: a[None], os_pts)
        grads = ((g_net, jax.tree.map(lambda a: a[None], g_pts))
                 if return_grads else (0, jax.tree.map(
                     lambda a: a[None] * 0, g_pts)))
        return new_params, new_scene, os_net, os_pts, losses, grads

    if batch.get("bg_color") is None:
        batch = dict(batch, bg_color=jnp.ones(3, jnp.float32))
    shard, rep = P("data"), P()
    pixel_label = batch.get("pixel_label")
    if pixel_label is None:
        pixel_label = jnp.zeros(batch["raydir"].shape[:2], jnp.int32)
        if cfg.semantic_guidance:
            raise ValueError("semantic_guidance training needs pixel_label")
    fn = _shard_map(
        body, mesh=mesh,
        in_specs=(rep, shard, rep, shard, rep,
                  rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(rep, shard, rep, shard, rep, (rep, shard)),
        check_vma=False)
    params, scene, os_net, os_pts, losses, grads = fn(
        st.params, st.scene, st.opt_state_net, st.opt_state_pts, st.step,
        batch["campos"], batch["raydir"], batch["camrotc2w"],
        jnp.asarray(batch["near"], jnp.float32),
        jnp.asarray(batch["far"], jnp.float32), batch["bg_color"],
        batch["gt_image"], pixel_label, key)
    new_st = SpatialTrainState(params=params, scene=scene,
                               opt_state_net=os_net, opt_state_pts=os_pts,
                               step=st.step + 1)
    if return_grads:
        return new_st, losses, grads
    return new_st, losses


@partial(jax.jit, static_argnames=("sspec", "cfg", "tcfg", "mesh",
                                   "return_grads", "pspec"))
def _spatial_step_jit(st, sspec, cfg, tcfg, batch, key, mesh,
                      return_grads, pspec):
    return _spatial_train_step_impl(st, sspec, cfg, tcfg, batch, key, mesh,
                                    return_grads=return_grads, pspec=pspec)


def spatial_train_step(st: SpatialTrainState, sspec: SpatialSpec,
                       cfg: RenderConfig, tcfg, batch: Dict[str, Any],
                       key: jax.Array, mesh: Mesh, return_grads: bool = False,
                       pspec=None):
    """Jitted wrapper over _spatial_train_step_impl (docstring there).

    Module-level jit (mesh static) so the trace cache HITS across training
    steps — the old per-call eager shard_map re-traced the whole sharded
    program on every step (round-5 review fix). No donation: callers
    (tests, _sync_from_spatial) may still hold the input state's buffers.
    """
    return _spatial_step_jit(st, sspec, cfg, tcfg, batch, key, mesh,
                             return_grads, pspec)


@partial(jax.jit, static_argnames=("sspec", "cfg", "tcfg", "pspec", "mesh"),
         donate_argnums=(0,))
def _spatial_multi_jit(st, sspec, cfg, tcfg, batches, keys, pspec, mesh):
    def body(s, xs):
        b, k = xs
        s2, losses = _spatial_train_step_impl(s, sspec, cfg, tcfg, b, k,
                                              mesh, pspec=pspec)
        return s2, losses
    return jax.lax.scan(body, st, (batches, keys))


def spatial_train_step_multi(st: SpatialTrainState, sspec: SpatialSpec,
                             cfg: RenderConfig, tcfg,
                             batches: Dict[str, Any], keys: jax.Array,
                             mesh: Mesh, pspec=None):
    """G training steps on a slab-sharded scene in ONE dispatch
    (lax.scan over stacked (G,...) batches — the --steps_per_dispatch
    equivalent of models/train.train_step_multi; per-dispatch host enqueue
    amortizes G-fold, which matters most here because the sharded step
    already pays extra per-dispatch overhead for the shard_map program).
    Numerically matches G sequential spatial_train_step calls with the same
    keys (the scanned program fuses differently, reordering reductions:
    measured drift ~2e-5 on 0.01% of attribute elements).

    The jit is module-level (mesh static) so repeat dispatches hit the
    trace cache — the old per-call `jax.jit(go)` closure re-traced all G
    scanned shard_map steps on EVERY dispatch (round-5 review fix;
    tests/test_spatial.py::test_spatial_train_step_multi_trace_cached).
    Donates `st` like models/train.train_step_multi."""
    return _spatial_multi_jit(st, sspec, cfg, tcfg, batches, keys, pspec,
                              mesh)
