"""The full rendering forward pass: rays -> query -> gather -> aggregate ->
volume march -> output dict.

Functional re-design of `NeuralPointsRayMarching.forward`
(/root/reference/models/neural_points_volumetric_model.py:435-668) plus
`NeuralPoints.forward`'s gather stage (neural_points.py:942-988).

TPU-first deltas:
  * rays are never compacted: a ray whose samples hit no occupied voxel gets
    sigma == 0 everywhere, so background_transmission == 1 and the ray renders
    to bg_color — exactly what the reference's `fill_invalid` scatter
    reconstructs (neural_points_volumetric_model.py:158-195), with no dynamic
    shapes;
  * perspective coords are computed on the gathered K neighbors only, not on
    the full 4.2M-point cloud per step (reference w2pers over self.xyz,
    neural_points.py:762);
  * the whole function jits; randomness is an explicit key.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import w2pers
from ..ops.raygen import find_ray_generation_method
from ..ops.march import (ray_march, ray_dist_from_z, find_render_function,
                         find_blend_function, find_tone_map)
from ..ops.grid import PointGrid
from ..ops.query import query_neighbors
from .aggregator import AggregatorConfig, aggregate
from .point_cloud import NeuralPointCloud


@jax.custom_vjp
def gather_rows(table, idx):
    """table[(N,C)][idx] with a sort+segment_sum backward.

    XLA's gather transpose is a scatter-add that serializes on duplicate
    indices — and neighbor indices repeat heavily (adjacent shading points
    share neighbors). Sorting the cotangent rows by index and segment-summing
    turns the collision-heavy scatter into a sort + a clean reduction."""
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(res, g):
    idx, n = res
    flat_idx = idx.reshape(-1)
    # accumulate in f32: a bf16 table means bf16 cotangents, and duplicate
    # neighbor ids sum ~100s of contributions — XLA's native transpose
    # scatter-adds them in bf16, this path gets f32 accumulation for free
    flat_g = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    order = jnp.argsort(flat_idx)
    dt = jax.ops.segment_sum(flat_g[order], flat_idx[order], num_segments=n,
                             indices_are_sorted=True)
    return dt.astype(g.dtype), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def gather_rows_f32acc(table, idx):
    """table[(N,C)][idx] whose transpose scatter-adds in f32.

    The default path scatter-adds the cotangent in the TABLE's dtype — for a
    bf16 attribute table that sums hundreds of duplicate-id contributions at
    8-bit mantissa. Casting the cotangent up front costs one elementwise pass
    and buys f32 accumulation (rounded to table dtype once at the end)."""
    return table[idx]


def _gather_rows_f32acc_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_f32acc_bwd(res, g):
    idx, n = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    dt = jnp.zeros((n, g.shape[-1]), jnp.float32).at[flat_idx].add(flat_g)
    return dt.astype(g.dtype), None


gather_rows_f32acc.defvjp(_gather_rows_f32acc_fwd, _gather_rows_f32acc_bwd)


def make_gather_rows_dedup(T_rows: int, U: int):
    """Gather whose transpose DEDUPLICATES cotangent rows before the
    scatter-add.

    probe_bwd_split2: the scatter transpose is 19.2 ms of the 40.2 ms
    train step, ~97 ns per scattered row; probe_scatter_char: a training
    ray's 192 neighbor rows hold only ~35 distinct point ids (max 57).
    The transpose therefore: (1) sorts ids within tiles of `T_rows`
    consecutive rows (per-ray tiles: T_rows = SR*K), (2) extracts the
    first `U` distinct ids per tile (top_k on first-occurrence flags — no
    scatter), (3) sums each tile's duplicate contributions into its slot
    with an exact one-hot MXU matmul (bf16 1.0*v products under f32
    accumulation — the fused-KNN redistribute precedent), and (4)
    scatter-adds only tiles*U aggregated rows.

    Within-tile duplicates accumulate in f32 (BETTER than the plain
    transpose, which scatter-adds every row in table dtype). EXACTNESS
    CAVEAT: a tile with more than U distinct ids drops the gradient rows
    past rank U. Compute `dedup_overflow_count` on the forward indices and
    keep U at ~2x the observed max (57 at the canonical train config).
    """

    U = min(U, T_rows)

    @jax.custom_vjp
    def gather(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], (idx, table.shape[0])

    def bwd(res, g):
        idx, n = res
        C = g.shape[-1]
        flat_idx = idx.reshape(-1)
        M = flat_idx.shape[0]
        assert M % T_rows == 0, (M, T_rows)
        NT = M // T_rows
        ids2 = flat_idx.reshape(NT, T_rows)
        g2 = g.reshape(NT, T_rows, C)

        s = jnp.sort(ids2, axis=1)
        first = jnp.concatenate(
            [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
        pos = jnp.arange(T_rows, dtype=jnp.int32)
        score = jnp.where(first, T_rows - pos, -1)
        _, topp = jax.lax.top_k(score, U)            # first U first-occ pos
        ok = jnp.take_along_axis(score, topp, axis=1) > 0
        uniq = jnp.where(ok, jnp.take_along_axis(s, topp, axis=1), n)

        # rank of each original id among the tile's ascending uniques
        inv = jax.vmap(lambda u, q: jnp.searchsorted(u, q))(uniq, ids2)
        invc = jnp.clip(inv, 0, U - 1)
        hit = jnp.take_along_axis(uniq, invc, axis=1) == ids2

        # one-hot in the cotangent's own dtype: bf16 in the real path
        # (1.0*v products are exact under f32 accumulation), f32 when the
        # caller differentiates in f32 — never DOWN-cast the cotangent
        onehot = (jax.nn.one_hot(invc, U, dtype=g.dtype)
                  * hit[..., None].astype(g.dtype))        # (NT,T,U)
        agg = jnp.einsum("ntu,ntc->nuc", onehot, g2,
                         preferred_element_type=jnp.float32)
        tgt = jnp.clip(uniq, 0, n - 1).reshape(-1)
        dt = jnp.zeros((n, C), g.dtype).at[tgt].add(
            agg.reshape(-1, C).astype(g.dtype))
        return dt, None

    gather.defvjp(fwd, bwd)
    return gather


def make_gather_rows_batchdedup(U_cap: int):
    """Gather whose transpose aggregates the WHOLE BATCH's duplicate
    cotangent rows before touching the big table.

    4.2M split (probe_bwd_split_42m): the pts-grad transpose is 46.8 ms of
    the 68.4 ms step — a 196k-row scatter-add into the 4.2M-row bf16 table.
    A 1024-ray batch's 196k neighbor rows hold only ~74k distinct ids, and
    probe_scatter_size measured the staged transpose (sort -> distinct
    ranks -> compact f32 scatter -> ONE U_cap-row scatter into the big
    table) at 55.6 ms vs 75.0 isolated. Unlike raydedup (per-ray tiles,
    U<=192 loses exactness at 4.2M), the dedup domain here is the full
    batch, so U_cap carries a ~1.8x margin over the observed distinct
    count and overflow is DETECTED (n_uniq - U_cap rows drop, count
    surfaced via `gvjp_overflow` in the losses dict — keep it 0).

    Bonus: within-batch duplicates accumulate in f32 (the plain transpose
    scatter-adds every row in bf16)."""

    @jax.custom_vjp
    def gather(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], (idx, table.shape[0])

    def bwd(res, g):
        idx, n = res
        C = g.shape[-1]
        flat_idx = idx.reshape(-1)
        flat_g = g.reshape(-1, C).astype(jnp.float32)
        s = jnp.sort(flat_idx)
        first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        rank_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
        # uniq[r] = the id with rank r (duplicate writes carry equal values);
        # ranks past U_cap (overflow) drop here and in the compact scatter —
        # batchdedup_overflow_count diagnoses them forward-side
        uniq = jnp.full((U_cap,), n, jnp.int32).at[rank_sorted].set(
            s, mode="drop")
        # rank of each ORIGINAL row (uniq ascending by construction; slots
        # past n_uniq hold the sentinel n > every id)
        rank = jnp.searchsorted(uniq, flat_idx)
        compact = jnp.zeros((U_cap, C), jnp.float32).at[rank].add(
            flat_g, mode="drop")
        dt = jnp.zeros((n, C), g.dtype).at[uniq].add(
            compact.astype(g.dtype), mode="drop")
        return dt, None

    gather.defvjp(fwd, bwd)
    return gather


def batchdedup_overflow_count(sample_pidx: jnp.ndarray,
                              U_cap: int) -> jnp.ndarray:
    """Distinct ids beyond gather_vjp='batchdedup's U_cap (their gradient
    rows drop). Forward-side diagnostic — keep it 0."""
    s = jnp.sort(jnp.clip(sample_pidx.reshape(-1), 0, None))
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    n_uniq = jnp.sum(first.astype(jnp.int32))
    return jnp.maximum(n_uniq - U_cap, 0)


def dedup_overflow_count(sample_pidx: jnp.ndarray, T_rows: int,
                         U: int) -> jnp.ndarray:
    """Number of neighbor rows whose gradient the dedup'd transpose would
    drop (distinct-id rank >= U within a T_rows tile). Cheap forward-side
    diagnostic for gather_vjp='raydedup' — keep it 0."""
    flat = sample_pidx.reshape(-1)
    M = flat.shape[0]
    if M % T_rows:
        return jnp.asarray(-1, jnp.int32)
    ids2 = jnp.clip(flat, 0, None).reshape(M // T_rows, T_rows)
    s = jnp.sort(ids2, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    return jnp.sum((rank >= U).astype(jnp.int32))


def dedup_tile_gather(packed: jnp.ndarray, pid: jnp.ndarray,
                      T_rays: int, U: int):
    """Two-level attribute gather for RASTER ray blocks: gather each tile's
    DISTINCT point rows once from the big table, then reconstruct the
    per-neighbor block with an exact one-hot MXU matmul.

    probe_attr2/3/4 (4.2M points): the plain (B*R*SR*K)-row gather costs
    ~84 ms/chunk — per-row cost scales with table BYTES — while a raster
    chunk's 1.77M neighbor rows hold only ~6.7k distinct ids (0.57%), and
    a 64-ray tile <= 491 (cap U=512 is exact there). Primitives chosen by
    probe_attr4: per-tile sort + cumsum rank (no top_k at large k), uniq
    via U-query searchsorted on the nondecreasing rank, inverse rank via a
    fused pairwise reduction (never a per-row searchsorted/scatter), and a
    one-hot redistribute whose 1.0*v products are exact under f32
    accumulation (the fused-KNN dedup precedent, ops/fused_knn.py).

    packed: (N, W) attribute table (any dtype; bf16 recommended — the
    one-hot operand materializes at (NT, T_rows, U) in packed's dtype).
    pid: (B, R, SR, K) int32, already clipped to [0, N).
    Returns (g (B,R,SR,K,W) f32, hit (B,R,SR,K) bool). hit=False marks
    rows whose tile overflowed U distinct ids (degrade them to "no
    neighbor", like the KNN dedup_cap) — keep U at ~2x the observed max.
    """
    B, R, SR, K = pid.shape
    n = packed.shape[0]
    W = packed.shape[1]
    assert (B * R) % T_rays == 0, (B, R, T_rays)
    NT = (B * R) // T_rays
    TW = T_rays * SR * K
    U = min(U, TW)

    ids2 = pid.reshape(NT, TW)
    s = jnp.sort(ids2, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    # uniq[u] = s at the first position with rank == u (rank nondecreasing)
    posu = jax.vmap(lambda r: jnp.searchsorted(
        r, jnp.arange(U, dtype=jnp.int32)))(rank)            # (NT, U)
    oku = posu < TW
    uniq = jnp.where(
        oku, jnp.take_along_axis(s, jnp.clip(posu, 0, TW - 1), axis=1), n)
    # inverse rank: #uniq entries < id (uniq ascending, fused reduction)
    inv = jnp.sum((uniq[:, None, :] < ids2[:, :, None]),
                  axis=2).astype(jnp.int32)                  # (NT, TW)
    invc = jnp.clip(inv, 0, U - 1)
    hit = jnp.take_along_axis(uniq, invc, axis=1) == ids2

    rows = packed[jnp.clip(uniq.reshape(-1), 0, n - 1)].reshape(NT, U, W)
    onehot = (jax.nn.one_hot(invc, U, dtype=packed.dtype)
              * hit[..., None].astype(packed.dtype))         # (NT, TW, U)
    g = jnp.einsum("ntu,nuc->ntc", onehot, rows,
                   preferred_element_type=jnp.float32)
    return (g.reshape(B, R, SR, K, W),
            hit.reshape(B, R, SR, K))


@jax.custom_vjp
def gather_rows_int8(table, idx, active):
    """Training-forward attribute gather through a per-channel affine int8
    quantization of the table (straight-through estimator).

    Forward: quantize the f32 master to int8 (per-channel scale/zero from
    ACTIVE rows — ops/quant.quantize_table_int8), gather int8 rows (half
    the bf16 table bytes; the gather is table-byte-bound, probe_attr2),
    dequantize to f32 after the gather. Backward: identical to the shipped
    bf16 path's transpose — bf16 cotangent scatter-add + one dense upcast —
    so the A/B isolates the FORWARD gather (VERDICT-r3 item 2). The f32
    master is untouched; gradients apply to it."""
    from ..ops.quant import quantize_table_int8
    q, scale, zero = quantize_table_int8(table, active)
    return q[idx].astype(jnp.float32) * scale + zero


def _gather_rows_int8_fwd(table, idx, active):
    return gather_rows_int8(table, idx, active), (idx, table.shape[0])


def _gather_rows_int8_bwd(res, g):
    idx, n = res
    flat_idx = idx.reshape(-1)
    C = g.shape[-1]
    flat_g = g.reshape(-1, C).astype(jnp.bfloat16)
    dt = jnp.zeros((n, C), jnp.bfloat16).at[flat_idx].add(flat_g)
    return dt.astype(jnp.float32), None, None


gather_rows_int8.defvjp(_gather_rows_int8_fwd, _gather_rows_int8_bwd)


def make_gather_rows_spread(J: int, K: int):
    """gather whose transpose spreads the scatter over J table copies.

    XLA's TPU scatter-add serializes colliding rows, and neighbor ids
    collide heavily (adjacent shading points share neighbors). Routing
    contribution row i to copy (i//K) % J — consecutive SHADING POINTS
    rotate copies, decorrelating the most collision-prone rows — cuts the
    collision depth ~J-fold; a (J,N,C) sum afterwards is a dense reduce at
    HBM speed. Exact up to float summation order; accumulates f32.
    Memory: J*N*C f32 transient (size the J to the scene)."""

    @jax.custom_vjp
    def gather(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], (idx, table.shape[0])

    def bwd(res, g):
        idx, n = res
        C = g.shape[-1]
        flat_idx = idx.reshape(-1)
        flat_g = g.reshape(-1, C).astype(jnp.float32)
        m = flat_idx.shape[0]
        lane = (jnp.arange(m, dtype=jnp.int32) // K) % J
        tgt = lane * n + flat_idx
        dt = jnp.zeros((J * n, C), jnp.float32).at[tgt].add(flat_g)
        return jnp.sum(dt.reshape(J, n, C), axis=0).astype(g.dtype), None

    gather.defvjp(fwd, bwd)
    return gather


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render/query configuration (canonical ScanNet values from
    dev_scripts/myexp_scannet_colmap/scene0241_02_semanticGuidance.sh)."""
    agg: AggregatorConfig = AggregatorConfig()
    z_depth_dim: int = 400           # raw samples per ray (D)
    SR: int = 24                     # shading points per ray
    K: int = 8                       # neighbors per shading point
    vsize: Tuple[float, float, float] = (0.008, 0.008, 0.008)
    radius_limit_scale: float = 4.0
    which_ray_generation: str = "near_far_linear"
    which_render_func: str = "radiance"
    which_blend_func: str = "alpha"
    which_tonemap_func: str = "off"
    raydist_mode_unit: int = 1
    semantic_guidance: int = 0
    predict_semantic: int = 0
    jitter: float = 0.3              # train-time sample jitter fraction
    domain_size: float = 1.0         # cube raygen half-extent
    knn_mode: str = "exact"          # "approx" = lax.approx_max_k KNN;
    #                                  "fused" = Pallas select over gathered
    #                                  cache rows (ops/fused_knn.py);
    #                                  "dedup" = fused + per-tile unique-row
    #                                  gather (raster-adjacent rays share
    #                                  voxels; NOT for shuffled train rays)
    dedup_tile: int = 64             # rays per dedup tile (consecutive)
    dedup_cap: int = 160             # max distinct cache rows per tile
    shpnt_jitter: str = "passfunc"   # perspective-path train-time shading-
    #                                  point depth jitter (reference
    #                                  query_point_indices.py:96,116-126;
    #                                  the world-coords path never applies
    #                                  it): "uniform" | "gaussian" | off
    gather_dtype: str = "float32"    # "bfloat16" halves attribute-gather
    #                                  traffic (compute stays f32); "int8"
    #                                  quarter-width per-channel affine
    #                                  quantization for the TRAINING forward
    #                                  gather only (gather_rows_int8; eval
    #                                  renders fall back to bf16)
    compute_depth: int = 0           # emit coarse_depth (alpha-blend-weighted
    #                                  mean sample depth). The reference gates
    #                                  this on compute_depth OR depth_loss_items
    #                                  (neural_points_volumetric_model.py:211)
    #                                  but its body references an undefined
    #                                  `ray_ts` (:623) — dead code inherited
    #                                  from Point-NeRF, where ray_ts is the
    #                                  per-sample t. We use camera-space z of
    #                                  each shading point (= Point-NeRF's t
    #                                  for its z-linear sampling).
    gather_vjp: str = "scatter"      # attribute-gather transpose: "scatter"
    #                                  = XLA's native scatter-add; "sorted" =
    #                                  sort cotangent rows by point id +
    #                                  segment_sum (gather_rows above) — the
    #                                  round-1 A/B at 1024 rays lost, but the
    #                                  fused backward since removed most other
    #                                  step cost, so the scatter fraction grew;
    #                                  "f32" = scatter-add with f32
    #                                  accumulation (one up-cast pass);
    #                                  "spread" = f32 + collision spreading
    #                                  over spread_J table copies (see
    #                                  make_gather_rows_spread)
    spread_J: int = 4                # table copies for gather_vjp="spread"
    #                                  (J*N*C f32 transient; 4 => ~0.7 GB at
    #                                  1M points, ~2.8 GB at 4.2M)
    gvjp_rows: int = 0               # gather_vjp="raydedup": rows per dedup
    #                                  tile (0 = SR*K, one ray)
    gvjp_U: int = 128                # ... distinct-id slots per tile (2.2x
    #                                  the max 57 measured at the canonical
    #                                  train config; dedup_overflow_count
    #                                  diagnoses a too-small U)
    gvjp_batch_U: int = 0            # gather_vjp="batchdedup": distinct-id
    #                                  slots for the WHOLE batch (0 = auto
    #                                  2/3 of the row count — ~1.8x the
    #                                  ~74k distinct ids of a 1024-ray
    #                                  batch at 4.2M); overflow drops rows
    #                                  and is surfaced via gvjp_overflow
    attr_dedup: int = 0              # EVAL renders: distinct-id slots per
    #                                  attr-dedup tile (dedup_tile_gather);
    #                                  0 = plain gather. For RASTER chunks
    #                                  (render_image) — 64-ray tiles hold
    #                                  <=491 distinct ids at 4.2M (cap 512
    #                                  exact); random/shuffled rays overflow
    attr_tile: int = 64              # rays per attr-dedup tile
    gather_round: str = "nearest"    # bf16 table rounding: "stochastic"
    #                                  makes the quantized attribute table an
    #                                  unbiased estimator of the f32 master
    #                                  (ops/quant.py) — recovers the 0.5 dB
    #                                  the nearest-rounded cast costs when
    #                                  TRAINING through the bf16 gather.
    #                                  Train-time only (needs a key; eval
    #                                  renders stay deterministic).

    @property
    def radius_limit(self) -> float:
        return self.radius_limit_scale * max(self.vsize[0], self.vsize[1])


def draw_render_noise(key: jax.Array, cfg: "RenderConfig", B: int, R: int, *,
                      grid=None, guidance: bool = False,
                      perspective: bool = False, is_train: bool = True,
                      dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Pre-draw every random tensor the render forward would draw from
    `key`, replaying render_rays[_perspective]'s exact split/draw sequence
    — the results are bit-identical to the in-place draws.

    This exists for the ray-DP shard_map path (parallel/sharded.py): per-ray
    randomness must be drawn OUTSIDE the mapped region at global shape (and
    sharded like the rays) or each shard would draw identical, cross-shard-
    correlated bits; drawing here keeps sharded == unsharded runs exact.
    The returned dict is render_rays' `noise` argument:
      raygen_u (B,R,D)      sample-depth jitter uniforms (train, jitter>0)
      guide_u  (B,R,SR,...) semantic-guidance acceptance uniforms
      shade_u  (B,R,SR)     perspective shading-point jitter draw
      kg       key          table-shaped draws (stochastic rounding) stay
                            key-driven: replicated shape -> identical bits
                            on every shard with no pre-draw needed
    """
    kj, ks, kg = jax.random.split(key, 3)
    noise: Dict[str, jax.Array] = {}
    D = cfg.z_depth_dim
    if is_train and cfg.jitter > 0:
        if cfg.which_ray_generation == "cube":
            noise["raygen_u"] = jax.random.uniform(
                kj, (B, R, D), dtype, -1.0, 1.0)
        else:
            noise["raygen_u"] = jax.random.uniform(kj, (B, R, D), dtype)
    if perspective:
        ks, ksj = jax.random.split(ks)
        if is_train and cfg.shpnt_jitter == "uniform":
            noise["shade_u"] = jax.random.uniform(ksj, (B, R, cfg.SR))
        elif is_train and cfg.shpnt_jitter == "gaussian":
            noise["shade_u"] = jax.random.normal(ksj, (B, R, cfg.SR))
    elif guidance:
        assert grid is not None
        spec = grid.spec
        if spec.nbr_cache > 0 and grid.nbr_packed.shape[0] > 0:
            # candidate count C == spec.nbr_cache (unpack_cache derives the
            # same from the packed row width / cache-dtype lane count)
            shape = (B, R, cfg.SR, spec.nbr_cache)
        else:
            kv = (spec.kernel_size[0] * spec.kernel_size[1]
                  * spec.kernel_size[2])
            shape = (B, R, cfg.SR, kv, spec.P)
        noise["guide_u"] = jax.random.uniform(ks, shape)
    noise["kg"] = kg
    return noise


@partial(jax.jit, static_argnames=("cfg", "is_train", "prob"))
def render_rays(params: Dict[str, Any], cloud: NeuralPointCloud,
                grid: PointGrid, cfg: RenderConfig, *,
                campos: jnp.ndarray,        # (B,3)
                raydir: jnp.ndarray,        # (B,R,3)
                camrotc2w: jnp.ndarray,     # (B,3,3)
                near: float, far: float,
                bg_color: Optional[jnp.ndarray] = None,   # (3,)
                pixel_label: Optional[jnp.ndarray] = None,  # (B,R) int
                key: Optional[jax.Array] = None,
                noise: Optional[Dict[str, jax.Array]] = None,
                is_train: bool = False,
                prob: bool = False) -> Dict[str, jnp.ndarray]:
    B, R, _ = raydir.shape
    agg = cfg.agg

    use_sem = (bool(cfg.semantic_guidance) and is_train
               and pixel_label is not None)
    if noise is None and key is not None:
        noise = draw_render_noise(key, cfg, B, R, grid=grid,
                                  guidance=use_sem, is_train=is_train,
                                  dtype=raydir.dtype)
    noise = noise or {}

    raygen = find_ray_generation_method(cfg.which_ray_generation)
    raypos, _, _, ray_ts = raygen(
        campos, raydir, cfg.z_depth_dim, near=near, far=far,
        jitter=cfg.jitter if is_train else 0.0, u=noise.get("raygen_u"),
        domain_size=cfg.domain_size)
    # lazy-position compaction: positions recomputed from (campos, dir, t)
    # only for selected samples, bit-identical to the raypos gathers but
    # -4.4 ms/chunk (probe_mask_lazy). Only valid when raypos really is
    # campos + t*dir — the cube raygen clips rays to an AABB instead.
    lazy_ok = cfg.which_ray_generation in ("near_far_linear",
                                           "near_far_disparity_linear",
                                           "nerf_near_far_linear",
                                           "nerf_near_far_disparity_linear")

    q = query_neighbors(
        grid, cloud.xyz, raypos, K=cfg.K, SR=cfg.SR,
        radius_limit=cfg.radius_limit,
        ray_label=pixel_label if use_sem else None,
        points_label=cloud.label if use_sem else None,
        points_label_prob=cloud.label_prob if use_sem else None,
        key=None, semantic_guidance=use_sem, knn_mode=cfg.knn_mode,
        dedup_tile=cfg.dedup_tile, dedup_cap=cfg.dedup_cap,
        campos=campos if lazy_ok else None,
        raydir=raydir if lazy_ok else None,
        tvals=ray_ts if lazy_ok else None,
        guide_u=noise.get("guide_u"))

    return _shade_and_march(params, cloud, cfg, q.sample_pidx,
                            q.sample_loc_w, q.ray_mask, campos, raydir,
                            camrotc2w, bg_color, prob,
                            key=noise.get("kg") if is_train else None,
                            is_train=is_train)


def gather_and_aggregate(params, cloud, cfg, sample_pidx, sample_loc_w,
                         campos, raydir, camrotc2w, key=None,
                         fuse_march=False, is_train=False):
    """Neighbor-attribute gather + per-neighbor MLP aggregation (everything
    between the query and the volume march). Shared by the single-device
    paths below and by the spatially-sharded renderer (parallel/spatial.py),
    where each chip runs it on its LOCAL point shard and the decoded
    features are psummed before marching.

    `is_train` MUST be passed explicitly by every differentiable caller:
    the eval-only attr_dedup gather is gated on it (NOT on `key is None` —
    the spatial training forward legitimately runs keyless, and random
    training-ray tiles overflow the distinct-id cap, which would silently
    corrupt gradients).

    Returns (decoded (B,R,SR,4), ray_valid (B,R,SR), weight (B,R,SR,K),
    conf_coefficient, sample_loc (perspective coords), sampled dict for the
    prob-mode growing probes)."""
    B, R, _ = raydir.shape
    agg = cfg.agg
    sample_pnt_mask = sample_pidx >= 0
    pid = jnp.clip(sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)

    # ONE fused gather of all per-point attributes (separate gathers pay the
    # TPU per-row gather cost five times over)
    F = cloud.embedding.shape[-1]
    packed = jnp.concatenate(
        [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf]
        + ([cloud.sem_embedding] if cfg.semantic_guidance else []), axis=-1)
    # int8 is a TRAINING-forward option (gather is table-byte-bound; the
    # raster-only tile-dedup cannot apply to random training rays); eval
    # renders under gather_dtype=int8 use the bf16 table for quality
    use_int8 = cfg.gather_dtype == "int8" and is_train
    if cfg.gather_dtype == "bfloat16" or (cfg.gather_dtype == "int8"
                                          and not is_train):
        if cfg.gather_round == "stochastic" and key is not None:
            # train-time: unbiased quantization of the attribute table
            # (E[table] == f32 master) so optimizing through the bf16
            # gather sees zero-mean noise, not a systematic bias
            from ..ops.quant import stochastic_round_bf16
            packed = stochastic_round_bf16(packed, key)
        else:
            packed = packed.astype(jnp.bfloat16)
    # NOTE: gather_rows (sort+segment_sum backward) measured SLOWER than the
    # default scatter-add transpose at 1024-ray batches (137.5 vs 128 ms
    # train step) — plain gather kept; revisit at larger batches (NEXT.md)
    # The barrier pins ONE materialization of the gathered block: without
    # it XLA duplicates the (1.8M-row) gather into each downstream slice's
    # fusion (measured: stage-4 marginal 58 ms vs 15 ms for the same math
    # on pre-materialized inputs, probe_shading.py)
    # NOTE a "deep bf16" variant (keep the gathered features bf16 through
    # the PE/concat assembly and inter-layer activations) measured SLOWER
    # than f32 buffers + bf16 matmuls (59.8k vs 62.8k rays/s): bf16 arrays
    # tile as (16,128) and the relayouts cost more than the halved HBM
    # traffic saves. Compute stays f32 outside the matmuls.
    attr_overflow = None
    gvjp_overflow = None
    if (cfg.attr_dedup > 0 and not is_train
            and (B * R) % cfg.attr_tile == 0):
        # eval raster chunks: two-level dedup'd gather; rows whose tile
        # overflows attr_dedup distinct ids degrade to "no neighbor"
        g, hit = dedup_tile_gather(packed, pid, cfg.attr_tile,
                                   cfg.attr_dedup)
        attr_overflow = jnp.sum(
            (sample_pnt_mask & ~hit).astype(jnp.int32))
        sample_pnt_mask = sample_pnt_mask & hit
        g = jax.lax.optimization_barrier(g)
    else:
        if use_int8:
            # int8 carries its OWN transpose (the bf16-scatter equivalent
            # of the default); composing it with a gather_vjp variant is
            # rejected at option-parse time (configs_from_opt)
            assert cfg.gather_vjp == "scatter", \
                "gather_dtype=int8 requires gather_vjp=scatter"
            take = None
        elif cfg.gather_vjp == "sorted":
            take = gather_rows
        elif cfg.gather_vjp == "f32":
            take = gather_rows_f32acc
        elif cfg.gather_vjp == "spread":
            take = make_gather_rows_spread(cfg.spread_J, cfg.K)
        elif cfg.gather_vjp == "batchdedup":
            rows = B * R * cfg.SR * cfg.K
            U_cap = cfg.gvjp_batch_U or max(4096, rows * 2 // 3)
            take = make_gather_rows_batchdedup(U_cap)
            if is_train:
                gvjp_overflow = batchdedup_overflow_count(pid, U_cap)
        elif cfg.gather_vjp == "raydedup":
            T_rows = cfg.gvjp_rows or cfg.SR * cfg.K
            take = make_gather_rows_dedup(T_rows, cfg.gvjp_U)
            if is_train:
                # forward-side diagnostic: rows whose gradient the dedup'd
                # transpose will DROP (distinct-id rank >= gvjp_U in a
                # tile). Surfaced into the losses dict so the training
                # loop's periodic prints show a nonzero count the moment a
                # config change (larger SR/K, different sampling) makes the
                # raydedup transpose lossy.
                gvjp_overflow = dedup_overflow_count(pid, T_rows, cfg.gvjp_U)
        else:
            take = lambda t, i: t[i]
        if use_int8:
            g = jax.lax.optimization_barrier(
                gather_rows_int8(packed, pid, cloud.active))
        else:
            g = jax.lax.optimization_barrier(
                take(packed, pid)).astype(jnp.float32)
    sampled_xyz = g[..., 0:3]
    sampled_embedding = g[..., 3:3 + F]
    sampled_color = g[..., 3 + F:6 + F]
    sampled_dir = g[..., 6 + F:9 + F]
    sampled_conf = g[..., 9 + F:10 + F]
    sampled_sem = g[..., 10 + F:] if cfg.semantic_guidance else None

    # zero out padding gathers so masked rows stay finite (each in its own
    # dtype: a f32 mask would promote the bf16 embedding path back to f32)
    sampled_xyz = sampled_xyz * sample_pnt_mask[..., None].astype(
        sampled_xyz.dtype)
    sampled_embedding = sampled_embedding * sample_pnt_mask[..., None].astype(
        sampled_embedding.dtype)

    # perspective coords per batch camera (vmapped over B)
    pers = jax.vmap(w2pers)(
        sampled_xyz.reshape(B, -1, 3), camrotc2w, campos).reshape(
            sampled_xyz.shape)
    sample_loc = jax.vmap(w2pers)(
        sample_loc_w.reshape(B, -1, 3), camrotc2w, campos).reshape(
            sample_loc_w.shape)

    sample_ray_dirs = jnp.broadcast_to(
        raydir[:, :, None, :], (B, R, cfg.SR, 3))

    # edited scenes: per-part rotation table (T,3,3) + per-point row index
    # (the reference gathers a dense per-point (N,3,3) Rw2c,
    # point_aggregators.py:568; here it's one int per neighbor + a take
    # from a tiny table)
    rot = cloud.Rw2c
    if rot.ndim == 3:
        rot = rot[cloud.rot_idx[pid]]                 # (B,R,SR,K,3,3)

    march = None
    if fuse_march:
        # the march consumes per-sample dists computable pre-aggregation
        rv = jnp.any(sample_pnt_mask, axis=-1)
        march = {"ray_dist": ray_dist_from_z(
            sample_loc[..., 2], rv, cfg.vsize[2], cfg.raydist_mode_unit)}

    decoded, ray_valid, weight, conf_coefficient = aggregate(
        params, agg,
        sampled_embedding=sampled_embedding,
        sampled_color=sampled_color,
        sampled_dir=sampled_dir,
        sampled_conf=sampled_conf,
        sampled_label_embedding=sampled_sem,
        sampled_xyz=sampled_xyz,
        sampled_xyz_pers=pers,
        sample_pnt_mask=sample_pnt_mask,
        sample_loc=sample_loc,
        sample_loc_w=sample_loc_w,
        sample_ray_dirs=sample_ray_dirs,
        Rw2c=rot,
        vsize=cfg.vsize,
        march=march)

    sampled = {"xyz": sampled_xyz, "embedding": sampled_embedding,
               "color": sampled_color, "dir": sampled_dir,
               "conf": sampled_conf}
    if attr_overflow is not None:
        sampled["attr_dedup_overflow"] = attr_overflow
    if gvjp_overflow is not None:
        sampled["gvjp_overflow"] = gvjp_overflow
    return (decoded, ray_valid, weight, conf_coefficient, sample_loc,
            sampled)


def _shade_and_march(params, cloud, cfg, sample_pidx, sample_loc_w, ray_mask,
                     campos, raydir, camrotc2w, bg_color, prob, key=None,
                     is_train=False):
    """Everything downstream of the neighbor query: gather -> aggregate ->
    march -> outputs (shared by the world- and perspective-space paths)."""
    B, R, _ = raydir.shape
    # fully-fused eval render (--fused_march): shading + march in one Pallas
    # kernel; eval-only (train/prob need the per-sample outputs) and gated
    # to the canonical radiance/alpha/off tail the kernel implements
    fuse_march = (cfg.agg.fused_march and not is_train and not prob
                  and cfg.which_render_func == "radiance"
                  and cfg.which_blend_func == "alpha"
                  and cfg.which_tonemap_func == "off"
                  and cfg.agg.act_super > 0)
    (decoded, ray_valid, weight, conf_coefficient, sample_loc,
     sampled) = gather_and_aggregate(params, cloud, cfg, sample_pidx,
                                     sample_loc_w, campos, raydir, camrotc2w,
                                     key=key, fuse_march=fuse_march,
                                     is_train=is_train)
    if isinstance(decoded, dict):                 # in-kernel march engaged
        out4 = decoded["march"]                   # (B,R,4) [color | bgT]
        bg = jnp.asarray(bg_color, out4.dtype).reshape(-1, 1, 3)
        return {
            "coarse_raycolor": out4[..., :3] + bg * out4[..., 3:],
            "coarse_is_background": out4[..., 3:],
            "queried_shading": jnp.broadcast_to(
                jnp.logical_not(jnp.any(ray_valid, axis=-1, keepdims=True)
                                ).astype(jnp.float32), (B, R, 3)),
            "ray_mask": ray_mask,
            "ray_valid": ray_valid,
            **({"attr_dedup_overflow": sampled["attr_dedup_overflow"]}
               if "attr_dedup_overflow" in sampled else {}),
        }
    sampled_xyz, sampled_embedding = sampled["xyz"], sampled["embedding"]
    sampled_color, sampled_dir = sampled["color"], sampled["dir"]
    sampled_conf = sampled["conf"]

    ray_dist = ray_dist_from_z(
        sample_loc[..., 2], ray_valid, cfg.vsize[2], cfg.raydist_mode_unit)

    render_func = find_render_function(cfg.which_render_func)
    blend_func = find_blend_function(cfg.which_blend_func)
    tone_map = find_tone_map(cfg.which_tonemap_func)

    (ray_color, point_color, opacity, acc_transmission, blend_weight,
     background_transmission, _) = ray_march(
        ray_dist, ray_valid, decoded, render_func, blend_func, bg_color)
    ray_color = tone_map(ray_color)

    output: Dict[str, jnp.ndarray] = {
        "coarse_raycolor": ray_color,                       # (B,R,3)
        "coarse_point_opacity": opacity,                    # (B,R,SR)
        "coarse_is_background": background_transmission,    # (B,R,1)
        "queried_shading": jnp.broadcast_to(
            jnp.logical_not(jnp.any(ray_valid, axis=-1, keepdims=True)
                            ).astype(jnp.float32), (B, R, 3)),
        "ray_mask": ray_mask,                             # (B,R) bool
        "ray_valid": ray_valid,
        **({"attr_dedup_overflow": sampled["attr_dedup_overflow"]}
           if "attr_dedup_overflow" in sampled else {}),
        **({"gvjp_overflow": sampled["gvjp_overflow"]}
           if "gvjp_overflow" in sampled else {}),
        "weight": jax.lax.stop_gradient(weight),
        "blend_weight": jax.lax.stop_gradient(blend_weight),
        "conf_coefficient": conf_coefficient,
    }

    if cfg.compute_depth:
        # alpha-blend-weighted mean sample depth (reference return_depth,
        # neural_points_volumetric_model.py:620-624: avg_depth =
        # (w * ray_ts).sum / (w.sum + 1e-6), w = opacity * acc_transmission)
        w = opacity * acc_transmission                       # (B,R,SR)
        z = sample_loc[..., 2]                               # camera-space t
        output["coarse_depth"] = (
            jnp.sum(w * z, axis=-1) / (jnp.sum(w, axis=-1) + 1e-6))

    if prob:
        # point-growing probes (reference :633-668): per ray, stats at the
        # max-opacity shading point
        op = output["coarse_point_opacity"]                  # (B,R,SR)
        max_op = jnp.max(op, axis=-1, keepdims=True)
        ind = jnp.argmax(op, axis=-1)                        # (B,R)
        def take(a):
            idx = ind.reshape(B, R, 1, *([1] * (a.ndim - 3)))
            idx = jnp.broadcast_to(idx, (B, R, 1) + a.shape[3:])
            return jnp.take_along_axis(a, idx, axis=2)[:, :, 0]
        output["ray_max_shading_opacity"] = max_op           # (B,R,1)
        output["ray_max_sample_loc_w"] = take(sample_loc_w)  # (B,R,3)
        wsel = take(weight * conf_coefficient)[..., None]    # (B,R,K,1)
        xyz_sel = take(sampled_xyz)                          # (B,R,K,3)
        output["ray_max_far_dist"] = jnp.min(
            jnp.linalg.norm(
                xyz_sel - output["ray_max_sample_loc_w"][:, :, None, :],
                axis=-1), axis=-1, keepdims=True)
        output["shading_avg_color"] = jnp.sum(take(sampled_color) * wsel, -2)
        output["shading_avg_dir"] = jnp.sum(take(sampled_dir) * wsel, -2)
        output["shading_avg_conf"] = jnp.sum(take(sampled_conf) * wsel, -2)
        output["shading_avg_embedding"] = jnp.sum(
            take(sampled_embedding) * wsel, -2)

    return output


@partial(jax.jit, static_argnames=("pspec", "cfg", "is_train", "prob"))
def render_rays_perspective(params: Dict[str, Any], cloud: NeuralPointCloud,
                            pspec, cfg: RenderConfig, *,
                            campos, raydir, camrotc2w, near, far,
                            bg_color=None, key=None, noise=None,
                            is_train=False, prob=False):
    """Point-NeRF's original perspective-space query path (wcoord_query=0,
    reference query_point_indices.py): the grid is rebuilt per frame in
    camera perspective space (static frustum spec -> one compile), shading
    then proceeds exactly like the world-space path."""
    from ..ops.query_pers import query_neighbors_perspective
    from ..ops.camera import pers2w

    B, R, _ = raydir.shape
    if noise is None and key is not None:
        noise = draw_render_noise(key, cfg, B, R, perspective=True,
                                  is_train=is_train, dtype=raydir.dtype)
    noise = noise or {}
    raygen = find_ray_generation_method(cfg.which_ray_generation)
    raypos, _, _, _ = raygen(
        campos, raydir, cfg.z_depth_dim, near=near, far=far,
        jitter=cfg.jitter if is_train else 0.0, u=noise.get("raygen_u"))

    res, _ = query_neighbors_perspective(
        cloud.xyz, cloud.active, raypos, camrotc2w, campos, pspec,
        K=cfg.K, SR=cfg.SR, radius_limit=cfg.radius_limit)
    # train-time shading-point depth jitter in perspective space
    # (reference query_point_indices.py:96: uniform +-vsize_z/2, gaussian
    # std vsize_z/4 clamped to +-vsize_z/2, passfunc = identity)
    loc_p = res.sample_loc_w
    shade_u = noise.get("shade_u")
    if is_train and shade_u is not None and cfg.shpnt_jitter in ("uniform",
                                                                 "gaussian"):
        vz = pspec.vsize[2]
        if cfg.shpnt_jitter == "uniform":
            j = (shade_u - 0.5) * vz
        else:
            j = jnp.clip(shade_u * (vz / 4), -vz / 2, vz / 2)
        loc_p = loc_p.at[..., 2].add(
            jnp.where(res.sample_loc_mask, j, 0.0))
    # loc_p holds PERSPECTIVE coords; lift back to world for the shared
    # shading path
    loc_w = pers2w(loc_p.reshape(-1, 3), camrotc2w[0],
                   campos[0]).reshape(loc_p.shape)
    loc_w = jnp.where(res.sample_loc_mask[..., None], loc_w, 0.0)
    return _shade_and_march(params, cloud, cfg, res.sample_pidx, loc_w,
                            res.ray_mask, campos, raydir, camrotc2w,
                            bg_color, prob,
                            key=noise.get("kg") if is_train else None,
                            is_train=is_train)
