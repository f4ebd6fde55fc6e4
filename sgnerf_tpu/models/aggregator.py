"""Point-feature aggregation + shading MLPs ("viewmlp").

Functional re-design of the reference PointAggregator
(/root/reference/models/aggregators/point_aggregators.py):
  * distance kernels (linear / quadric / avg / numlinear / numquadric): :465-514
  * viewmlp decode: :561-786 — per-neighbor PE(feat) ⊕ PE(rotated dist) ->
    block1 -> [⊕ 96-d semantic -> block2_bpnet] -> per-neighbor alpha
    (softplus(x-1)), weight-summed over K; features weight-summed then color
    head with PE(viewdir);
  * conf gradient-clamp: :863-865; weight normalization: :946-947.

TPU-first deltas: the reference flattens to ragged "valid neighbor" rows
(`pnt_mask_flat`); we keep dense (B,R,SR,K,C) blocks and mask by multiply —
dense matmuls map straight onto the MXU and the masked rows are free relative
to the gather they'd otherwise save.

Parameters live in a plain pytree (dict of {"w": (in,out), "b": (out,)}) so
reference checkpoints convert 1:1 (see models/checkpoint_io.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pe import positional_encoding


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    """Static architecture config, mirroring the reference flag surface."""
    point_features_dim: int = 32
    shading_feature_num: int = 256
    shading_feature_mlp_layer1: int = 2
    shading_feature_mlp_layer2: int = 0
    shading_feature_mlp_layer2_bpnet: int = 0
    shading_feature_mlp_layer3: int = 0
    shading_feature_mlp_layer4: int = 0   # yuze variant only (see agg_variant)
    shading_feature_mlp_linear: int = 0   # yuze variant only
    agg_variant: str = "default"     # "yuze": the reference's rotation-
    #                                  invariance aggregator variant
    #                                  (point_aggregators_yuze.py) — active
    #                                  block4 (plane-projected cos-angle
    #                                  features between stored dirs and the
    #                                  viewdir, PE'd), optional block_linear,
    #                                  and the alpha head fed from the
    #                                  PRE-block3 features (feat_branch,
    #                                  yuze :649-651,:719,:737) so density is
    #                                  view/rotation independent. Selected
    #                                  via --which_agg_model viewmlp_yuze
    #                                  (our extension; the reference keeps
    #                                  the variant as an unreachable file).
    shading_alpha_mlp_layer: int = 1
    shading_color_mlp_layer: int = 4
    shading_color_channel_num: int = 3
    num_feat_freqs: int = 3
    dist_xyz_freq: int = 5
    dist_xyz_deno: float = 0.0
    num_viewdir_freqs: int = 4
    agg_dist_pers: int = 20
    agg_distance_kernel: str = "linear"
    agg_intrp_order: int = 2
    agg_weight_norm: int = 1
    act_type: str = "LeakyReLU"
    act_super: int = 1
    predict_semantic: int = 0
    semantic_dim: int = 96
    point_color_mode: str = "1"
    point_dir_mode: str = "1"
    axis_weight: Optional[Tuple[float, float, float]] = None
    sh_degree: int = 4
    sh_act: str = "sigmoid"
    sh_dist_func: str = "sh_quadric"
    compute_dtype: str = "float32"   # "bfloat16" runs the MLP matmuls on the
    #                                  MXU in bf16 with f32 accumulation
    fused_mlp: str = "none"          # "pallas": VMEM-resident fused
    #                                  PE->block1->alpha->K-reduce kernel
    #                                  (ops/fused_agg.py, inference path)
    fused_color: bool = False        # run the color head inside the fused
    #                                  kernel too (only meaningful with
    #                                  fused_mlp="pallas"). Measured -1.3%
    #                                  on TPU vs the XLA color stage
    #                                  (PERFORMANCE.md), so default off;
    #                                  --fused_color on opts in
    fused_bwd: str = "xla"           # backward of the fused kernel: "xla"
    #                                  recomputes the un-fused path, "pallas"
    #                                  runs the fused backward kernel
    #                                  (ops/fused_agg.py _pallas_backward)
    fused_march: bool = False        # eval renders: run the volume march
    #                                  inside the fused kernel too (emits
    #                                  per-ray color directly; reduced
    #                                  output dict — see renderer)

    @property
    def dist_dim(self) -> int:
        if self.agg_dist_pers > 9:
            return 4 if self.agg_dist_pers == 30 else 6
        return 3

    @property
    def dist_xyz_dim(self) -> int:
        if self.dist_xyz_freq == 0:
            return self.dist_dim
        return 2 * abs(self.dist_xyz_freq) * self.dist_dim

    @property
    def block1_in(self) -> int:
        c = self.point_features_dim
        # kernels that consume leading embedding channels (reference :315)
        if self.agg_distance_kernel == "sh_intrp":
            c -= self.sh_degree ** 2
        elif self.agg_distance_kernel == "gau_intrp":
            c -= 7
        c += 2 * self.num_feat_freqs * c if self.num_feat_freqs > 0 else 0
        c += self.dist_xyz_dim if self.agg_intrp_order > 0 else 0
        return c

    @property
    def viewdir_channels(self) -> int:
        return 2 * self.num_viewdir_freqs * 3 if self.num_viewdir_freqs > 0 else 3


def _act(cfg: AggregatorConfig, x):
    if cfg.act_type == "LeakyReLU":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if cfg.act_type == "ReLU":
        return jax.nn.relu(x)
    if cfg.act_type == "ELU":
        return jax.nn.elu(x)
    raise ValueError(f"unknown act_type {cfg.act_type}")


def _linear_init(key, n_in, n_out, gain=1.0, dtype=jnp.float32):
    """xavier_uniform matching the reference init
    (helpers/networks.py:113-124): U(-std*sqrt(3), std*sqrt(3)),
    std = gain*sqrt(2/(n_in+n_out)); bias from torch's default Linear init."""
    kw, kb = jax.random.split(key)
    std = gain * np.sqrt(2.0 / (n_in + n_out))
    w = jax.random.uniform(kw, (n_in, n_out), dtype,
                           -std * np.sqrt(3.0), std * np.sqrt(3.0))
    bound = 1.0 / np.sqrt(n_in)
    b = jax.random.uniform(kb, (n_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _mlp_init(key, sizes, gain_hidden, dtype=jnp.float32):
    """A stack of Linear layers; the reference applies relu/leaky-relu gain to
    every layer followed by an activation (init_seq, networks.py:163-172)."""
    layers = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        gain = gain_hidden if i < len(sizes) - 2 else gain_hidden
        layers.append(_linear_init(keys[i], a, b, gain, dtype))
    return layers


def _mlp_apply(cfg, layers, x, act_last=True):
    bf16 = getattr(cfg, "compute_dtype", "float32") == "bfloat16"
    for i, l in enumerate(layers):
        if bf16:
            x = jnp.dot(x.astype(jnp.bfloat16),
                        l["w"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + l["b"]
        else:
            x = x @ l["w"] + l["b"]
        if act_last or i < len(layers) - 1:
            x = _act(cfg, x)
    return x


def init_aggregator_params(key: jax.Array, cfg: AggregatorConfig,
                           dtype=jnp.float32) -> Dict[str, Any]:
    gain = float(np.sqrt(2.0)) if cfg.act_type == "ReLU" else \
        float(np.sqrt(2.0 / (1 + 0.01 ** 2)))
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    params: Dict[str, Any] = {}
    c = cfg.block1_in
    if cfg.shading_feature_mlp_layer1 > 0:
        sizes = [c] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer1
        params["block1"] = _mlp_init(k1, sizes, gain, dtype)
        c = cfg.shading_feature_num
    if cfg.shading_feature_mlp_layer2 > 0:
        # reference :331-341 / :624-630. Its init adds dist_xyz_dim only
        # when num_feat_freqs == 0 while its forward concatenates dists
        # whenever agg_intrp_order > 0 — i.e. the reference module crashes
        # for layer2>0 with feature PE on. We gate init and forward
        # identically (order > 0), which matches the reference on its
        # runnable domain (num_feat_freqs == 0) and stays consistent
        # elsewhere.
        cin = c + (cfg.dist_xyz_dim if cfg.agg_intrp_order > 0 else 0)
        sizes = [cin] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer2
        params["block2"] = _mlp_init(k2, sizes, gain, dtype)
        c = cfg.shading_feature_num
    if cfg.shading_feature_mlp_layer2_bpnet > 0:
        cin = c + (cfg.semantic_dim if cfg.predict_semantic == 1 else 0)
        sizes = [cin] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer2_bpnet
        params["block2_bpnet"] = _mlp_init(
            jax.random.fold_in(k2, 1), sizes, gain, dtype)
        c = cfg.shading_feature_num
    if cfg.shading_feature_mlp_layer3 > 0:
        cin = c + (3 if "1" in cfg.point_color_mode else 0) + \
            (4 if "1" in cfg.point_dir_mode else 0)
        sizes = [cin] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer3
        params["block3"] = _mlp_init(k3, sizes, gain, dtype)
        c = cfg.shading_feature_num
    if cfg.agg_variant == "yuze" and cfg.shading_feature_mlp_layer4 > 0:
        # yuze :382-394 — input = running width + PE(3 plane cos-angles,
        # num_feat_freqs => 6*freqs channels) + raw point color. The
        # reference init adds the angle channels unconditionally but its
        # forward only concatenates them when point dirs exist (it assumes
        # point_dir_mode "1" and would crash otherwise); we gate init and
        # forward identically so other modes still run.
        cin = c + \
            (6 * cfg.num_feat_freqs if "1" in cfg.point_dir_mode else 0) + \
            (3 if "1" in cfg.point_color_mode else 0)
        sizes = [cin] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer4
        params["block4"] = _mlp_init(k6, sizes, gain, dtype)
        c = cfg.shading_feature_num
    if cfg.agg_variant == "yuze" and cfg.shading_feature_mlp_linear > 0:
        # yuze :396-407 — depth is shading_feature_mlp_layer4, NOT
        # shading_feature_mlp_linear (reference quirk, mirrored)
        sizes = [c] + [cfg.shading_feature_num] * cfg.shading_feature_mlp_layer4
        params["block_linear"] = _mlp_init(k7, sizes, gain, dtype)
        c = cfg.shading_feature_num

    # alpha head: (layer-1) hidden layers of width C/2 then Linear->1
    a_sizes = [cfg.shading_feature_num] + \
        [cfg.shading_feature_num // 2] * (cfg.shading_alpha_mlp_layer - 1) + [1]
    params["alpha_branch"] = _mlp_init(k4, a_sizes, gain, dtype)

    c_sizes = [cfg.shading_feature_num + cfg.viewdir_channels] + \
        [cfg.shading_feature_num // 2] * (cfg.shading_color_mlp_layer - 1) + [3]
    params["color_branch"] = _mlp_init(k5, c_sizes, gain, dtype)
    return params


# ------------------------------------------------------------ distance kernels

def _dist_weights(cfg: AggregatorConfig, dists, pnt_mask):
    """dists (B,R,SR,K,dist_dim) -> weights (B,R,SR,K). Reference :465-514."""
    kern = cfg.agg_distance_kernel
    m = pnt_mask.astype(dists.dtype)

    def safe_norm(x):
        # sqrt has an inf gradient at 0; clip inside so grads stay finite
        return jnp.sqrt(jnp.clip(jnp.sum(jnp.square(x), axis=-1), min=1e-12))

    # agg_axis_weight (reference :475-513): every shipped config passes
    # "1. 1. 1.", which the reference short-circuits to the unweighted
    # form; the non-unit branches are mirrored exactly, including their
    # quirks (linear gates on aw[0]/aw[2] but applies aw[0] to the xy norm
    # and aw[1] to |z|; quadric multiplies the FULL dists row by the
    # 3-wide weight, so like the reference it only broadcasts for 3-wide
    # dists, i.e. agg_dist_pers <= 9)
    aw = cfg.axis_weight
    lin_unit = aw is None or (aw[0] == 1 and aw[2] == 1)
    quad_unit = aw is None or (aw[0] == 1 and aw[1] == 1 and aw[2] == 1)

    def lin_w(d):
        if lin_unit:
            return 1.0 / jnp.clip(safe_norm(d[..., :3]), min=1e-6)
        awj = jnp.asarray(aw, dists.dtype)
        xy = jnp.sqrt(jnp.clip(
            jnp.sum(jnp.square(d[..., :2]), axis=-1), min=1e-12))
        return 1.0 / jnp.clip(
            xy * awj[0] + jnp.abs(d[..., 2]) * awj[1], min=1e-6)

    def quad_w(d, full):
        if quad_unit:
            return 1.0 / jnp.clip(
                jnp.sum(jnp.square(d if full else d[..., :3]), axis=-1),
                min=1e-8)
        awj = jnp.asarray(aw, dists.dtype)
        return 1.0 / jnp.clip(
            jnp.sum(jnp.square(d) * awj, axis=-1), min=1e-8)

    if kern == "linear":
        return m * lin_w(dists)
    if kern == "quadric":
        return m * quad_w(dists, full=False)
    if kern == "avg":
        return m
    if kern == "numlinear":
        if lin_unit:
            w = 1.0 / jnp.clip(safe_norm(dists), min=1e-6)
        else:
            w = lin_w(dists)
        w = m * w
        return w / jnp.clip(jnp.sum(m, axis=-1, keepdims=True), min=1.0)
    if kern == "numquadric":
        # NB: unlike numlinear, the reference's numquadric does NOT divide
        # by the neighbor count (:483-491 returns the raw masked weights;
        # only numlinear computes norm_weights) — mirrored exactly
        return m * quad_w(dists, full=True)
    if kern == "trilinear":
        # reference :428-462 — needs grid_vox_sz; handled in _dist_weights_ex
        raise ValueError("trilinear handled by _dist_weights_ex")
    raise ValueError(f"unsupported agg_distance_kernel {kern}")


def _dist_weights_ex(cfg: AggregatorConfig, embedding, dists, pnt_mask,
                     vsize, grid_vox_sz):
    """Kernels that also transform the embedding (sh_intrp, gau_intrp,
    trilinear — reference :428-558). Returns (weights, embedding)."""
    kern = cfg.agg_distance_kernel
    m = pnt_mask.astype(dists.dtype)
    if kern == "trilinear":
        d = dists * m[..., None] / jnp.maximum(grid_vox_sz, 1e-8)
        d = 1.0 - jnp.abs(d)
        w = m * d[..., 0] * d[..., 1] * d[..., 2]
        w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), min=1e-8)
        return w, embedding
    if kern == "sh_intrp":
        from ..utils.spherical import SphericalHarm_table
        sh = SphericalHarm_table(cfg.sh_degree)
        dist_norm = jnp.linalg.norm(dists[..., :3], axis=-1)
        dirs = dists[..., :3] / jnp.clip(dist_norm[..., None], min=1e-8)
        shall = sh.sh_all(dirs)                        # (...,deg^2)
        nsh = cfg.sh_degree ** 2
        sh_coefs = embedding[..., :nsh]
        act = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh,
               "passfunc": lambda x: x}[cfg.sh_act]
        distf = {"sh_linear": lambda d: 1.0 / jnp.clip(d, min=1e-8),
                 "sh_quadric": lambda d: 1.0 / jnp.clip(d ** 2, min=1e-8),
                 "passfunc": lambda d: jnp.ones_like(d)}[cfg.sh_dist_func]
        w = m * jnp.sum(act(shall * sh_coefs), axis=-1) * distf(dist_norm)
        return w, embedding[..., nsh:]
    if kern == "gau_intrp":
        # anisotropic gaussians (reference :546-558, simplified axis-aligned)
        scale = jnp.abs(embedding[..., 0])
        radii = vsize[2] * 20 * jax.nn.sigmoid(embedding[..., 1:4])
        g = dists[..., :3] / jnp.clip(radii, min=1e-6)
        w = m * scale * jnp.exp(-0.5 * jnp.sum(jnp.square(g), axis=-1))
        return w, embedding[..., 7:]
    return _dist_weights(cfg, dists, pnt_mask), embedding


def _rot_vec(v, rot):
    """Apply the reference's Rw2c rotation `v_row @ Rw2c^T`
    (point_aggregators.py:565 transposes, then right-multiplies at
    :579/:599/:648). rot is (3,3) uniform or (...,3,3) per-neighbor."""
    if rot.ndim == 2:
        return v @ rot.T
    return jnp.einsum("...i,...ji->...j", v, rot)


def _yuze_angle_features(sd, ov, freqs):
    """Rotation-invariant angle features of the yuze aggregator variant
    (point_aggregators_yuze.py:686-703): the stored per-point dir and the
    view dir are projected onto the xy / xz / yz planes and compared by
    signed cosine; the (roll, theta, phi) triplet is positionally encoded.

    Mirrored exactly, including the reference's quirks: the "clockwise" sign
    test uses `a0*b1 - a1*b1` (b1 in both terms), the features are cosines
    (not angles), and the concat order is [row, theta, fai]. One dense-mask
    delta: the reference computes on compacted valid rows only, so we clip
    the norm denominators (masked rows have zero dirs; an unclipped divide
    would propagate NaN through the dense matmul)."""
    def cosang(a, b):
        na = jnp.sqrt(jnp.clip(jnp.sum(a * a, axis=-1), min=1e-24))
        nb = jnp.sqrt(jnp.clip(jnp.sum(b * b, axis=-1), min=1e-24))
        c = jnp.sum(a * b, axis=-1) / na / nb
        sign = jnp.where(
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 1] > 0, 1.0, -1.0)
        return sign * c
    theta = cosang(sd[..., :2], ov[..., :2])      # xy plane
    row = cosang(sd[..., ::2], ov[..., ::2])      # xz plane
    fai = cosang(sd[..., 1:], ov[..., 1:])        # yz plane
    ang = jnp.stack([row, theta, fai], axis=-1)
    return positional_encoding(ang, freqs)


def _gradient_clamp(x, lo=0.0001, hi=1.0):
    """Pass-through clamp: value clamped, gradient unclamped (reference :863)."""
    return x - jax.lax.stop_gradient(x - jnp.clip(x, lo, hi))


def raw2out_density(cfg: AggregatorConfig, raw):
    if cfg.act_super > 0:
        return jax.nn.softplus(raw - 1.0)
    return jax.nn.relu(raw)


def raw2out_color(cfg: AggregatorConfig, raw):
    c = jax.nn.sigmoid(raw)
    if cfg.act_super > 0:
        c = c * (1 + 2 * 0.001) - 0.001
    return c


def compute_dists(cfg: AggregatorConfig, sampled_xyz, sampled_xyz_pers,
                  sample_loc, sample_loc_w):
    """Per-neighbor offset features. agg_dist_pers=20 (ScanNet default,
    reference :917-925): world Δ ⊕ z-scaled perspective Δ."""
    p = cfg.agg_dist_pers
    if p == 0:
        return sampled_xyz - sample_loc_w[..., None, :]
    if p == 1:
        return sampled_xyz_pers - sample_loc[..., None, :]
    if p == 10:
        d = sampled_xyz_pers - sample_loc[..., None, :]
        return jnp.concatenate(
            [sampled_xyz - sample_loc_w[..., None, :], d], axis=-1)
    if p == 20:
        xd = (sampled_xyz_pers[..., 0] * sampled_xyz_pers[..., 2]
              - sample_loc[..., None, 0] * sample_loc[..., None, 2])
        yd = (sampled_xyz_pers[..., 1] * sampled_xyz_pers[..., 2]
              - sample_loc[..., None, 1] * sample_loc[..., None, 2])
        zd = sampled_xyz_pers[..., 2] - sample_loc[..., None, 2]
        d = jnp.stack([xd, yd, zd], axis=-1)
        return jnp.concatenate(
            [sampled_xyz - sample_loc_w[..., None, :], d], axis=-1)
    raise ValueError(f"unsupported agg_dist_pers {p}")


def aggregate(params: Dict[str, Any], cfg: AggregatorConfig, *,
              sampled_embedding,       # (B,R,SR,K,F)
              sampled_color,           # (B,R,SR,K,3) or None
              sampled_dir,             # (B,R,SR,K,3) or None
              sampled_conf,            # (B,R,SR,K,1) or None
              sampled_label_embedding,  # (B,R,SR,K,96) or None
              sampled_xyz,             # (B,R,SR,K,3) world
              sampled_xyz_pers,        # (B,R,SR,K,3) perspective
              sample_pnt_mask,         # (B,R,SR,K) bool
              sample_loc,              # (B,R,SR,3) perspective
              sample_loc_w,            # (B,R,SR,3) world
              sample_ray_dirs,         # (B,R,SR,3)
              Rw2c=None,               # (3,3), (B,R,SR,K,3,3), or None
              vsize=None,
              march=None):             # {"ray_dist": (B,R,SR)}: fuse the
    #                                    volume march in-kernel (eval only,
    #                                    needs fused_march + the fused color
    #                                    path) — decoded is then the dict
    #                                    {"march": (B,R,4) [color | bgT]}
    """Dense masked aggregation. Returns (decoded (B,R,SR,4), ray_valid
    (B,R,SR) bool, weight (B,R,SR,K), conf_coefficient (B,R,SR,K))."""
    if cfg.agg_intrp_order not in (1, 2):
        # the reference's order-0 decode branch is missing
        # (point_aggregators.py:715/:745 if==1/elif==2), so its module
        # raises UnboundLocalError at forward for any other value — we
        # fail at the same point with a clear message
        raise ValueError(
            f"agg_intrp_order must be 1 or 2, got {cfg.agg_intrp_order}")
    B, R, SR, K, _ = sampled_embedding.shape
    mask = sample_pnt_mask
    ray_valid = jnp.any(mask, axis=-1)  # (B,R,SR)

    dists = compute_dists(cfg, sampled_xyz, sampled_xyz_pers,
                          sample_loc, sample_loc_w)
    if cfg.agg_distance_kernel in ("trilinear", "sh_intrp", "gau_intrp"):
        weight, sampled_embedding = _dist_weights_ex(
            cfg, sampled_embedding, dists, mask,
            vsize if vsize is not None else (0.008,) * 3, 0.0)
    else:
        weight = _dist_weights(cfg, dists, mask)
    if (cfg.agg_weight_norm > 0
            and cfg.agg_distance_kernel != "trilinear"
            and not cfg.agg_distance_kernel.startswith("num")):
        weight = weight / jnp.clip(
            jnp.sum(weight, axis=-1, keepdims=True), min=1e-8)

    conf_coefficient = jnp.ones_like(weight)
    if sampled_conf is not None:
        conf_coefficient = _gradient_clamp(sampled_conf[..., 0])
    w = (weight * conf_coefficient)[..., None]  # (B,R,SR,K,1)

    # viewdirs rotate into the canonical frame (per-part Rw2c: by the first
    # neighbor's rotation, reference :568/:579) before the PE split
    viewdirs = sample_ray_dirs
    if Rw2c is not None:
        viewdirs = _rot_vec(
            viewdirs, Rw2c if Rw2c.ndim == 2 else Rw2c[..., 0, :, :])
    ori_viewdirs = viewdirs
    if cfg.num_viewdir_freqs > 0:
        vd = positional_encoding(viewdirs, cfg.num_viewdir_freqs, ori=True)
        viewdirs = vd[..., 3:]  # reference splits off the raw dirs (:582)

    # ---- per-neighbor feature assembly
    d = dists
    if cfg.dist_xyz_deno != 0.0 and vsize is not None:
        d = d / float(cfg.dist_xyz_deno * np.linalg.norm(np.asarray(vsize)))
    if Rw2c is not None:
        # rotate the world-delta part into the canonical frame (reference :599)
        d = jnp.concatenate([_rot_vec(d[..., :3], Rw2c), d[..., 3:]], axis=-1)

    use_fused = (
        cfg.fused_mlp == "pallas"
        and cfg.agg_variant == "default"
        and cfg.shading_feature_mlp_layer1 > 0
        and cfg.shading_feature_mlp_layer2 == 0
        and cfg.shading_feature_mlp_layer2_bpnet == 0
        and cfg.shading_feature_mlp_layer3 == 0
        and cfg.shading_alpha_mlp_layer == 1
        and cfg.num_feat_freqs > 0 and cfg.dist_xyz_freq > 0
        and cfg.act_type == "LeakyReLU" and cfg.act_super > 0
        and cfg.agg_intrp_order == 2
        and cfg.agg_distance_kernel not in ("trilinear", "sh_intrp",
                                            "gau_intrp"))
    color = None
    # NOTE: independent of cfg.fused_color — the march kernel variant has
    # its color head in-kernel by construction
    if (march is not None and cfg.fused_march and use_fused
            and cfg.num_viewdir_freqs > 0):
        # fully-fused eval render: shading + volume march in one kernel
        # (ops/fused_agg.py _kernel_color_march); per-sample tensors never
        # reach HBM — the kernel emits per-RAY [color | bg transmission]
        from ..ops.fused_agg import fused_block1_alpha_color_march
        M = B * R * SR
        wm = (weight * conf_coefficient) * mask.astype(weight.dtype)
        out4 = fused_block1_alpha_color_march(
            sampled_embedding.reshape(M, K, -1).astype(jnp.float32),
            d.reshape(M, K, -1).astype(jnp.float32),
            wm.reshape(M, K).astype(jnp.float32),
            ori_viewdirs.reshape(M, 3).astype(jnp.float32),
            march["ray_dist"].reshape(M).astype(jnp.float32),
            ray_valid.reshape(M).astype(jnp.float32),
            params["block1"], params["alpha_branch"],
            params["color_branch"],
            K=K, nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
            vf=cfg.num_viewdir_freqs, SR=SR,
            bf16=(cfg.compute_dtype == "bfloat16"))
        return ({"march": out4.reshape(B, R, 4)}, ray_valid, weight,
                conf_coefficient)
    if use_fused and cfg.num_viewdir_freqs > 0 and cfg.fused_color:
        # one VMEM-resident Pallas kernel for PE -> block1 -> alpha head ->
        # weighted K-reduction -> color branch on the reduced features
        # (ops/fused_agg.py): the (M, C+1) intermediate and the XLA color
        # stage's concat/relayout copies never touch HBM
        from ..ops.fused_agg import fused_block1_alpha_color
        M = B * R * SR
        wm = (weight * conf_coefficient) * mask.astype(weight.dtype)
        al, rawc = fused_block1_alpha_color(
            sampled_embedding.reshape(M, K, -1).astype(jnp.float32),
            d.reshape(M, K, -1).astype(jnp.float32),
            wm.reshape(M, K).astype(jnp.float32),
            ori_viewdirs.reshape(M, 3).astype(jnp.float32),
            params["block1"], params["alpha_branch"],
            params["color_branch"],
            K=K, nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
            vf=cfg.num_viewdir_freqs,
            bf16=(cfg.compute_dtype == "bfloat16"), bwd=cfg.fused_bwd)
        alpha = al.reshape(B, R, SR, 1)
        color = raw2out_color(cfg, rawc.reshape(B, R, SR, 3))
    elif use_fused:
        # no viewdir PE -> color branch stays in XLA; fuse block1+alpha only
        from ..ops.fused_agg import fused_block1_alpha
        M = B * R * SR
        wm = (weight * conf_coefficient) * mask.astype(weight.dtype)
        fa, al = fused_block1_alpha(
            sampled_embedding.reshape(M, K, -1).astype(jnp.float32),
            d.reshape(M, K, -1).astype(jnp.float32),
            wm.reshape(M, K).astype(jnp.float32),
            params["block1"], params["alpha_branch"],
            K=K, nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
            bf16=(cfg.compute_dtype == "bfloat16"), bwd=cfg.fused_bwd)
        alpha = al.reshape(B, R, SR, 1)
        feat_agg = fa.reshape(B, R, SR, -1)
    else:
        if cfg.dist_xyz_freq != 0:
            d = positional_encoding(d, abs(cfg.dist_xyz_freq))

        feat = sampled_embedding
        if cfg.num_feat_freqs > 0:
            feat = jnp.concatenate(
                [feat, positional_encoding(feat, cfg.num_feat_freqs)],
                axis=-1)
        if cfg.agg_intrp_order > 0:
            feat = jnp.concatenate([feat, d], axis=-1)

        feat = _mlp_apply(cfg, params["block1"], feat)

        if cfg.shading_feature_mlp_layer2 > 0:
            # reference :624-630 (agg_feat_xyz_mode is always "None" —
            # rejected at config build otherwise)
            if cfg.agg_intrp_order > 0:
                feat = jnp.concatenate([feat, d], axis=-1)
            feat = _mlp_apply(cfg, params["block2"], feat)

        if cfg.shading_feature_mlp_layer2_bpnet > 0:
            if sampled_label_embedding is not None:
                feat = jnp.concatenate(
                    [feat, sampled_label_embedding], axis=-1)
            feat = _mlp_apply(cfg, params["block2_bpnet"], feat)

        feat_branch = feat
        if cfg.agg_variant == "yuze":
            # yuze :649-651: optional block_linear, then the pre-block3
            # features are saved — the alpha head reads THEM (view- and
            # rotation-independent density); block3/block4 feed color only
            if cfg.shading_feature_mlp_linear > 0:
                feat = _mlp_apply(cfg, params["block_linear"], feat)
            feat_branch = feat

        if cfg.shading_feature_mlp_layer3 > 0:
            # per-neighbor color + dir features (reference :638-653): stored
            # dirs rotated into the canonical frame, compared to the viewdir
            parts = [feat]
            if "1" in cfg.point_color_mode and sampled_color is not None:
                parts.append(sampled_color)
            if "1" in cfg.point_dir_mode and sampled_dir is not None:
                sd = sampled_dir
                if Rw2c is not None:
                    sd = _rot_vec(sd, Rw2c)
                ov = ori_viewdirs[..., None, :]             # (B,R,SR,1,3)
                parts.append(sd - jnp.broadcast_to(ov, sd.shape))
                parts.append(jnp.sum(sd * ov, axis=-1, keepdims=True))
            feat = _mlp_apply(cfg, params["block3"],
                              jnp.concatenate(parts, axis=-1))

        if cfg.agg_variant == "yuze" and cfg.shading_feature_mlp_layer4 > 0:
            # yuze :670-705: color + PE(plane cos-angle triplet) -> block4
            parts = [feat]
            if "1" in cfg.point_color_mode and sampled_color is not None:
                parts.append(sampled_color)
            if "1" in cfg.point_dir_mode and sampled_dir is not None:
                sd = sampled_dir
                if Rw2c is not None:
                    sd = _rot_vec(sd, Rw2c)
                ov = jnp.broadcast_to(ori_viewdirs[..., None, :], sd.shape)
                parts.append(
                    _yuze_angle_features(sd, ov, cfg.num_feat_freqs))
            feat = _mlp_apply(cfg, params["block4"],
                              jnp.concatenate(parts, axis=-1))

        if cfg.agg_intrp_order == 1:
            # ---- interpolate-then-decode (reference :715-742, the DTU
            # generalizable-inference configs dev_scripts/dtu_test_inf/*):
            # per-neighbor features weight-sum over K FIRST, then ONE
            # alpha decode per shading point (no per-neighbor softplus)
            # and the color head on the same aggregated features.
            # agg_intrp_order=0 is dead in the reference too — its decode
            # branch is missing (if ==1 / elif ==2 at :715/:745), so the
            # torch module raises UnboundLocalError; we reject it at
            # config build instead of silently decoding as another order.
            feat = feat * mask[..., None]
            feat_agg = jnp.sum(feat * w, axis=-2)       # (B,R,SR,C)
            raw_alpha = _mlp_apply(cfg, params["alpha_branch"], feat_agg,
                                   act_last=False)
            alpha = raw2out_density(cfg, raw_alpha)     # (B,R,SR,1)
        else:
            # ---- agg_intrp_order == 2: per-neighbor alpha then interpolate
            # (yuze: density from feat_branch — the pre-block3/4 features)
            alpha_src = feat_branch if cfg.agg_variant == "yuze" else feat
            raw_alpha = _mlp_apply(cfg, params["alpha_branch"], alpha_src,
                                   act_last=False)
            alpha_nb = raw2out_density(cfg, raw_alpha)      # (B,R,SR,K,1)
            alpha_nb = alpha_nb * mask[..., None]
            alpha = jnp.sum(alpha_nb * w, axis=-2)          # (B,R,SR,1)

            feat = feat * mask[..., None]
            feat_agg = jnp.sum(feat * w, axis=-2)           # (B,R,SR,C)

    if color is None:
        color_in = jnp.concatenate([feat_agg, viewdirs], axis=-1)
        raw_color = _mlp_apply(cfg, params["color_branch"], color_in,
                               act_last=False)
        color = raw2out_color(cfg, raw_color)

    decoded = jnp.concatenate([alpha, color], axis=-1)   # (B,R,SR,4)
    decoded = decoded * ray_valid[..., None].astype(decoded.dtype)
    return decoded, ray_valid, weight, conf_coefficient
