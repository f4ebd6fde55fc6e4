"""MVS point-cloud initialization: FeatureNet / CostRegNet / MVSNet +
per-point embedding extraction.

Functional re-design of /root/reference/models/mvs/:
  * FeatureNet 2D FPN (models.py:717-765), CostRegNet 3D UNet (:767-812),
    MVSNet variance cost volume + softmax depth regression (:824-988);
  * InPlaceABN (CUDA ext) becomes plain BatchNorm + leaky_relu(0.01) with
    stored statistics — numerically equivalent at inference, which is the only
    mode the reference uses it in for ScanNet (pretrained checkpoint,
    manual_depth_view=1);
  * homography warping / ndc<->cam / grid-sample gathers (mvs_utils.py);
  * MvsPointsModel.query_embedding (mvs_points_model.py:225-259): warp points
    into source views, gather FeatureNet pyramid features + colors + view
    dirs + confidence, fuse through premlp (63 -> 32);
  * gaussian depth sampling + unprojection (gau_single_sampler :140-180).

Parameters are nested dicts keyed by the torch module paths so pretrained
reference checkpoints convert mechanically. Layout: conv weights HWIO
(2D) / DHWIO (3D), inputs NHWC / NDHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ low-level ops

def leaky_relu(x, slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def conv2d(x, w, stride=1, padding=None):
    """x: (N,H,W,C), w: (kh,kw,ci,co).

    Default padding is TORCH-style symmetric k//2 per side (the reference
    nets use Conv(k, stride, padding=k//2)). XLA's "SAME" pads
    asymmetrically for stride>1, which would misalign converted torch
    checkpoints by one pixel in every downsampling conv."""
    if padding is None:
        padding = [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2]
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3d(x, w, stride=1, padding=None):
    """x: (N,D,H,W,C), w: (kd,kh,kw,ci,co). Torch-style padding (see conv2d)."""
    if padding is None:
        padding = [(w.shape[i] // 2,) * 2 for i in range(3)]
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(stride,) * 3, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_transpose3d_s2(x, w):
    """Stride-2 transpose conv, kernel 3, padding 1, output_padding 1 —
    doubles each spatial dim (torch ConvTranspose3d semantics).
    x: (N,D,H,W,C); w: (kd,kh,kw,co,ci) — torch layout (ci,co,kd,kh,kw)
    transposed by (2,3,4,1,0); verified bit-accurate vs torch in tests."""
    # torch crops `padding`=1 low / `padding - output_padding`=0 high from
    # the full (VALID) transpose output; lax explicit (lo,hi) counts from the
    # zero-overlap base, so (lo,hi) = (k-1-crop_lo, k-1-crop_hi) = (1,2)
    return jax.lax.conv_transpose(
        x.astype(w.dtype), w, strides=(2, 2, 2), padding=((1, 2),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=True)


def batch_norm(x, p, eps=1e-5, slope=0.01, act=True):
    """Inference-mode BN with optional leaky-relu — the ABN replacement."""
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    y = (x - p["running_mean"]) * inv * p["weight"] + p["bias"]
    return leaky_relu(y, slope) if act else y


def bilinear_interpolate(img, x, y):
    """img: (H,W,C); x,y: (...,) pixel coords (align_corners grid);
    zero padding outside. Matches F.grid_sample(mode=bilinear,
    padding_mode=zeros, align_corners=True) after grid denormalization."""
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = img[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return v * inb[..., None]

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    return ((1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v01
            + (1 - dx) * dy * v10 + dx * dy * v11)


def grid_sample_norm(img, grid_xy):
    """img: (H,W,C); grid_xy in [-1,1] (align_corners=True)."""
    H, W, _ = img.shape
    x = (grid_xy[..., 0] + 1.0) * (W - 1) / 2.0
    y = (grid_xy[..., 1] + 1.0) * (H - 1) / 2.0
    return bilinear_interpolate(img, x, y)


def resize_bilinear_align_corners(x, out_hw):
    """(N,H,W,C) -> (N,h,w,C) bilinear with ALIGN_CORNERS=True.

    torch F.interpolate(align_corners=True) maps output corners onto input
    corners (src = i*(H-1)/(h-1)); jax.image.resize uses half-pixel centers
    (align_corners=False), which would skew converted torch checkpoints'
    decoder features."""
    N, H, W, C = x.shape
    h, w = out_hw
    ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    top = a * (1 - fx) + b * fx
    bot = c * (1 - fx) + d * fx
    return top * (1 - fy) + bot * fy


def upsample2x_bilinear(x):
    """(N,H,W,C) -> (N,2H,2W,C), align_corners=True (torch F.interpolate)."""
    N, H, W, C = x.shape
    return resize_bilinear_align_corners(x, (2 * H, 2 * W))


# ------------------------------------------------------------- feature nets

def conv_bn_relu(x, p, stride=1, conv=conv2d, slope=0.01):
    return batch_norm(conv(x, p["conv"]["weight"], stride=stride), p["bn"],
                      slope=slope)


def feature_net_apply(params, imgs):
    """imgs: (V,H,W,3) -> list of pyramid features
    [l0=(V,H,W,3) raw, l1=(V,H,W,8), l2=(V,H/2,W/2,16), l3=(V,H/4,W/4,32)]
    (reference `intermediate=True` mode used by query_embedding)."""
    x = imgs
    x1 = conv_bn_relu(conv_bn_relu(x, params["conv0"]["0"]),
                      params["conv0"]["1"])
    x2 = conv_bn_relu(x1, params["conv1"]["0"], stride=2)
    x2 = conv_bn_relu(conv_bn_relu(x2, params["conv1"]["1"]),
                      params["conv1"]["2"])
    x3 = conv_bn_relu(x2, params["conv2"]["0"], stride=2)
    x3 = conv_bn_relu(conv_bn_relu(x3, params["conv2"]["1"]),
                      params["conv2"]["2"])
    x3 = conv2d(x3, params["toplayer"]["weight"]) + params["toplayer"]["bias"]
    return [imgs, x1, x2, x3]


def official_feature_apply(params, imgs):
    """Official MVSNet FeatureNet (depth_estimators/mvsnet.py:7-27):
    8 convs to a single 32-ch map at 1/4 res, ReLU activations.
    imgs: (V,H,W,3) -> (V,H/4,W/4,32)."""
    r = lambda x, p, s=1: conv_bn_relu(x, p, stride=s, slope=0.0)
    x = r(r(imgs, params["conv0"]), params["conv1"])
    x = r(r(r(x, params["conv2"], 2), params["conv3"]), params["conv4"])
    x = r(r(x, params["conv5"], 2), params["conv6"])
    return conv2d(x, params["feature"]["weight"]) + params["feature"]["bias"]


def official_cost_reg_apply(params, x):
    """Official CostRegNet with the final 1-ch prob conv
    (depth_estimators/mvsnet.py:30-72). x: (N,D,H,W,32) -> (N,D,H,W,1)."""
    c = lambda x, p, s=1: conv_bn_relu(x, p, stride=s, conv=conv3d, slope=0.0)
    conv0 = c(x, params["conv0"])
    conv2 = c(c(conv0, params["conv1"], 2), params["conv2"])
    conv4 = c(c(conv2, params["conv3"], 2), params["conv4"])
    y = c(c(conv4, params["conv5"], 2), params["conv6"])
    y = conv4 + batch_norm(
        conv_transpose3d_s2(y, params["conv7"]["0"]["weight"]),
        params["conv7"]["1"], slope=0.0)
    y = conv2 + batch_norm(
        conv_transpose3d_s2(y, params["conv9"]["0"]["weight"]),
        params["conv9"]["1"], slope=0.0)
    y = conv0 + batch_norm(
        conv_transpose3d_s2(y, params["conv11"]["0"]["weight"]),
        params["conv11"]["1"], slope=0.0)
    return conv3d(y, params["prob"]["weight"]) + params["prob"]["bias"]


def cost_reg_apply(params, x):
    """x: (N,D,H,W,C) -> (N,D,H,W,8). CostRegNet 3D UNet (reference :767)."""
    c = lambda x, p, s=1: conv_bn_relu(x, p, stride=s, conv=conv3d)
    conv0 = c(x, params["conv0"])
    conv2 = c(c(conv0, params["conv1"], 2), params["conv2"])
    conv4 = c(c(conv2, params["conv3"], 2), params["conv4"])
    y = c(c(conv4, params["conv5"], 2), params["conv6"])
    y = conv4 + batch_norm(
        conv_transpose3d_s2(y, params["conv7"]["0"]["weight"]),
        params["conv7"]["1"])
    y = conv2 + batch_norm(
        conv_transpose3d_s2(y, params["conv9"]["0"]["weight"]),
        params["conv9"]["1"])
    y = conv0 + batch_norm(
        conv_transpose3d_s2(y, params["conv11"]["0"]["weight"]),
        params["conv11"]["1"])
    return y


# --------------------------------------------------------------- warp utils

def homo_warp(src_feat, proj_mat, depth_values):
    """src_feat: (H,W,C); proj_mat: (3,4) = src_proj @ ref_proj_inv;
    depth_values: (D,H,W). Returns warped (D,H,W,C) and grid (D,H,W,2) in
    [-1,1] (reference mvs_utils.homo_warp :430-470)."""
    H, W, C = src_feat.shape
    D = depth_values.shape[0]
    R = proj_mat[:, :3]
    T = proj_mat[:, 3:]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ref_xyz = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0).reshape(3, -1)
    src_xyz = R @ ref_xyz  # (3, H*W)
    src_xyz = (src_xyz[:, None, :] * depth_values.reshape(1, D, -1)
               + T[:, :, None].reshape(3, 1, 1))
    z = jnp.where(jnp.abs(src_xyz[2]) < 1e-9, 1e-9, src_xyz[2])
    gx = src_xyz[0] / z
    gy = src_xyz[1] / z
    grid = jnp.stack([gx / ((W - 1) / 2) - 1, gy / ((H - 1) / 2) - 1],
                     axis=-1).reshape(D, H, W, 2)
    warped = jax.vmap(lambda g: grid_sample_norm(src_feat, g))(grid)
    return warped, grid


def ndc_2_cam(ndc_xyz, near_far, intrinsic, W, H):
    inv_scale = jnp.asarray([W - 1.0, H - 1.0])
    cam_z = ndc_xyz[..., 2:3] * (near_far[1] - near_far[0]) + near_far[0]
    cam_xy = ndc_xyz[..., :2] * inv_scale * cam_z
    cam_xyz = jnp.concatenate([cam_xy, cam_z], axis=-1)
    return cam_xyz @ jnp.linalg.inv(intrinsic.T)


def homo_warp_nongrid(c2w, w2c, intrinsic, ref_cam_xyz, HD, WD):
    """Project ref-camera points into a source view (reference :299-316).
    ref_cam_xyz: (M,3). Returns (grid_xy in [-1,1] (M,2), mask (M,))."""
    if w2c is not None:
        ones = jnp.ones_like(ref_cam_xyz[:, :1])
        src = jnp.concatenate([ref_cam_xyz, ones], -1) @ c2w.T @ w2c.T
        src = src[:, :3]
    else:
        src = ref_cam_xyz
    pix = (src / src[:, 2:3]) @ intrinsic.T
    gxy = pix[:, :2]
    mask = jnp.all((gxy >= 0) & (gxy <= jnp.asarray([WD - 1.0, HD - 1.0])),
                   axis=-1)
    grid = jnp.stack([gxy[:, 0] / ((WD - 1.0) / 2.0) - 1.0,
                      gxy[:, 1] / ((HD - 1.0) / 2.0) - 1.0], axis=-1)
    return grid, mask


# ------------------------------------------------------------ MvsPointsModel

@dataclasses.dataclass(frozen=True)
class MVSConfig:
    depth_grid: int = 128
    num_each_depth: int = 1
    dprob_thresh: float = 0.8
    num_neighbor: int = 1
    manual_std_depth: float = 0.0
    point_features_dim: int = 32
    premlp_layers: int = 2
    init_view_num: int = 3
    act_type: str = "LeakyReLU"


def init_mvs_params(key, cfg: MVSConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init of FeatureNet/CostRegNet/premlp (he-normal convs)."""
    keys = iter(jax.random.split(key, 64))

    def conv(kshape):
        fan_in = int(np.prod(kshape[:-1]))
        return {"weight": jax.random.normal(next(keys), kshape, dtype)
                * np.sqrt(2.0 / fan_in)}

    def bn(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "running_mean": jnp.zeros((c,), dtype),
                "running_var": jnp.ones((c,), dtype)}

    def cbr2(ci, co, k=3):
        return {"conv": conv((k, k, ci, co)), "bn": bn(co)}

    def cbr3(ci, co, k=3):
        return {"conv": conv((k, k, k, ci, co)), "bn": bn(co)}

    feat = {
        "conv0": {"0": cbr2(3, 8), "1": cbr2(8, 8)},
        "conv1": {"0": cbr2(8, 16, 5), "1": cbr2(16, 16), "2": cbr2(16, 16)},
        "conv2": {"0": cbr2(16, 32, 5), "1": cbr2(32, 32), "2": cbr2(32, 32)},
        "toplayer": {"weight": conv((1, 1, 32, 32))["weight"],
                     "bias": jnp.zeros((32,), dtype)},
    }
    cost = {
        "conv0": cbr3(32 + 9, 8), "conv1": cbr3(8, 16), "conv2": cbr3(16, 16),
        "conv3": cbr3(16, 32), "conv4": cbr3(32, 32), "conv5": cbr3(32, 64),
        "conv6": cbr3(64, 64),
        "conv7": {"0": conv((3, 3, 3, 32, 64)), "1": bn(32)},
        "conv9": {"0": conv((3, 3, 3, 16, 32)), "1": bn(16)},
        "conv11": {"0": conv((3, 3, 3, 8, 16)), "1": bn(8)},
    }
    official = {
        "feature": {
            "conv0": cbr2(3, 8), "conv1": cbr2(8, 8),
            "conv2": cbr2(8, 16, 5), "conv3": cbr2(16, 16),
            "conv4": cbr2(16, 16), "conv5": cbr2(16, 32, 5),
            "conv6": cbr2(32, 32),
            "feature": {"weight": conv((3, 3, 32, 32))["weight"],
                        "bias": jnp.zeros((32,), dtype)},
        },
        "cost_regularization": {
            "conv0": cbr3(32, 8), "conv1": cbr3(8, 16), "conv2": cbr3(16, 16),
            "conv3": cbr3(16, 32), "conv4": cbr3(32, 32),
            "conv5": cbr3(32, 64), "conv6": cbr3(64, 64),
            "conv7": {"0": conv((3, 3, 3, 32, 64)), "1": bn(32)},
            "conv9": {"0": conv((3, 3, 3, 16, 32)), "1": bn(16)},
            "conv11": {"0": conv((3, 3, 3, 8, 16)), "1": bn(8)},
            "prob": {"weight": conv((3, 3, 3, 8, 1))["weight"],
                     "bias": jnp.zeros((1,), dtype)},
        },
    }
    # premlp: 63 -> 32 (feat 56 = 8+16+32 ⊕ color 3 ⊕ dir 3 ⊕ conf 1)
    premlp = []
    cin = 63
    for _ in range(cfg.premlp_layers):
        k = next(keys)
        std = np.sqrt(2.0 / (cin + cfg.point_features_dim))
        premlp.append({
            "w": jax.random.uniform(k, (cin, cfg.point_features_dim), dtype,
                                    -std * np.sqrt(3), std * np.sqrt(3)),
            "b": jnp.zeros((cfg.point_features_dim,), dtype)})
        cin = cfg.point_features_dim
    return {"FeatureNet": feat, "CostRegNet": cost, "official": official,
            "premlp": premlp}


class MvsPointsModel:
    """Depth -> point cloud -> per-point embedding pipeline."""

    def __init__(self, cfg: MVSConfig, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.params = params if params is not None else init_mvs_params(
            key if key is not None else jax.random.key(0), cfg)

    # ----------------------------------------------------------- depth (MVS)

    def predict_depth(self, imgs, proj_mats, depth_values):
        """Official-MVSNet depth inference — the path the reference uses for
        ScanNet (manual_depth_view=1, pretrained ckpt;
        /root/reference/models/depth_estimators/mvsnet.py:88-144).

        imgs: (V,H,W,3) [ref first]; proj_mats: (V,3,4) = src_proj @
        ref_proj_inv at feature scale; depth_values: (D,) candidate depths.
        Returns (depth (h,w), photometric confidence (h,w), prob (D,h,w))."""
        p = self.params["official"]
        feats = official_feature_apply(p["feature"], imgs)  # (V,h,w,32)
        V, h, w, C = feats.shape
        D = depth_values.shape[0]
        dvals = jnp.broadcast_to(depth_values[:, None, None], (D, h, w))

        vol_sum = jnp.zeros((D, h, w, C))
        vol_sq = jnp.zeros((D, h, w, C))
        for v in range(V):
            warped, _ = homo_warp(feats[v], proj_mats[v], dvals)
            vol_sum = vol_sum + warped
            vol_sq = vol_sq + warped ** 2
        variance = vol_sq / V - (vol_sum / V) ** 2       # (D,h,w,32)

        # CostRegNet's three stride-2 levels + transpose convs need every
        # spatial dim divisible by 8; real MVSNet inputs are (the reference
        # feeds H,W multiples of 32 and D=128) but small/odd probe scenes
        # are not — zero-pad up front, crop the regularized volume after
        # (no-op at production shapes, so converted checkpoints are
        # untouched)
        pads = [(-s) % 8 for s in (D, h, w)]
        var_p = jnp.pad(variance, [(0, pads[0]), (0, pads[1]),
                                   (0, pads[2]), (0, 0)])
        cost = official_cost_reg_apply(
            p["cost_regularization"], var_p[None])[0, :D, :h, :w, 0]
        prob = jax.nn.softmax(cost, axis=0)
        depth = jnp.sum(prob * dvals, axis=0)
        # photometric confidence: 4-tap prob sum around the regressed index
        # (reference 4*avg_pool3d over a (1,2)-ZERO-padded D axis then gather
        # at the truncated index, depth_estimators/mvsnet.py:133-135 — taps
        # falling off either end contribute 0, not an edge duplicate)
        d_index = jnp.sum(
            prob * jnp.arange(D, dtype=prob.dtype)[:, None, None], axis=0)
        idx = d_index.astype(jnp.int32)
        taps = idx[None] + jnp.arange(-1, 3)[:, None, None]
        valid = (taps >= 0) & (taps < D)
        conf = jnp.sum(jnp.where(
            valid, jnp.take_along_axis(prob, jnp.clip(taps, 0, D - 1), axis=0),
            0.0), axis=0)
        return depth, conf, prob

    # ----------------------------------------------------- point unprojection

    def sample_by_gau(self, ndc_expected, ndc_std, key):
        n = jax.random.normal(key, ndc_expected.shape)
        return jnp.clip(ndc_expected + ndc_std * n, 0.0, 1.0)

    def depth2point(self, sampled_ndc_depth, intrinsic, near_far):
        H, W = sampled_ndc_depth.shape
        ys = jnp.linspace(0, 1, H)
        xs = jnp.linspace(0, 1, W)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        ndc = jnp.stack([gx, gy, sampled_ndc_depth], axis=-1)
        cam = ndc_2_cam(ndc, near_far, intrinsic, W, H)
        return ndc, cam

    def gen_points(self, imgs, proj_mats, intrinsic, near_far,
                   key=None, gt_depth=None):
        """Generate a camera-space point cloud for the ref view.

        With gt_depth (manual_depth_view=0): unproject it directly.
        Otherwise run MVSNet depth inference (manual_depth_view=1).
        Returns (cam_xyz (h,w,3), mask (h,w), conf (h,w))."""
        cfg = self.cfg
        if gt_depth is not None:
            depth = gt_depth
            conf = jnp.ones_like(depth)
            mask = (depth >= near_far[0]) & (depth <= near_far[1])
        else:
            D = cfg.depth_grid
            depth_values = jnp.linspace(near_far[0], near_far[1], D)
            depth, conf, _ = self.predict_depth(imgs, proj_mats, depth_values)
            mask = conf > cfg.dprob_thresh
        ndc_depth = (depth - near_far[0]) / (near_far[1] - near_far[0])
        if key is not None and cfg.manual_std_depth > 0:
            ndc_depth = self.sample_by_gau(
                ndc_depth, jnp.full_like(ndc_depth, cfg.manual_std_depth), key)
        H, W = depth.shape
        _, cam_xyz = self.depth2point(ndc_depth, intrinsic, near_far)
        return cam_xyz, mask, conf

    # -------------------------------------------------------- point embedding

    def query_embedding(self, HDWD, cam_xyz, photometric_confidence, imgs,
                        c2ws, w2cs, intrinsics, cam_vid=0, pointdir_w=True):
        """cam_xyz: (M,3) points in view cam_vid's camera frame; imgs:
        (V,H,W,3). Returns (embedding (M,F), color (M,3), dir (M,3),
        conf (M,1)) — reference mvs_points_model.py:225-259 with
        appr_feature_str0 = imgfeat_0_0123 dir_0 point_conf."""
        HD, WD = HDWD
        feats = feature_net_apply(self.params["FeatureNet"], imgs)
        # imgfeat_0_0123: view 0, layers 0 (color) + 1,2,3 (pyramid)
        grid, mask = homo_warp_nongrid(
            c2ws[cam_vid], None if cam_vid == 0 else w2cs[0],
            intrinsics[0], cam_xyz, HD, WD)
        gathered = []
        color = None
        for lid in range(4):
            f = feats[lid][0]                 # ref view features (h,w,C)
            g = grid_sample_norm(f, grid) * mask[:, None]
            if lid == 0:
                color = g
            else:
                gathered.append(g)
        emb = jnp.concatenate(gathered, axis=-1)   # (M, 56)

        # dir_0: direction from camera 0 to the point, in world coords
        cam_pos_world = c2ws[0][:3, 3]
        cam_pos_cam = (jnp.append(cam_pos_world, 1.0) @ w2cs[cam_vid].T)[:3]
        dirs = cam_xyz - cam_pos_cam[None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
        if pointdir_w:
            dirs = dirs @ c2ws[cam_vid][:3, :3].T

        conf = (photometric_confidence[:, None]
                if photometric_confidence is not None
                else jnp.ones_like(emb[:, :1]))

        x = jnp.concatenate([emb, color, dirs, conf], axis=-1)  # (M, 63)
        for layer in self.params["premlp"]:
            x = leaky_relu(x @ layer["w"] + layer["b"])
        return x, color, dirs, conf

    def embed_points(self, xyz_world: np.ndarray, dataset, nearest_view_fn):
        """Bootstrap helper: assign each world point its best camera, warp to
        that camera, extract embeddings (reference run/train_ft.py:737-771)."""
        campos, camdir = dataset.get_campos_ray()
        cam_ind = nearest_view_fn(campos, camdir, xyz_world)
        n = len(xyz_world)
        F = self.cfg.point_features_dim
        emb = np.zeros((n, F), np.float32)
        col = np.zeros((n, 3), np.float32)
        dirs = np.zeros((n, 3), np.float32)
        conf = np.ones((n, 1), np.float32)
        for ci in np.unique(cam_ind):
            sel = cam_ind == ci
            item = dataset.get_item(int(ci), full_img=True)
            c2w = np.asarray(item["c2w"], np.float32)
            w2c = np.linalg.inv(c2w)
            pts = xyz_world[sel]
            cam_xyz = (np.concatenate(
                [pts, np.ones_like(pts[:, :1])], -1) @ w2c.T)[:, :3]
            e, c, d, cf = self.query_embedding(
                (dataset.height, dataset.width), jnp.asarray(cam_xyz), None,
                jnp.asarray(item["full_image"])[None],
                jnp.asarray(c2w)[None], jnp.asarray(w2c)[None],
                jnp.asarray(item["intrinsic"])[None], cam_vid=0,
                pointdir_w=True)
            emb[sel] = np.asarray(e)
            col[sel] = np.asarray(c)
            dirs[sel] = np.asarray(d)
            conf[sel] = np.asarray(cf)
        return emb, col, dirs, conf
