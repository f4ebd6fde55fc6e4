"""BPNet: joint 2D/3D semantic segmentation with bidirectional projection.

Reference: /root/reference/models/bpneter/bpnet.py —
  * LinkCreator.computeLinking (:117-142): project voxel centers into each
    view, keep pixels whose depth agrees within voxel_size (occlusion test);
  * voxelization at 0.05 m with link passthrough
    (bpnet_dataset/voxelizer.py:124-165, sparse_quantize keep-first);
  * the staged 2D ResUNet-34 / 3D MinkUNet18A forward with Linking fusion at
    p5..p2 (:249-330);
  * train_bpnet (:495-556): viewNum images sampled from the train split
    (current frame first), fix_bn (BN uses running stats), forward over the
    WHOLE point cloud, devoxelize via inds_reconstruct; returns
    (labels [N], probs [N,20], labels2d maps, 96-d point features).

Host-side IO (image/depth/pose loads, link building) stays numpy; the fused
forward jits once per scene (static voxel capacities).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse import SparseGrid, make_sparse_grid
from ..mvs import conv2d, batch_norm
from . import unet2d, unet3d
from .linking import init_linking_params, apply_linking
from .unet3d import PLANES_18A, INIT_DIM

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


@dataclasses.dataclass(frozen=True)
class BPNetConfig:
    classes: int = 20
    view_num: int = 3
    voxel_size: float = 0.05
    img_wh: Tuple[int, int] = (640, 480)
    layers_2d: int = 34
    compute_dtype: str = "float32"   # "bfloat16" runs both UNets' convs on
    #                                  the MXU in bf16 (BN is frozen /
    #                                  inference-mode per the reference's
    #                                  fix_bn, so stats stay valid); logits
    #                                  and the 96-d point feature return f32
    aug: int = 0                     # train-time augmentation (reference
    #                                  bpneter/bpnet.py:195-201 aug branch:
    #                                  p=0.5 gaussian blur + mean-padded
    #                                  rand crop jitter on the 2D views, and
    #                                  :515 ElasticDistortion on the cloud
    #                                  before voxelize). NOTE the reference's
    #                                  own aug=True path crashes (its model
    #                                  never assigns prevoxel_transforms —
    #                                  only the standalone pretrain datasets
    #                                  scanNet3D.py:101 do); ours implements
    #                                  what that path intends. The effective
    #                                  SG-NeRF config runs aug=False, so 0
    #                                  is the parity default


# ------------------------------------------------------------------- host ops

def elastic_distortion(coords: np.ndarray, granularity: float,
                       magnitude: float,
                       rng: np.random.Generator) -> np.ndarray:
    """Elastic distortion on point coordinates (host-side numpy).

    Mirrors reference bpnet_dataset/augmentation.py:159-201 ElasticDistortion:
    a Gaussian noise grid at `granularity` spacing, box-blurred twice along
    each axis (3-tap, zero-padded), trilinearly interpolated at each point and
    added scaled by `magnitude`. Self-contained numpy (no scipy/torch)."""
    coords = np.asarray(coords, np.float32)
    cmin = coords.min(0)
    noise_dim = ((coords - cmin).max(0) // granularity).astype(int) + 3
    noise = rng.standard_normal(size=(*noise_dim, 3)).astype(np.float32)

    def blur_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        xp = np.pad(x, pad)              # zeros outside, like mode='constant'
        sl = [slice(None)] * x.ndim
        out = np.zeros_like(x)
        for k in range(3):
            sl[axis] = slice(k, k + x.shape[axis])
            out += xp[tuple(sl)]
        return out / 3.0

    for _ in range(2):
        for axis in range(3):
            noise = blur_axis(noise, axis)

    # trilinear interpolation over the reference's grid axes
    # ax[d] = linspace(cmin-g, cmin + g*(dim-2), dim) -> uniform step g
    u = (coords - (cmin - granularity)) / granularity   # grid-space coords
    u = np.clip(u, 0.0, noise_dim.astype(np.float32) - 1.0 - 1e-6)
    i0 = np.floor(u).astype(np.int64)
    f = (u - i0).astype(np.float32)
    disp = np.zeros_like(coords)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.where(dx, f[:, 0], 1 - f[:, 0])
                     * np.where(dy, f[:, 1], 1 - f[:, 1])
                     * np.where(dz, f[:, 2], 1 - f[:, 2]))
                disp += w[:, None] * noise[i0[:, 0] + dx, i0[:, 1] + dy,
                                           i0[:, 2] + dz]
    return coords + disp * magnitude


# Reference ELASTIC_DISTORT_PARAMS (bpneter/bpnet.py:157) and the p=0.95
# application gate (augmentation.py:196-201).
ELASTIC_DISTORT_PARAMS = ((0.2, 0.4), (0.8, 1.6))


def prevoxel_distort(coords: np.ndarray,
                     rng: np.random.Generator) -> np.ndarray:
    """The reference prevoxel_transforms chain: with p=0.95, ElasticDistortion
    at both (granularity, magnitude) scales in sequence
    (augmentation.py:196-201 — one gate around the loop)."""
    if rng.random() < 0.95:
        for granularity, magnitude in ELASTIC_DISTORT_PARAMS:
            coords = elastic_distortion(coords, granularity, magnitude, rng)
    return coords


def compute_linking(intrinsic4: np.ndarray, c2w: np.ndarray,
                    coords_world: np.ndarray, depth: np.ndarray,
                    voxel_size: float) -> np.ndarray:
    """-> (N,3) int [row, col, valid] (reference computeLinking)."""
    H, W = depth.shape
    w2c = np.linalg.inv(c2w)
    p = (np.concatenate([coords_world,
                         np.ones((len(coords_world), 1))], 1) @ w2c.T).T
    px = p[0] * intrinsic4[0, 0] / p[2] + intrinsic4[0, 2]
    py = p[1] * intrinsic4[1, 1] / p[2] + intrinsic4[1, 2]
    pi = np.round(np.stack([px, py])).astype(np.int64)
    inside = (pi[0] >= 0) & (pi[1] >= 0) & (pi[0] < W) & (pi[1] < H) \
        & (p[2] > 1e-6)
    link = np.zeros((len(coords_world), 3), np.int32)
    ii = np.where(inside)[0]
    occl = np.abs(depth[pi[1][ii], pi[0][ii]] - p[2][ii]) <= voxel_size
    ii = ii[occl]
    link[ii, 0] = pi[1][ii]
    link[ii, 1] = pi[0][ii]
    link[ii, 2] = 1
    return link


def voxelize(locs: np.ndarray, feats: np.ndarray, voxel_size: float,
             links: Optional[np.ndarray] = None, return_first: bool = False):
    """Deterministic quantization (no augmentation, matching the reference's
    use_augmentation=False). Returns (coords (M,3) int32 origin-aligned,
    vfeats (M,C), inds_reconstruct (N,), vlinks[, first_idx (M,)])."""
    coords = np.floor(locs / voxel_size)
    coords = coords - coords.min(0)
    coords = coords.astype(np.int64)
    key = (coords[:, 0] << 42) + (coords[:, 1] << 21) + coords[:, 2]
    uniq, first_idx, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
    vcoords = coords[first_idx].astype(np.int32)
    vfeats = feats[first_idx]
    vlinks = links[first_idx] if links is not None else None
    if return_first:
        return vcoords, vfeats, inv.astype(np.int64), vlinks, first_idx
    return vcoords, vfeats, inv.astype(np.int64), vlinks


def representative_child(fine: SparseGrid, coarse: SparseGrid) -> np.ndarray:
    """For each coarse row, a row index of one of its fine children (-1 if
    none) — the `get_coords_map` ancestry used to carry links across strides."""
    import jax.numpy as jnp
    offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    child = coarse.coords[:, None, :] * 2 + jnp.asarray(offs, jnp.int32)
    from ...ops.sparse import _gather_rows
    row, ok = _gather_rows(fine, child)
    first = jnp.argmax(ok, axis=1)
    r = jnp.take_along_axis(row, first[:, None], axis=1)[:, 0]
    has = jnp.any(ok, axis=1)
    return jnp.where(has & coarse.mask, r, -1)


# --------------------------------------------------------------------- params

def init_bpnet_params(key, cfg: BPNetConfig):
    k2, k3, kl5, kl4, kl3, kl2 = jax.random.split(key, 6)
    return {
        "unet2d": unet2d.init_unet2d_params(k2, cfg.classes),
        "unet3d": unet3d.init_unet3d_params(k3, 3, cfg.classes),
        "linker_p5": init_linking_params(kl5, 512, PLANES_18A[3],
                                         cfg.view_num),
        "linker_p4": init_linking_params(kl4, 256, PLANES_18A[4],
                                         cfg.view_num),
        "linker_p3": init_linking_params(kl3, 128, PLANES_18A[5],
                                         cfg.view_num),
        "linker_p2": init_linking_params(kl2, 96, PLANES_18A[6],
                                         cfg.view_num),
    }


# -------------------------------------------------------------------- forward

def _scale_links(links, H, W, h, w):
    """links (M,4,V) at image res (h,w) -> feature res (H,W)
    (reference: links[:,1:3] * (H-1)/(h-1))."""
    l = links.astype(jnp.float32)
    scaled = jnp.concatenate([
        links[:, :1, :],
        ((H - 1.0) / (h - 1.0) * l[:, 1:3, :]).astype(jnp.int32),
        links[:, 3:, :]], axis=1)
    return scaled.astype(jnp.int32)


def _level_links(links_p1, rep_row):
    """Carry p1-row links to a coarser level via representative child rows."""
    ok = rep_row >= 0
    out = links_p1[jnp.clip(rep_row, 0)]
    return jnp.where(ok[:, None, None], out, 0)


def bpnet_forward(params, cfg: BPNetConfig, grid_p1: SparseGrid,
                  imgs: jnp.ndarray, links_p1: jnp.ndarray,
                  down_caps: Sequence[int]):
    """grid_p1: voxel grid (feats = colors in [-1,1]); imgs: (V,H,W,3)
    normalized; links_p1: (M,4,V) [batch,row,col,valid] at image res.

    Returns (softmax3d (M,classes), logits2d (V,h,w,classes),
    feat3d (M,96))."""
    V, h, w, _ = imgs.shape
    if cfg.compute_dtype == "bfloat16":
        cast = (lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x)
        params = jax.tree.map(cast, params)
        imgs = imgs.astype(jnp.bfloat16)
        grid_p1 = dataclasses.replace(
            grid_p1, feats=grid_p1.feats.astype(jnp.bfloat16))
    p2d = params["unet2d"]
    x, x2, x3, x4, x5 = unet2d.encoder_apply(p2d, imgs)

    p3d = params["unet3d"]
    out_p1 = unet3d.layer0(p3d, grid_p1)
    out_b1p2 = unet3d.down_stage(p3d, 1, out_p1, down_caps[0])
    out_b2p4 = unet3d.down_stage(p3d, 2, out_b1p2, down_caps[1])
    out_b3p8 = unet3d.down_stage(p3d, 3, out_b2p4, down_caps[2])
    out_b4p16 = unet3d.down_stage(p3d, 4, out_b3p8, down_caps[3])

    # ancestry chains p1 -> p2 -> p4 -> p8 -> p16
    rep2 = representative_child(out_p1, out_b1p2)
    rep4_l = representative_child(out_b1p2, out_b2p4)
    rep8_l = representative_child(out_b2p4, out_b3p8)
    rep16_l = representative_child(out_b3p8, out_b4p16)
    rep4 = jnp.where(rep4_l >= 0, rep2[jnp.clip(rep4_l, 0)], -1)
    rep8 = jnp.where(rep8_l >= 0, rep4[jnp.clip(rep8_l, 0)], -1)
    rep16 = jnp.where(rep16_l >= 0, rep8[jnp.clip(rep16_l, 0)], -1)

    def links_at(grid_level_rep, feat_hw):
        l = (links_p1 if grid_level_rep is None
             else _level_links(links_p1, grid_level_rep))
        return _scale_links(l, feat_hw[0], feat_hw[1], h, w)

    # Linking @ p5
    fused3d, fused2d = apply_linking(
        params["linker_p5"], x5, out_b4p16,
        links_at(rep16, x5.shape[1:3]), cfg.view_num)

    p4 = unet2d.up_block(p2d, "up4", "delayer4", fused2d, x4)
    feat3d = unet3d.up_stage(p3d, "convtr4", fused3d, out_b3p8)

    fused3d, fused2d = apply_linking(
        params["linker_p4"], p4, feat3d,
        links_at(rep8, p4.shape[1:3]), cfg.view_num)

    p3 = unet2d.up_block(p2d, "up3", "delayer3", fused2d, x3)
    g = unet3d.blocks_on_cat(p3d, "block5", fused3d, out_b3p8.feats)
    feat3d = unet3d.up_stage(p3d, "convtr5", g, out_b2p4)

    fused3d, fused2d = apply_linking(
        params["linker_p3"], p3, feat3d,
        links_at(rep4, p3.shape[1:3]), cfg.view_num)

    p2 = unet2d.up_block(p2d, "up2", "delayer2", fused2d, x2)
    g = unet3d.blocks_on_cat(p3d, "block6", fused3d, out_b2p4.feats)
    feat3d = unet3d.up_stage(p3d, "convtr6", g, out_b1p2)

    fused3d, fused2d = apply_linking(
        params["linker_p2"], p2, feat3d,
        links_at(rep2, p2.shape[1:3]), cfg.view_num)

    g = unet3d.blocks_on_cat(p3d, "block7", fused3d, out_b1p2.feats)
    feat3d = unet3d.up_stage(p3d, "convtr7", g, out_p1)

    g = unet3d.blocks_on_cat(p3d, "block8", feat3d, out_p1.feats)
    res3d_feat = g.feats.astype(jnp.float32)            # (M, 96)
    logits3d = unet3d.cls_head(p3d, g).astype(jnp.float32)
    softmax3d = jax.nn.softmax(logits3d, axis=-1) * g.mask[:, None]

    logits2d = unet2d.cls_apply(p2d, fused2d, (h, w)).astype(jnp.float32)
    return softmax3d, logits2d, res3d_feat


# ------------------------------------------------------------------ the model

class BPNet:
    def __init__(self, cfg: BPNetConfig, params=None, key=None):
        self.cfg = cfg
        self.params = params if params is not None else init_bpnet_params(
            key if key is not None else jax.random.key(0), cfg)
        # jitted forward, recompiled only when (M, dims, caps) change;
        # params passed as an ARGUMENT (closures would embed 30+ MB of
        # weights as HLO constants)
        self._jit = jax.jit(
            lambda p, g, im, l, caps: bpnet_forward(p, self.cfg, g, im, l,
                                                    caps),
            static_argnames=("caps",))
        # voxelization structure cache (aug=0 only): during fine-tuning
        # xyz AND feats are frozen, so (vcoords, inds_reconstruct,
        # first_idx, dims, the SparseGrid itself) are CONSTANT between
        # topology changes — the 4.2M-row np.unique + full-cloud link
        # building were ~4.5 s of the 5.0 s refresh (probe_bpnet_42m).
        # With the cache, per-refresh host work is image IO + link
        # projection over the M~1e5 voxel-representative points only.
        self._vox_cache = None

    def _select_views(self, frames_path: List[str], image_path: str):
        """Deterministic view split; the current frame leads when present
        (reference train_bpnet :500-516 + get_2d insert(0,...))."""
        V = self.cfg.view_num
        partial_n = max(1, len(frames_path) // V)
        buckets = [frames_path[v * partial_n:(v + 1) * partial_n]
                   for v in range(V - 1)]
        buckets.append(frames_path[(V - 1) * partial_n:])
        rng = np.random.default_rng(abs(hash(image_path)) % (2 ** 31))
        chosen = []
        for v in range(V):
            if image_path in buckets[v]:
                chosen.insert(0, image_path)
            else:
                chosen.append(buckets[v][rng.integers(len(buckets[v]))]
                              if buckets[v] else image_path)
        return chosen[:V]

    def _load_view(self, path: str, coords_world: np.ndarray,
                   intrinsic4: np.ndarray,
                   rng: "np.random.Generator | None" = None):
        from PIL import Image
        wh = self.cfg.img_wh
        with Image.open(path) as im:
            im = im.resize(wh, Image.NEAREST)
            if self.cfg.aug and rng is not None and rng.random() < 0.5:
                # train-time 2D augmentation (reference
                # bpnet_dataset/augmentation_2d.py RandomGaussianBlur: p=0.5
                # 5x5 cv2.GaussianBlur). The reference aug pipeline's other
                # member, Crop([h+1,w+1], 'rand', mean padding), only ADDS a
                # 1px mean border without moving content (pad_half=0 and the
                # rand offset range collapses to 0), so the blur is the only
                # content-changing transform and links/labels stay aligned.
                from PIL import ImageFilter
                im = im.filter(ImageFilter.GaussianBlur(radius=1.1))
            img = np.asarray(im, np.float32)
        dp = path.replace("color", "depth").replace(".jpg", ".png")
        with Image.open(dp) as im:
            depth = np.asarray(im.resize(wh, Image.NEAREST),
                               np.float32) / 1000.0
        pose = np.loadtxt(path.replace("color", "pose")
                          .replace(".jpg", ".txt")).astype(np.float64)
        link = np.ones((len(coords_world), 4), np.int32)
        link[:, 1:4] = compute_linking(intrinsic4, pose, coords_world, depth,
                                       self.cfg.voxel_size)
        lp = path.replace("color", "label").replace(".jpg", ".png")
        label2d = None
        if os.path.exists(lp):
            with Image.open(lp) as im:
                label2d = np.asarray(
                    im.convert("I").resize(wh, Image.NEAREST), np.int64)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return img, link, label2d

    def train_bpnet(self, locs_in: np.ndarray, feats_in: np.ndarray,
                    train_id_paths, image_path, intrinsic4: np.ndarray,
                    device_out: bool = False):
        """Full-cloud semantic inference for one training step.

        Returns (labels3d (N,), probs3d (N,classes), labels2d
        (V,h,w) argmax maps, point_feat (N,96), gt2d (V,h,w) or None).

        device_out: devoxelize ON DEVICE and return labels/probs/feat as
        jax arrays — the consumer (SemanticDriver) writes them straight
        back into the device-resident cloud, so the (N,classes)+(N,96)
        tensors never cross the host link (at 4.2M points that round-trip
        is ~4 GB through the remote-TPU tunnel per refresh)."""
        frames = train_id_paths[0] if isinstance(
            train_id_paths[0], (list, tuple)) else train_id_paths
        if isinstance(image_path, (list, tuple)):
            image_path = image_path[0]
        views = self._select_views(list(frames), image_path)
        rng = (np.random.default_rng() if self.cfg.aug else None)

        # ---- voxelization structure (cached while the cloud is unchanged)
        cache = None
        if not self.cfg.aug:
            fp = (locs_in.shape, feats_in.shape,
                  float(locs_in[:: max(1, len(locs_in) // 997)].sum(dtype=np.float64)),
                  float(feats_in[:: max(1, len(feats_in) // 997)].sum(dtype=np.float64)))
            if self._vox_cache is not None and self._vox_cache["fp"] == fp:
                cache = self._vox_cache
        if cache is not None:
            grid = cache["grid"]
            inds_rec = cache["inds_rec"]
            inds_rec_np = cache["inds_rec_np"]
            first_idx = cache["first_idx"]
            down_caps = cache["down_caps"]
            link_pts = cache["link_pts"]
        else:
            link_pts = locs_in

        imgs, links, gts = [], [], []
        for vpath in views:
            # links are built from the ORIGINAL coords (reference get_2d runs
            # before prevoxel_transforms); on a cache hit only the M voxel-
            # representative points need projecting — the voxelize step below
            # would have reduced the (N,4,V) links to links[first_idx] anyway
            img, link, gt = self._load_view(vpath, link_pts, intrinsic4,
                                            rng=rng)
            imgs.append(img)
            links.append(link)
            gts.append(gt)
        imgs = np.stack(imgs)                       # (V,h,w,3)
        links = np.stack(links, axis=-1)            # (N or M, 4, V)
        links[:, 0, :] = 0

        if cache is not None:
            vlinks = links                          # already at voxel rows
        else:
            # prevoxel ElasticDistortion (reference bpneter/bpnet.py:515 —
            # links come from the ORIGINAL coords above, then the distorted
            # cloud is voxelized)
            locs_vox = (prevoxel_distort(locs_in, rng) if self.cfg.aug
                        else locs_in)
            vcoords, vfeats, inds_rec_np, vlinks, first_idx = voxelize(
                locs_vox, feats_in, self.cfg.voxel_size, links,
                return_first=True)
            vfeats = vfeats / 127.5 - 1.0
            dims = tuple(int(d) for d in vcoords.max(0) + 1)
            M = len(vcoords)
            grid = make_sparse_grid(jnp.asarray(vcoords),
                                    jnp.asarray(vfeats), dims)
            down_caps = (M, M, max(M // 2, 64), max(M // 4, 64))
            inds_rec = jnp.asarray(inds_rec_np)
            if not self.cfg.aug:
                self._vox_cache = {
                    "fp": fp, "grid": grid, "inds_rec": inds_rec,
                    "inds_rec_np": inds_rec_np,
                    "first_idx": first_idx, "down_caps": down_caps,
                    "link_pts": np.ascontiguousarray(locs_in[first_idx]),
                }

        softmax3d, logits2d, feat3d = self._jit(
            self.params, grid, jnp.asarray(imgs), jnp.asarray(vlinks),
            down_caps)

        labels2d = np.asarray(jnp.argmax(logits2d, -1))
        gt2d = (np.stack(gts) if all(g is not None for g in gts) else None)
        if device_out:
            ir = jnp.asarray(inds_rec)
            probs = softmax3d.astype(jnp.float32)[ir]
            point_feat = feat3d.astype(jnp.float32)[ir]
            labels = jnp.argmax(probs, -1).astype(jnp.int32)
            return labels, probs, labels2d, point_feat, gt2d
        # devoxelize on the HOST, in f32: cast bf16 outputs on-device first
        # — numpy fancy-indexing over ml_dtypes bf16 arrays is ~40x slower
        # than f32 (probe_bpnet_42m: 84 s vs 18 s per 4.2M-point refresh)
        probs = np.asarray(softmax3d.astype(jnp.float32))[inds_rec_np]
        labels = probs.argmax(-1)
        point_feat = np.asarray(feat3d.astype(jnp.float32))[inds_rec_np]
        return labels, probs, labels2d, point_feat, gt2d
