"""MVS-based point-cloud bootstrap (the reference's
`gen_points_filter_embeddings`, run/train_ft.py:101-170):

per init view: MVSNet depth inference (or GT depth) -> unproject;
cross-view geometric-consistency filtering; voxel downsample; per-point
embeddings via FeatureNet + premlp. Used when load_points < 1
(BASELINE config 3); load_points == 2 unprojects GT depth maps only.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.mvs import MVSConfig, MvsPointsModel
from ..models.mvs_filter import filter_depths
from .native import vox_downsample_closest


def _mvs_model(opt, key=None) -> MvsPointsModel:
    import jax
    params = None
    if getattr(opt, "pre_d_est", None):
        import os
        if os.path.exists(opt.pre_d_est):
            from ..models.checkpoint_io import (
                convert_official_mvsnet_checkpoint)
            official = convert_official_mvsnet_checkpoint(opt.pre_d_est)
            from ..models.mvs import init_mvs_params
            params = init_mvs_params(jax.random.key(0), MVSConfig())
            params["official"] = official
    return MvsPointsModel(
        MVSConfig(depth_grid=opt.depth_grid,
                  dprob_thresh=opt.dprob_thresh,
                  point_features_dim=opt.point_features_dim,
                  init_view_num=opt.init_view_num),
        params=params, key=key)


def gen_points_filter_embeddings(dataset, opt, key=None):
    """Returns (xyz_world (N,3), embedding, color, dir, conf) numpy arrays."""
    mvs = _mvs_model(opt, key)
    n_views = min(len(dataset), max(1, getattr(opt, "init_view_num", 3) * 8))
    depths, intrs, extrs, confs = [], [], [], []
    use_gt = opt.manual_depth_view == 0
    for i in range(n_views):
        item = dataset.get_init_item(i)
        intr = np.asarray(item["intrinsics"][0], np.float32)
        w2c = np.asarray(item["w2cs"][0], np.float32)
        if use_gt and "gt_depth" in item:
            depth = np.asarray(item["gt_depth"], np.float32)
            conf = np.ones_like(depth)
        else:
            # MVSNet inference at 1/4 feature scale
            imgs = jnp.asarray(item["images"])
            V = imgs.shape[0]
            s = np.diag([0.25, 0.25, 1.0]).astype(np.float32)
            ref_proj = np.eye(4, dtype=np.float32)
            ref_proj[:3, :4] = (s @ intr) @ w2c[:3, :4]
            projs = []
            for v in range(V):
                pv = np.eye(4, dtype=np.float32)
                pv[:3, :4] = (s @ np.asarray(item["intrinsics"][v])) @ \
                    np.asarray(item["w2cs"][v])[:3, :4]
                projs.append((pv @ np.linalg.inv(ref_proj))[:3, :4])
            D = opt.depth_grid
            dvals = jnp.linspace(float(item["near"]), float(item["far"]), D)
            depth_j, conf_j, _ = mvs.predict_depth(
                imgs, jnp.asarray(np.stack(projs)), dvals)
            # upsample the quarter-res depth to depth-map res for filtering
            depth = np.asarray(depth_j)
            conf = np.asarray(conf_j)
            intr = (s @ intr).astype(np.float32)  # filter at feature scale
        depths.append(jnp.asarray(depth))
        confs.append(jnp.asarray(conf))
        intrs.append(jnp.asarray(intr))
        extrs.append(jnp.asarray(w2c))

    thr = opt.depth_conf_thresh if opt.depth_conf_thresh is not None else 0.8
    results = filter_depths(depths, intrs, extrs, confs,
                            depth_conf_thresh=thr,
                            geo_cnsst_num=max(opt.geo_cnsst_num, 0))
    xyz = np.concatenate([r[0] for r in results]) if results else \
        np.zeros((0, 3), np.float32)
    conf_all = np.concatenate([r[1] for r in results]) if results else \
        np.zeros((0,), np.float32)

    ranges = np.asarray(opt.ranges)
    if len(xyz) and ranges[0] > -99.0:
        m = np.all((xyz >= ranges[:3]) & (xyz <= ranges[3:]), axis=-1)
        xyz, conf_all = xyz[m], conf_all[m]
    if len(xyz) and getattr(dataset, "alphas", None) is not None:
        # visual-hull filter for alpha-mask datasets (reference
        # run/train_ft.py:132-137; near/far window only with open ranges,
        # same gate as the reference's `opt.ranges[0] < -90.0`)
        from ..models.mvs_filter import alpha_masking
        nf = dataset.near_far if ranges[0] < -90.0 else None
        m = alpha_masking(
            xyz, dataset.alphas, dataset.view_intrinsics,
            dataset.world2cams, nf,
            alpha_range=getattr(opt, "alpha_range", 0),
            inall_img=getattr(opt, "inall_img", 1))
        xyz, conf_all = xyz[m], conf_all[m]
    if len(xyz) and opt.vox_res > 0:
        keep = vox_downsample_closest(xyz, opt.vox_res)
        xyz, conf_all = xyz[keep], conf_all[keep]

    if len(xyz) == 0:
        raise RuntimeError(
            "MVS bootstrap produced 0 points — check depth_conf_thresh/"
            "geo_cnsst_num (cross-view consistency removed everything)")
    from .scene_model import nearest_view
    emb, color, dirs, _ = mvs.embed_points(xyz.astype(np.float32), dataset,
                                           nearest_view)
    return (xyz.astype(np.float32), emb, color, dirs,
            conf_all.reshape(-1, 1).astype(np.float32))
