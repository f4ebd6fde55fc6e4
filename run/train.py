"""Feed-forward (cross-scene) training: MVS init + aggregator jointly.

Reference: /root/reference/run/train.py:24-366 (`feedforward=1`): per batch,
MVSNet generates the point cloud + embeddings on the fly (no per-point
optimization), and the shading MLPs (+ MVS nets) train across scenes.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.runtime.jax_setup import setup as _jax_setup  # noqa: E402
_jax_setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.options import TrainOptions, configs_from_opt  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.models.mvs import MVSConfig, MvsPointsModel  # noqa: E402
from sgnerf_tpu.models.aggregator import init_aggregator_params  # noqa: E402
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import render_rays  # noqa: E402
from sgnerf_tpu.models.losses import compute_losses  # noqa: E402
from sgnerf_tpu.utils.visualizer import Visualizer  # noqa: E402
from sgnerf_tpu.runtime.scene_model import nearest_view  # noqa: E402
import optax  # noqa: E402


def main():
    opt = TrainOptions().parse()
    assert opt.feedforward, "run/train.py is the feedforward trainer"
    visualizer = Visualizer(opt)
    dataset = create_dataset(opt)
    cfg, tcfg, grid_kwargs = configs_from_opt(opt)

    mvs = MvsPointsModel(MVSConfig(
        depth_grid=opt.depth_grid,
        point_features_dim=opt.point_features_dim,
        init_view_num=opt.init_view_num), key=jax.random.key(0))
    agg_params = init_aggregator_params(jax.random.key(1), cfg.agg)

    tx = optax.adam(opt.lr)
    opt_state = tx.init(agg_params)
    key = jax.random.key(2)
    rng = np.random.default_rng(0)
    maximum_step = opt.maximum_step or 10000

    for step in range(maximum_step):
        idx = int(rng.integers(len(dataset)))
        item = dataset.get_item(idx, full_img=True)

        # per-item point generation via depth unprojection / MVS
        xyz = dataset.load_init_depth_points(vox_res=opt.vox_res or 80) \
            if hasattr(dataset, "load_init_depth_points") else None
        if xyz is None or len(xyz) == 0:
            continue
        emb, col, dirs, conf = mvs.embed_points(xyz, dataset, nearest_view)
        cloud = make_point_cloud(xyz, emb, conf=conf, dir=dirs, color=col)
        spec = grid_spec_for_cloud(cloud, **grid_kwargs)
        grid = build_grid(cloud, spec)

        def loss_fn(params):
            out = render_rays(
                params, cloud, grid, cfg,
                campos=jnp.asarray(item["campos"][None]),
                raydir=jnp.asarray(item["raydir"][None]),
                camrotc2w=jnp.asarray(item["camrotc2w"][None]),
                near=jnp.asarray(item["near"]), far=jnp.asarray(item["far"]),
                bg_color=jnp.asarray(item["bg_color"]),
                key=key, is_train=True)
            total, losses = compute_losses(
                out, jnp.asarray(item["gt_image"][None]),
                color_loss_items=tcfg.color_loss_items,
                color_loss_weights=tcfg.color_loss_weights)
            return total, losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(agg_params)
        updates, opt_state = tx.update(grads, opt_state, agg_params)
        agg_params = optax.apply_updates(agg_params, updates)

        visualizer.accumulate_losses({k: float(v) for k, v in losses.items()})
        if (step + 1) % opt.print_freq == 0:
            visualizer.print_losses(step + 1)
            visualizer.reset()


if __name__ == "__main__":
    main()
