"""Feed-forward (cross-scene) training: MVS nets + aggregator jointly.

Reference: /root/reference/run/train.py + MvsPointsVolumetricModel.forward
with feedforward=1 (models/mvs_points_volumetric_model.py:144-155): per
batch the MVS nets generate the point cloud INSIDE the autograd graph, the
render loss trains FeatureNet/premlp through the rendered pixels, and the
optimizer alternates between the shading and MVS groups (:130-134).

The jitted joint step lives in sgnerf_tpu/models/feedforward.py; this
driver assembles per-item batches (images, poses, depth-unprojection
inputs, a random ray subset) and runs the loop. Requires --ranges (the
voxel-grid spec must be static for the step to compile once).
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
import optax  # noqa: E402

from sgnerf_tpu.options import TrainOptions, configs_from_opt  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.models.mvs import MVSConfig, init_mvs_params  # noqa: E402
from sgnerf_tpu.models.aggregator import init_aggregator_params  # noqa: E402
from sgnerf_tpu.models.feedforward import make_feedforward_step  # noqa: E402
from sgnerf_tpu.ops.grid import compute_grid_spec  # noqa: E402
from sgnerf_tpu.utils.visualizer import Visualizer  # noqa: E402


def _downsample_depth(depth, max_hw=(48, 64)):
    """Cap the unprojected point count: every depth pixel becomes a point
    slot (static shapes), so the depth map is strided down to <= max_hw."""
    H, W = depth.shape
    sy = max(1, (H + max_hw[0] - 1) // max_hw[0])
    sx = max(1, (W + max_hw[1] - 1) // max_hw[1])
    return depth[::sy, ::sx], sy, sx


def make_ff_batch(dataset, idx, opt, rng, n_rays=1024):
    """Assemble a feedforward batch from an init-view group + a ray batch."""
    init = dataset.get_init_item(idx % len(dataset))
    item = dataset.get_item(idx % len(dataset), rng=rng)
    intr = np.asarray(init["intrinsics"][0], np.float32)
    w2cs = np.asarray(init["w2cs"], np.float32)
    c2ws = np.stack([np.linalg.inv(m) for m in w2cs]).astype(np.float32)
    depth = np.asarray(init["gt_depth"], np.float32)
    depth, sy, sx = _downsample_depth(depth)
    dintr = intr.copy()
    dintr[0] /= sx
    dintr[1] /= sy
    return {
        "images": jnp.asarray(np.asarray(init["images"], np.float32)),
        "c2ws": jnp.asarray(c2ws), "w2cs": jnp.asarray(w2cs),
        "intrinsics": jnp.asarray(np.asarray(init["intrinsics"],
                                             np.float32)),
        "depth_intr": jnp.asarray(dintr),
        "near_far": jnp.asarray([float(init["near"]), float(init["far"])],
                                np.float32),
        "gt_depth": jnp.asarray(depth),
        "campos": jnp.asarray(item["campos"][None]),
        "raydir": jnp.asarray(item["raydir"][None]),
        "camrotc2w": jnp.asarray(item["camrotc2w"][None]),
        "near": jnp.asarray(item["near"]), "far": jnp.asarray(item["far"]),
        "bg_color": jnp.asarray(item["bg_color"]),
        "gt_image": jnp.asarray(item["gt_image"][None]),
    }


def main():
    opt = TrainOptions().parse()
    assert opt.feedforward, "run/train.py is the feedforward trainer"
    assert opt.ranges[0] > -99.0, \
        "--ranges is required for feedforward training (static grid spec)"
    visualizer = Visualizer(opt)
    opt.split = "train"
    dataset = create_dataset(opt)
    cfg, tcfg, grid_kwargs = configs_from_opt(opt)

    ranges = np.asarray(opt.ranges, np.float32)
    spec = compute_grid_spec(ranges.reshape(2, 3), **grid_kwargs)
    mvs_cfg = MVSConfig(depth_grid=opt.depth_grid,
                        point_features_dim=opt.point_features_dim,
                        init_view_num=opt.init_view_num)

    params = {
        "agg": init_aggregator_params(jax.random.key(1), cfg.agg),
        "mvs": init_mvs_params(jax.random.key(0), mvs_cfg),
    }
    start_step = 0
    out_dir = os.path.join(opt.checkpoints_dir, opt.name or "default")
    if opt.resume_iter not in ("", "0", None):
        import glob
        import pickle
        cands = sorted(glob.glob(os.path.join(out_dir, "*_feedforward.pkl")),
                       key=lambda p: int(os.path.basename(p).split("_")[0]))
        want = (cands[-1:] if opt.resume_iter in ("latest", "best") else
                [os.path.join(out_dir, f"{opt.resume_iter}_feedforward.pkl")])
        if want and os.path.exists(want[0]):
            with open(want[0], "rb") as f:
                params = jax.tree.map(jnp.asarray, pickle.load(f))
            start_step = int(os.path.basename(want[0]).split("_")[0])
            print(f"resumed feedforward params from {want[0]} "
                  f"(step {start_step})")
    tx_agg = optax.adam(opt.lr)
    tx_mvs = optax.adam(opt.mvs_lr if getattr(opt, "mvs_lr", 0) else opt.lr)
    opt_states = {"agg": tx_agg.init(params["agg"]),
                  "mvs": tx_mvs.init(params["mvs"])}
    step_fn = make_feedforward_step(
        mvs_cfg, cfg, spec, tx_agg, tx_mvs, alter_step=opt.alter_step,
        color_loss_items=tuple(tcfg.color_loss_items),
        color_loss_weights=tuple(tcfg.color_loss_weights))

    key = jax.random.key(2)
    rng = np.random.default_rng(0)
    maximum_step = opt.maximum_step or 10000
    t0 = time.time()
    for step in range(start_step, maximum_step):
        batch = make_ff_batch(dataset, int(rng.integers(len(dataset))),
                              opt, rng)
        key, k = jax.random.split(key)
        params, opt_states, losses = step_fn(params, opt_states, batch, k,
                                             jnp.asarray(step))
        visualizer.accumulate_losses(losses)  # lazy: no per-step sync
        if (step + 1) % opt.print_freq == 0:
            visualizer.print_losses(step + 1)
            visualizer.reset()
        if opt.save_iter_freq > 0 and (step + 1) % opt.save_iter_freq == 0:
            out = os.path.join(opt.checkpoints_dir, opt.name or "default")
            os.makedirs(out, exist_ok=True)
            np.savez(os.path.join(out, f"{step + 1}_feedforward.npz"),
                     **{f"agg.{i}": np.asarray(x) for i, x in
                        enumerate(jax.tree.leaves(params["agg"]))})
            import pickle
            with open(os.path.join(out, f"{step + 1}_feedforward.pkl"),
                      "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"feedforward training done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
