"""Point growing ("probe holes") — in-process.

Reference: probe_hole (/root/reference/run/train_ft.py:425-540) + the
grow-save-exit()-restart loop (:917-954 and the dev_scripts bash wrapper).
Here growing happens in-process: probe frames are rendered with the prob-mode
outputs, miss-pixels adjacent to hit-pixels harvest new points at the
max-opacity shading location, and the cloud grows into its capacity padding
(grid rebuilt) with no restart.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.renderer import render_rays


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _probe_render_sharded(params, cloud, grid, cfg, mesh, campos, raydir,
                          camrotc2w, near, far, bg_color):
    """Probe render under --ray_shards: Mosaic kernels cannot be GSPMD-
    partitioned (PERFORMANCE.md round 5), so once the state is replicated
    over the ray mesh EVERY render — including this prob-mode one — must run
    inside shard_map or it refuses to compile on real multi-chip TPU. The
    jit wrapper also caches render_rays_sharded's out_specs shape probe."""
    from ..parallel.sharded import render_rays_sharded
    return render_rays_sharded(params, cloud, grid, cfg, mesh,
                               campos=campos, raydir=raydir,
                               camrotc2w=camrotc2w, near=near, far=far,
                               bg_color=bg_color, is_train=False, prob=True)


PROBE_KEYS = ("coarse_raycolor", "ray_mask", "ray_max_sample_loc_w",
              "ray_max_shading_opacity", "ray_max_far_dist",
              "shading_avg_color", "shading_avg_dir", "shading_avg_conf",
              "shading_avg_embedding")


def probe_grid_for_step(model, opt, step):
    """Tier-based probe-query widening (reference probe_hole,
    run/train_ft.py:434-438): past each `prob_tiers` threshold the probe
    uses the next kernel_size triple from `prob_kernel_size`; once tiers
    are exhausted probing stops (:891). The query kernel is static in
    GridSpec, so a widened tier builds a temporary probe grid.

    Returns (grid, exhausted)."""
    if getattr(opt, "prob_kernel_size", None) is None:
        return model.grid, False
    tiers = np.asarray(opt.prob_tiers)
    tier = int(np.sum(tiers < step))
    if tier >= len(opt.prob_kernel_size) // 3:
        return None, True
    ks = [int(k) for k in
          np.asarray(opt.prob_kernel_size)[tier * 3:tier * 3 + 3]]
    if tuple(ks) == tuple(model.spec.kernel_size):
        return model.grid, False
    from ..models.point_cloud import grid_spec_for_cloud, build_grid
    kw = dict(model.grid_kwargs)
    kw["kernel_size"] = ks
    spec = grid_spec_for_cloud(model.state.cloud, **kw)
    print(f"probe tier {tier}: query kernel {ks}, building probe grid")
    return build_grid(model.state.cloud, spec), False


def render_probe_maps(model, item, chunk_rays: int = 2304,
                      grid=None) -> Dict[str, np.ndarray]:
    """Full-frame prob-mode render scattered into H x W maps."""
    raydir = np.asarray(item["raydir"], np.float32)
    pix = np.asarray(item["pixel_idx"]).astype(np.int64)
    H, W = item["h"], item["w"]
    mesh = getattr(model, "ray_mesh", None)
    if mesh is not None:
        # each shard_map shard takes a contiguous ray block
        chunk_rays = -(-chunk_rays // mesh.size) * mesh.size
    R = len(raydir)
    pad = (-R) % chunk_rays
    rd = np.concatenate([raydir, np.zeros((pad, 3), np.float32)]) if pad \
        else raydir
    maps: Dict[str, np.ndarray] = {}
    st = model.state
    if grid is None:
        grid = model.grid
    cam = dict(
        campos=jnp.asarray(item["campos"][None]),
        camrotc2w=jnp.asarray(item["camrotc2w"][None]),
        near=jnp.asarray(item["near"]), far=jnp.asarray(item["far"]),
        bg_color=jnp.asarray(item["bg_color"]))
    for s in range(0, len(rd), chunk_rays):
        raydir_c = jnp.asarray(rd[s:s + chunk_rays][None])
        if mesh is not None:
            out = _probe_render_sharded(st.params, st.cloud, grid,
                                        model.cfg, mesh, raydir=raydir_c,
                                        **cam)
        else:
            out = render_rays(st.params, st.cloud, grid, model.cfg,
                              raydir=raydir_c, is_train=False, prob=True,
                              **cam)
        n = min(chunk_rays, R - s)
        cpix = pix[s:s + n]
        for key in PROBE_KEYS:
            v = np.asarray(out[key][0])[:n]
            if v.ndim == 1:
                v = v[:, None]
            if key not in maps:
                maps[key] = np.zeros((H, W, v.shape[-1]), v.dtype)
            maps[key][cpix[:, 1], cpix[:, 0]] = v
    return maps


def probe_and_grow(model, dataset, opt, key, opacity_thresh: float = 0.7):
    """Select probe frames, harvest hole points, grow the cloud."""
    if getattr(model, "_spatial_tstate", None) is not None:
        # probe rendering runs on the replicated cloud/grid: fold trained
        # shard attributes back first (grow_points re-shards afterwards)
        model._sync_from_spatial()
    rng = np.random.default_rng(np.asarray(
        jax.random.key_data(key)).ravel()[-1])
    grid, exhausted = probe_grid_for_step(model, opt,
                                          int(model.state.step))
    if exhausted:
        print("probe_and_grow: prob tiers exhausted, skipping")
        return 0
    max_num = max(1, len(dataset) // max(opt.prob_num_step, 1))
    frame_ids = rng.permutation(len(dataset))[:max_num]

    add = {k: [] for k in ("xyz", "embedding", "conf", "color", "dir")}
    H, W = dataset.height, dataset.width
    for i in frame_ids:
        item = dataset.get_item(int(i), full_img=True)
        maps = render_probe_maps(model, item, grid=grid)
        pix = np.asarray(item["pixel_idx"]).astype(np.int64)
        gt_map = np.zeros((H, W, 3), np.float32)
        gt_map[pix[:, 1], pix[:, 0]] = item["gt_image"]
        edge_mask = np.zeros((H, W), bool)
        edge_mask[pix[:, 1], pix[:, 0]] = True
        bg = np.asarray(item["bg_color"], np.float32)

        ray_mask = maps["ray_mask"][..., 0]
        miss = (ray_mask < 1) & (
            np.linalg.norm(gt_map - bg, axis=-1) > 0.002) & edge_mask
        # dilate miss-pixels by 1 (3x3) — "holes next to surface"
        from scipy.ndimage import binary_dilation
        near_miss = binary_dilation(miss, np.ones((3, 3), bool))
        grow_mask = (ray_mask > 0) & near_miss & (
            maps["ray_max_shading_opacity"][..., 0] > opacity_thresh)
        if opt.far_thresh > 0:
            far = (ray_mask > 0) & (
                maps["ray_max_far_dist"][..., 0] > opt.far_thresh) & (
                np.linalg.norm(gt_map - maps["coarse_raycolor"], axis=-1)
                < 0.1)
            grow_mask |= far
        if not grow_mask.any():
            continue
        add["xyz"].append(maps["ray_max_sample_loc_w"][grow_mask])
        add["embedding"].append(maps["shading_avg_embedding"][grow_mask])
        add["conf"].append(maps["shading_avg_conf"][grow_mask] * opt.prob_mul)
        add["color"].append(maps["shading_avg_color"][grow_mask])
        add["dir"].append(maps["shading_avg_dir"][grow_mask])

    if not add["xyz"]:
        print("probe_and_grow: no holes found")
        return 0
    new = {k: np.concatenate(v) for k, v in add.items()}
    model.grow_points(new["xyz"], new["embedding"], new["conf"],
                      new["color"], new["dir"])
    return len(new["xyz"])
