"""Cross-stack IMAGE-level parity: a scene trained in THIS framework renders
the same frame through the reference's pure-torch pipeline.

The flagship conversion-evidence test (VERDICT r2 item 1): train a small
consistent scene, `export_reference_checkpoint`, load the weights into the
actual reference `PointAggregator` (torch, CPU), feed the reference modules
OUR querier's outputs (the pycuda querier is the only un-runnable reference
piece offline), march with the reference `ray_march`/render/blend/tonemap
functions, scatter with the reference `fill_invalid` semantics, and compare
the full frame against our own render. This exercises every conversion
subtlety end to end: weight transposes, w2pers dist assembly, conf clamp,
PE ordering, per-ray compaction + fill scatter.

Reference: models/neural_points_volumetric_model.py:543-607 (querier ->
aggregator -> ray_dist -> ray_march glue), :158-195 (fill_invalid),
models/rendering/diff_ray_marching.py:509 (ray_march),
models/rendering/diff_render_func.py (radiance/alpha/off registry),
models/aggregators/point_aggregators.py:868-959 (forward).
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                     train_step)
from sgnerf_tpu.models.checkpoint_io import export_reference_checkpoint
from sgnerf_tpu.ops.camera import get_dtu_raydir, w2pers
from sgnerf_tpu.ops.query import query_neighbors
from sgnerf_tpu.ops.raygen import find_ray_generation_method
from sgnerf_tpu.utils.metrics import psnr

from test_aggregator_parity import _ref_aggregator

REF = "/root/reference"


def _train_scene(steps=400, n=3000, W=48, H=36, seed=0):
    """Train the sphere scene our convergence test uses (GT = splat render
    of the actual colored cloud, so the field fits it)."""
    from test_convergence import _splat_gt

    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    rgb = np.clip(xyz * 0.5 + 0.5, 0, 1).astype(np.float32)
    cloud = make_point_cloud(xyz, (rng.uniform(-0.5, 0.5, (n, 32))
                                   .astype(np.float32)),
                             color=rgb, dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.04] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=40000, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.04,) * 3)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    tcfg = TrainConfig(lr=2e-3, plr=5e-3, lr_decay_iters=10 ** 9)
    state = create_train_state(params, cloud, tcfg)

    intr = np.array([[45.0, 0, W / 2], [0, 45.0, H / 2], [0, 0, 1]],
                    np.float32)
    views = []
    for i in range(4):
        a = 2 * np.pi * i / 4
        campos = np.array([2.5 * np.sin(a), 0, -2.5 * np.cos(a)], np.float32)
        fwd = -campos / np.linalg.norm(campos)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        rot = np.stack([right, np.cross(fwd, right), fwd], 1).astype(
            np.float32)
        gt = _splat_gt(xyz, rgb, campos, rot, intr, W, H)
        px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        pix = np.stack([px, py], -1).reshape(-1, 2)
        rd = np.asarray(get_dtu_raydir(jnp.asarray(pix), jnp.asarray(intr),
                                       jnp.asarray(rot), True))
        views.append((campos, rot, rd.astype(np.float32), gt.reshape(-1, 3)))

    key = jax.random.key(1)
    for step in range(steps):
        v = views[step % 4]
        sel = rng.integers(0, len(v[2]), 512)
        batch = {
            "campos": jnp.asarray(v[0][None]),
            "raydir": jnp.asarray(v[2][sel][None]),
            "camrotc2w": jnp.asarray(v[1][None]),
            "near": jnp.asarray(1.0), "far": jnp.asarray(4.5),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(v[3][sel][None]),
        }
        key, k = jax.random.split(key)
        state, _ = train_step(state, grid, cfg, tcfg, batch, k)
    return state, grid, cfg, views, (W, H)


def _reference_render_frame(torch, ref_agg, cloud, q, cfg, campos, raydir,
                            camrotc2w, bg_color):
    """The reference post-query pipeline on OUR querier outputs: assemble
    the 15 querier tensors the CUDA querier would emit (ray-COMPACTED, as
    the reference's neural_points module returns them), run the reference
    aggregator -> ray_dist glue -> ray_march -> tone_map, then the
    fill_invalid scatter back to the full ray set."""
    B, R, _ = raydir.shape
    cap = cloud.capacity
    sample_pidx = np.asarray(q.sample_pidx)            # (B,R,SR,K)
    sample_loc_w = np.asarray(q.sample_loc_w)          # (B,R,SR,3)
    ray_mask = np.asarray(q.ray_mask)                  # (B,R)

    # ray compaction: the reference querier emits only rays with >=1
    # neighbor (neural_points_volumetric_model.py:543 shapes 336 of 1024)
    sel = ray_mask[0]
    sample_pidx = sample_pidx[:, sel]
    sample_loc_w = sample_loc_w[:, sel]
    rd_sel = np.asarray(raydir)[:, sel]
    Rp = int(sel.sum())
    SR, K = sample_pidx.shape[2:]

    mask = sample_pidx >= 0
    pid = np.clip(sample_pidx, 0, cap - 1)
    m4 = mask[..., None].astype(np.float32)

    att = {k: np.asarray(getattr(cloud, k)) for k in
           ("xyz", "embedding", "color", "dir", "conf")}
    sampled_xyz = att["xyz"][pid] * m4
    sampled_embedding = att["embedding"][pid] * m4
    sampled_color = att["color"][pid] * m4
    sampled_dir = att["dir"][pid] * m4
    sampled_conf = att["conf"][pid] * m4

    # perspective coords exactly as our renderer assembles them
    # (models/renderer.py gather_and_aggregate; reference computes these
    # inside the CUDA querier)
    pers = np.asarray(jax.vmap(w2pers)(
        jnp.asarray(sampled_xyz.reshape(B, -1, 3)),
        camrotc2w, campos)).reshape(sampled_xyz.shape)
    sample_loc = np.asarray(jax.vmap(w2pers)(
        jnp.asarray(sample_loc_w.reshape(B, -1, 3)),
        camrotc2w, campos)).reshape(sample_loc_w.shape)
    sample_ray_dirs = np.broadcast_to(
        rd_sel[:, :, None, :], (B, Rp, SR, 3)).copy()

    t = torch.from_numpy
    vsize = np.asarray(cfg.vsize, np.float32)
    with torch.no_grad():
        decoded, ray_valid, _, _ = ref_agg(
            t(sampled_color), None, torch.eye(3), t(sampled_dir),
            t(sampled_conf), t(sampled_embedding), t(pers), t(sampled_xyz),
            t(mask), t(sample_loc.astype(np.float32)),
            t(sample_loc_w.astype(np.float32)),
            t(sample_ray_dirs.astype(np.float32)), vsize, 0.0)

        # ray_dist glue (neural_points_volumetric_model.py:570-577)
        sl = t(sample_loc.astype(np.float32))
        ray_dist = torch.cummax(sl[..., 2], dim=-1)[0]
        ray_dist = torch.cat(
            [ray_dist[..., 1:] - ray_dist[..., :-1],
             torch.full((B, Rp, 1), float(vsize[2]))], dim=-1)
        dmask = ray_dist < 1e-8
        dmask = torch.logical_or(dmask, ray_dist > 2 * vsize[2])  # unit mode
        dmask = dmask.to(torch.float32)
        ray_dist = ray_dist * (1.0 - dmask) + dmask * vsize[2]
        ray_dist = ray_dist * ray_valid.float()

        sys.path.insert(0, REF)
        try:
            from models.rendering.diff_ray_marching import ray_march
            from models.rendering.diff_render_func import (
                find_render_function, find_blend_function, find_tone_map)
        finally:
            sys.path.pop(0)
        ray_color, _, _, _, _, bg_trans, _ = ray_march(
            ray_dist, ray_valid, decoded,
            find_render_function("radiance"), find_blend_function("alpha"),
            t(np.asarray(bg_color, np.float32)))
        ray_color = find_tone_map("off")(ray_color)

        # fill_invalid scatter (neural_points_volumetric_model.py:158-183)
        full = torch.ones((B, R, 3)) * t(np.asarray(bg_color, np.float32))
        inds = torch.nonzero(t(ray_mask.astype(np.uint8)))
        full[inds[..., 0], inds[..., 1], :] = ray_color
        full_bg = torch.ones((B, R, 1))
        full_bg[inds[..., 0], inds[..., 1], :] = bg_trans
    return full.numpy(), full_bg.numpy()


@pytest.mark.slow
def test_cross_stack_image_parity():
    """BASELINE.md's central claim, demonstrated: a checkpoint trained here
    renders the SAME image through the reference torch stack (>= 40 dB)."""
    torch = pytest.importorskip("torch")
    state, grid, cfg, views, (W, H) = _train_scene()
    cloud, params = state.cloud, state.params

    campos_np, rot_np, rd, _ = views[0]
    campos = jnp.asarray(campos_np[None])
    rot = jnp.asarray(rot_np[None])
    raydir = jnp.asarray(rd[None])
    bg = np.ones(3, np.float32)

    # ---- our frame
    out = render_rays(params, cloud, grid, cfg, campos=campos,
                      raydir=raydir, camrotc2w=rot, near=1.0, far=4.5,
                      bg_color=jnp.asarray(bg))
    ours = np.asarray(out["coarse_raycolor"])          # (1,R,3)

    # ---- reference frame from the exported checkpoint
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "net_ray_marching.pth")
        export_reference_checkpoint(
            params, {"xyz": cloud.xyz, "embedding": cloud.embedding,
                     "conf": cloud.conf, "dir": cloud.dir,
                     "color": cloud.color}, path)
        sd = torch.load(path, weights_only=False)
    ref_agg, _ = _ref_aggregator(torch)
    agg_sd = {k[len("aggregator."):]: v for k, v in sd.items()
              if k.startswith("aggregator.")}
    missing, unexpected = ref_agg.load_state_dict(agg_sd, strict=False)
    assert not unexpected, unexpected
    # only buffers the ctor precomputes may be absent from a checkpoint
    assert all("sph" in m or "pos" in m or "freq" in m or "j" in m
               for m in missing), missing

    # the exported neural_points tensors must round-trip the cloud
    np.testing.assert_allclose(sd["neural_points.xyz"].numpy(),
                               np.asarray(cloud.xyz), atol=0)

    # ---- our querier's outputs (the only non-torch reference piece)
    raygen = find_ray_generation_method(cfg.which_ray_generation)
    raypos, _, _, _ = raygen(campos, raydir, cfg.z_depth_dim, near=1.0,
                             far=4.5, jitter=0.0, key=None,
                             domain_size=cfg.domain_size)
    q = query_neighbors(grid, cloud.xyz, raypos, K=cfg.K, SR=cfg.SR,
                        radius_limit=cfg.radius_limit,
                        knn_mode=cfg.knn_mode)

    ref_frame, ref_bg = _reference_render_frame(
        torch, ref_agg, cloud, q, cfg, campos, raydir, rot, bg)

    p = psnr(ref_frame, ours)
    print(f"cross-stack PSNR (reference torch vs ours, {W}x{H} frame): "
          f"{p:.2f} dB")
    assert p >= 40.0, f"cross-stack parity too low: {p:.2f} dB"

    # background structure agrees ray-for-ray
    ours_bg = np.asarray(out["coarse_is_background"])
    np.testing.assert_allclose(ref_bg, ours_bg, atol=1e-4)

    # and the frame is a real image, not background (scene visible)
    fg = (ref_bg[0, :, 0] < 0.5).mean()
    assert fg > 0.2, f"frame is {fg:.0%} foreground — scene not visible"
