"""MVS-in-the-loop feed-forward training: gradients reach the MVS nets
through the rendered pixels (reference mvs_points_volumetric_model.py:144)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.mvs import MVSConfig, init_mvs_params
from sgnerf_tpu.models.renderer import RenderConfig
from sgnerf_tpu.models.feedforward import make_feedforward_step
from sgnerf_tpu.ops.grid import compute_grid_spec
from sgnerf_tpu.ops.camera import get_dtu_raydir


def _batch(rng, H=24, W=32, V=2):
    f = 24.0
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2ws = np.stack([np.eye(4, dtype=np.float32)] * V)
    c2ws[1, 0, 3] = 0.1  # slight baseline
    w2cs = np.stack([np.linalg.inv(c) for c in c2ws]).astype(np.float32)
    imgs = rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32)
    # bumpy depth plane at ~2m
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gt_depth = (2.0 + 0.2 * np.sin(gx / 5.0) * np.cos(gy / 4.0)).astype(
        np.float32)

    px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    pix = np.stack([px, py], -1).reshape(-1, 2)
    sel = rng.integers(0, len(pix), 128)
    rd = np.asarray(get_dtu_raydir(jnp.asarray(pix[sel]), jnp.asarray(intr),
                                   jnp.eye(3), True), np.float32)
    gt_img = rng.uniform(0, 1, (1, 128, 3)).astype(np.float32)
    return {
        "images": jnp.asarray(imgs),
        "c2ws": jnp.asarray(c2ws), "w2cs": jnp.asarray(w2cs),
        "intrinsics": jnp.asarray(np.stack([intr] * V)),
        "depth_intr": jnp.asarray(intr),
        "near_far": jnp.asarray([0.5, 4.0], np.float32),
        "gt_depth": jnp.asarray(gt_depth),
        "campos": jnp.zeros((1, 3)),
        "raydir": jnp.asarray(rd[None]),
        "camrotc2w": jnp.eye(3)[None],
        "near": jnp.asarray(0.5), "far": jnp.asarray(4.0),
        "bg_color": jnp.ones(3),
        "gt_image": jnp.asarray(gt_img),
    }


def test_feedforward_trains_mvs_through_render():
    rng = np.random.default_rng(0)
    corners = np.array([[-3, -3, -0.5], [3, 3, 4.0]], np.float32)
    spec = compute_grid_spec(corners, vsize=[0.1] * 3, vscale=[1, 1, 1],
                             kernel_size=[3, 3, 3], max_o=8192, P=8)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=48, SR=8, K=4,
                       vsize=(0.1,) * 3, jitter=0.0)
    mvs_cfg = MVSConfig()
    params = {
        "agg": init_aggregator_params(jax.random.key(0), cfg.agg),
        "mvs": init_mvs_params(jax.random.key(1), mvs_cfg),
    }
    tx_a, tx_m = optax.adam(5e-4), optax.adam(5e-4)
    opt_states = {"agg": tx_a.init(params["agg"]),
                  "mvs": tx_m.init(params["mvs"])}
    step_fn = make_feedforward_step(mvs_cfg, cfg, spec, tx_a, tx_m,
                                    alter_step=0)

    batch = _batch(rng)
    key = jax.random.key(2)
    mvs_before = np.asarray(
        jax.tree.leaves(params["mvs"]["FeatureNet"])[0]).copy()
    hist = []
    for s in range(25):
        key, k = jax.random.split(key)
        params, opt_states, losses = step_fn(params, opt_states, batch, k,
                                             jnp.asarray(s))
        hist.append(float(losses["total"]))
    assert float(losses["n_points"]) > 100  # depth plane unprojected
    # loss decreases on a fixed batch
    assert np.mean(hist[-5:]) < np.mean(hist[:5]) * 0.9, hist
    # MVS weights moved: the render loss reaches FeatureNet
    mvs_after = np.asarray(jax.tree.leaves(params["mvs"]["FeatureNet"])[0])
    assert np.abs(mvs_after - mvs_before).max() > 1e-6


def test_feedforward_alternating_updates():
    """alter_step=1: even steps touch only agg params, odd only mvs."""
    rng = np.random.default_rng(1)
    corners = np.array([[-3, -3, -0.5], [3, 3, 4.0]], np.float32)
    spec = compute_grid_spec(corners, vsize=[0.1] * 3, vscale=[1, 1, 1],
                             kernel_size=[3, 3, 3], max_o=8192, P=8)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=48, SR=8, K=4,
                       vsize=(0.1,) * 3, jitter=0.0)
    mvs_cfg = MVSConfig()
    params = {
        "agg": init_aggregator_params(jax.random.key(0), cfg.agg),
        "mvs": init_mvs_params(jax.random.key(1), mvs_cfg),
    }
    tx_a, tx_m = optax.adam(1e-3), optax.adam(1e-3)
    opt_states = {"agg": tx_a.init(params["agg"]),
                  "mvs": tx_m.init(params["mvs"])}
    step_fn = make_feedforward_step(mvs_cfg, cfg, spec, tx_a, tx_m,
                                    alter_step=1)
    batch = _batch(rng)

    def delta(p, q, part):
        return max(float(jnp.abs(x - y).max()) for x, y in
                   zip(jax.tree.leaves(p[part]), jax.tree.leaves(q[part])))

    p0 = params
    p1, opt_states, _ = step_fn(p0, opt_states, batch,
                                jax.random.key(3), jnp.asarray(0))
    assert delta(p1, p0, "agg") > 0 and delta(p1, p0, "mvs") == 0
    p2, opt_states, _ = step_fn(p1, opt_states, batch,
                                jax.random.key(4), jnp.asarray(1))
    assert delta(p2, p1, "agg") == 0 and delta(p2, p1, "mvs") > 0
