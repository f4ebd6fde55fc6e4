"""Loss formulas vs hand computations (reference compute_losses semantics)."""
import pytest

import numpy as np
import jax.numpy as jnp

from sgnerf_tpu.models.losses import compute_losses, masked_mse, mse2psnr

pytestmark = pytest.mark.fast


def _out(rng, R=10):
    pred = rng.uniform(0, 1, size=(1, R, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, size=(1, R, 3)).astype(np.float32)
    mask = np.zeros((1, R), bool)
    mask[0, : R // 2] = True
    return pred, gt, mask


def test_masked_mse_matches_numpy():
    rng = np.random.default_rng(0)
    pred, gt, mask = _out(rng)
    got = float(masked_mse(jnp.asarray(pred), jnp.asarray(gt),
                           jnp.asarray(mask)))
    want = np.mean((pred[0, mask[0]] - gt[0, mask[0]]) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # empty mask -> exactly 0
    zero = float(masked_mse(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.zeros((1, 10), bool)))
    assert zero == 0.0


def test_compute_losses_weights_and_quirks():
    rng = np.random.default_rng(1)
    pred, gt, mask = _out(rng)
    conf = rng.uniform(0.1, 0.9, size=(1, 10, 4, 2)).astype(np.float32)
    weight = rng.uniform(0, 1, size=(1, 10, 4, 2)).astype(np.float32)
    out = {"coarse_raycolor": jnp.asarray(pred),
           "ray_mask": jnp.asarray(mask),
           "conf_coefficient": jnp.asarray(conf),
           "weight": jnp.asarray(weight)}
    total, losses = compute_losses(
        out, jnp.asarray(gt),
        color_loss_items=("ray_masked_coarse_raycolor",
                          "ray_miss_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.5, 0.25),
        zero_one_loss_items=("conf_coefficient",),
        zero_one_loss_weights=(1e-4,),
        sparse_loss_weight=0.1, zero_epsilon=1e-3)

    m = mask[0]
    l_masked = np.mean((pred[0, m] - gt[0, m]) ** 2)
    miss = ~m
    l_miss = np.mean((pred[0, miss] - gt[0, miss]) ** 2) * miss.sum()
    l_all = np.mean((pred - gt) ** 2)
    v = np.clip(conf, 1e-3, 1 - 1e-3)
    l_01 = np.mean(np.log(v) + np.log(1 - v))
    l_sp = np.sum(weight * np.abs(1 - np.exp(-2 * conf))) / (weight.sum()
                                                             + 1e-6)
    # each color loss adds +1e-6 (reference quirk)
    want = (l_masked * 1.0 + l_miss * 0.5 + l_all * 0.25 + 3e-6
            + l_01 * 1e-4 + l_sp * 0.1)
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    np.testing.assert_allclose(float(losses["ray_miss_coarse_raycolor"]),
                               l_miss, rtol=1e-5)


def test_mse2psnr():
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0,
                               atol=1e-4)


def test_depth_bg_l2size_families():
    """depth / bg / l2_size families vs the reference formulas
    (base_rendering_model.py:611-649)."""
    rng = np.random.default_rng(2)
    pred, gt, mask = _out(rng)
    depth = rng.uniform(0.5, 3.0, size=(1, 10)).astype(np.float32)
    gt_depth = rng.uniform(0.5, 3.0, size=(1, 10)).astype(np.float32)
    gt_mask = (rng.uniform(size=(1, 10)) > 0.4).astype(np.float32)
    bg_t = rng.uniform(0, 1, size=(1, 10, 1)).astype(np.float32)
    emb = rng.normal(size=(1, 10, 4)).astype(np.float32)
    out = {"coarse_raycolor": jnp.asarray(pred),
           "ray_mask": jnp.asarray(mask),
           "coarse_depth": jnp.asarray(depth),
           "coarse_is_background": jnp.asarray(bg_t),
           "some_embedding": jnp.asarray(emb)}
    total, losses = compute_losses(
        out, jnp.asarray(gt),
        color_loss_items=("coarse_raycolor",), color_loss_weights=(1.0,),
        depth_loss_items=("coarse_depth",), depth_loss_weights=(0.7,),
        bg_loss_items=("coarse_is_background",), bg_loss_weights=(0.3,),
        l2_size_loss_items=("some_embedding",), l2_size_loss_weights=(0.1,),
        gt_depth=jnp.asarray(gt_depth), gt_mask=jnp.asarray(gt_mask))
    l_col = np.mean((pred - gt) ** 2)
    l_d = np.mean((depth * gt_mask - gt_depth * gt_mask) ** 2)
    inv = 1.0 - gt_mask
    l_bg = np.mean((bg_t[..., 0] * inv - inv) ** 2)
    l_l2 = np.mean(emb ** 2)
    want = l_col + 1e-6 + 0.7 * l_d + 0.3 * l_bg + 0.1 * l_l2
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    np.testing.assert_allclose(float(losses["coarse_depth"]), l_d, rtol=1e-5)
    np.testing.assert_allclose(float(losses["coarse_is_background"]), l_bg,
                               rtol=1e-5)


def test_ray_depth_masked_color_loss():
    """ray_depth_masked_<item> restricts the color MSE to rays with valid gt
    depth (base_rendering_model.py:565-575)."""
    rng = np.random.default_rng(3)
    pred, gt, mask = _out(rng)
    dmask = np.zeros((1, 10), np.float32)
    dmask[0, 2:7] = 1.0
    out = {"coarse_raycolor": jnp.asarray(pred),
           "ray_mask": jnp.asarray(mask),
           "ray_depth_mask": jnp.asarray(dmask)}
    total, losses = compute_losses(
        out, jnp.asarray(gt),
        color_loss_items=("ray_depth_masked_coarse_raycolor",),
        color_loss_weights=(1.0,))
    sel = dmask[0] > 0
    want = np.mean((pred[0, sel] - gt[0, sel]) ** 2)
    np.testing.assert_allclose(
        float(losses["ray_depth_masked_coarse_raycolor"]), want, rtol=1e-5)
