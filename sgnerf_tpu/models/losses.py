"""Training losses.

Reference semantics: `BaseRenderingModel.compute_losses`
(/root/reference/models/base_rendering_model.py:534-662):
  * ray_masked_<item>: MSE restricted to rays with ray_mask>0;
  * ray_miss_<item>: MSE over missed rays, scaled by the missed-ray count;
  * ray_depth_masked_<item>: MSE restricted to rays whose gt depth is valid
    (:565-575 — the reference indexes a full-image `ray_depth_mask` at
    pixel_idx; here the trainer passes the per-ray mask directly);
  * <item>: plain MSE vs gt;
  * depth family (:611-617): MSE(out * gt_mask, gt_depth * gt_mask);
  * bg family (:620-626): MSE(out * (1-gt_mask), 1-gt_mask) — pushes
    background_transmission to 1 off the object mask;
  * l2_size family (:645-649): MSE(out, 0) — plain L2 shrinkage;
  * zero_one on conf_coefficient: mean(log(v) + log(1-v)) with v clamped to
    [eps, 1-eps] — a log-barrier pushing point confidences toward {0,1};
  * sparse loss: sum(w * |1 - exp(-2c)|) / (sum(w) + 1e-6);
  * each color loss contributes an extra +1e-6 to the total (quirk kept for
    parity).

Static-shape versions: torch.masked_select becomes mask-weighted means.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def masked_mse(pred, gt, mask):
    """MSE over the masked subset; 0 when the mask is empty.

    pred/gt: (B,R,3); mask: (B,R) bool."""
    m = mask[..., None].astype(pred.dtype)
    num = jnp.sum(((pred - gt) ** 2) * m)
    elems = jnp.sum(m) * pred.shape[-1]
    return jnp.where(elems > 0, num / jnp.maximum(elems, 1.0), 0.0)


def compute_losses(output: Dict[str, jnp.ndarray], gt_image: jnp.ndarray, *,
                   color_loss_items: Sequence[str],
                   color_loss_weights: Sequence[float],
                   zero_one_loss_items: Sequence[str] = (),
                   zero_one_loss_weights: Sequence[float] = (),
                   depth_loss_items: Sequence[str] = (),
                   depth_loss_weights: Sequence[float] = (),
                   bg_loss_items: Sequence[str] = (),
                   bg_loss_weights: Sequence[float] = (),
                   l2_size_loss_items: Sequence[str] = (),
                   l2_size_loss_weights: Sequence[float] = (),
                   gt_depth: jnp.ndarray = None,
                   gt_mask: jnp.ndarray = None,
                   sparse_loss_weight: float = 0.0,
                   zero_epsilon: float = 1e-3,
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (loss_total, per-loss dict). gt_image: (B,R,3); gt_depth /
    gt_mask: (B,R) per-ray depth supervision + object mask (only required
    when the depth/bg families are enabled)."""
    total = jnp.asarray(0.0, jnp.float32)
    losses: Dict[str, jnp.ndarray] = {}
    ray_mask = output["ray_mask"]

    for name, w in zip(color_loss_items, color_loss_weights):
        if name.startswith("ray_masked"):
            item = name[len("ray_masked") + 1:]
            loss = masked_mse(output[item], gt_image, ray_mask > 0)
        elif name.startswith("ray_miss"):
            item = name[len("ray_miss") + 1:]
            miss = ray_mask == 0
            loss = masked_mse(output[item], gt_image, miss)
            loss = loss * jnp.sum(miss).astype(loss.dtype)
        elif name.startswith("ray_depth_masked"):
            # reference :565-575: restrict to rays with valid gt depth
            # (ray_depth_mask = depth_gt > 0, mvs_points_volumetric_model
            # .py:152). The trainer supplies the per-ray mask.
            item = name[len("ray_depth_masked") + 1:]
            loss = masked_mse(output[item], gt_image,
                              output["ray_depth_mask"] > 0)
        else:
            loss = jnp.mean((output[name] - gt_image) ** 2)
        losses[name] = loss
        total = total + loss * w + 1e-6

    for name, w in zip(depth_loss_items, depth_loss_weights):
        # reference :611-617: MSELoss(out * gt_mask, gt_depth * gt_mask)
        m = gt_mask.astype(jnp.float32)
        loss = jnp.mean((output[name] * m - gt_depth * m) ** 2)
        losses[name] = loss
        total = total + loss * w

    for name, w in zip(bg_loss_items, bg_loss_weights):
        # reference :620-626: MSELoss(out * (1-gt_mask), 1-gt_mask)
        inv = 1.0 - gt_mask.astype(jnp.float32)
        val = output[name]
        if val.ndim == inv.ndim + 1:        # e.g. coarse_is_background (B,R,1)
            val = val[..., 0]
        loss = jnp.mean((val * inv - inv) ** 2)
        losses[name] = loss
        total = total + loss * w

    for name, w in zip(l2_size_loss_items, l2_size_loss_weights):
        # reference :645-649: MSELoss(out, zeros)
        loss = jnp.mean(output[name] ** 2)
        losses[name] = loss
        total = total + loss * w

    for name, w in zip(zero_one_loss_items, zero_one_loss_weights):
        if name not in output or output[name] is None:
            continue
        val = jnp.clip(output[name], zero_epsilon, 1.0 - zero_epsilon)
        loss = jnp.mean(jnp.log(val) + jnp.log(1.0 - val))
        losses[name] = loss
        total = total + loss * w

    if sparse_loss_weight > 0:
        wgt = output["weight"]
        conf = output["conf_coefficient"]
        loss = jnp.sum(wgt * jnp.abs(1.0 - jnp.exp(-2.0 * conf))) / (
            jnp.sum(wgt) + 1e-6)
        losses["sparse"] = loss
        total = total + loss * sparse_loss_weight

    losses["total"] = total
    return total, losses


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
