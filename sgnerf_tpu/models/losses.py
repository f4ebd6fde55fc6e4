"""Training losses.

Reference semantics: `BaseRenderingModel.compute_losses`
(/root/reference/models/base_rendering_model.py:534-662):
  * ray_masked_<item>: MSE restricted to rays with ray_mask>0;
  * ray_miss_<item>: MSE over missed rays, scaled by the missed-ray count;
  * <item>: plain MSE vs gt;
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
                   sparse_loss_weight: float = 0.0,
                   zero_epsilon: float = 1e-3,
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (loss_total, per-loss dict). gt_image: (B,R,3)."""
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
        else:
            loss = jnp.mean((output[name] - gt_image) ** 2)
        losses[name] = loss
        total = total + loss * w + 1e-6

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
