"""2D ResUNet (ResNet-34 encoder + FPN decoder) for the BPNet 2D branch.

Reference: /root/reference/models/bpneter/unet_2d.py (ResUnet over resnet.py's
ResNet-34: layer0 = conv7x7 s2 + bn + maxpool s2; layer1..4 standard; decoder
up4/3/2 3x3 convs on bilinearly upsampled maps concatenated with the encoder
skip, delayer = BasicBlock stacks; cls head 96->256->classes).

The ImageNet-pretrained initialization (torchvision) is unavailable offline —
weights load via the checkpoint converter or init randomly. Functional
params, NHWC.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..mvs import conv2d, batch_norm, upsample2x_bilinear


def relu(x):
    return jax.nn.relu(x)


def _conv(key, kh, kw, ci, co, dtype=jnp.float32):
    fan = kh * kw * ci
    return jax.random.normal(key, (kh, kw, ci, co), dtype) * np.sqrt(2.0 / fan)


def _bn(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "running_mean": jnp.zeros((c,), dtype),
            "running_var": jnp.ones((c,), dtype)}


def bn_act(x, p, act=True):
    return batch_norm(x, p, slope=0.0, act=act)


def init_basic_block2d(key, ci, co, stride=1):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv(k1, 3, 3, ci, co), "bn1": _bn(co),
         "conv2": _conv(k2, 3, 3, co, co), "bn2": _bn(co)}
    if stride != 1 or ci != co:
        p["downsample"] = {"conv": _conv(k3, 1, 1, ci, co), "bn": _bn(co)}
    return p


def apply_basic_block2d(p, x, stride=1):
    # stride is STATIC (first block of layers 2-4 downsamples) — it must not
    # live in the params pytree or jit would trace it
    y = bn_act(conv2d(x, p["conv1"], stride=stride), p["bn1"])
    y = batch_norm(conv2d(y, p["conv2"]), p["bn2"], act=False)
    if "downsample" in p:
        x = batch_norm(conv2d(x, p["downsample"]["conv"], stride=stride),
                       p["downsample"]["bn"], act=False)
    return relu(y + x)


def _layer(key, ci, co, n, stride):
    keys = jax.random.split(key, n)
    blocks = [init_basic_block2d(keys[0], ci, co, stride)]
    for i in range(1, n):
        blocks.append(init_basic_block2d(keys[i], co, co, 1))
    return blocks


# encoder layer index -> first-block stride
LAYER_STRIDES = {1: 1, 2: 2, 3: 2, 4: 2}


def init_unet2d_params(key, classes: int = 20, layers34=(3, 4, 6, 3)):
    keys = iter(jax.random.split(key, 32))
    p: Dict[str, Any] = {}
    p["conv1"] = _conv(next(keys), 7, 7, 3, 64)
    p["bn1"] = _bn(64)
    p["layer1"] = _layer(next(keys), 64, 64, layers34[0], 1)
    p["layer2"] = _layer(next(keys), 64, 128, layers34[1], 2)
    p["layer3"] = _layer(next(keys), 128, 256, layers34[2], 2)
    p["layer4"] = _layer(next(keys), 256, 512, layers34[3], 2)
    p["up4"] = {"conv": _conv(next(keys), 3, 3, 512, 256), "bn": _bn(256)}
    p["delayer4"] = _layer(next(keys), 512, 256, layers34[3], 1)
    p["up3"] = {"conv": _conv(next(keys), 3, 3, 256, 128), "bn": _bn(128)}
    p["delayer3"] = _layer(next(keys), 256, 128, layers34[2], 1)
    p["up2"] = {"conv": _conv(next(keys), 3, 3, 128, 96), "bn": _bn(96)}
    p["delayer2"] = _layer(next(keys), 96 + 64, 96, layers34[1], 1)
    p["cls"] = {"conv1": _conv(next(keys), 3, 3, 96, 256), "bn": _bn(256),
                "conv2": _conv(next(keys), 1, 1, 256, classes),
                "bias2": jnp.zeros((classes,))}
    return p


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def resize_to(x, hw):
    """align_corners=True bilinear (the reference decoder's F.interpolate)."""
    from ..mvs import resize_bilinear_align_corners
    return resize_bilinear_align_corners(x, (hw[0], hw[1]))


def encoder_apply(p, imgs):
    """imgs (N,H,W,3) -> x (1/4), x2 (1/4), x3 (1/8), x4 (1/16), x5 (1/32)."""
    x = bn_act(conv2d(imgs, p["conv1"], stride=2), p["bn1"])
    x = max_pool_3x3_s2(x)
    outs = [x]
    cur = x
    for li in (1, 2, 3, 4):
        for bi, b in enumerate(p[f"layer{li}"]):
            cur = apply_basic_block2d(
                b, cur, stride=LAYER_STRIDES[li] if bi == 0 else 1)
        outs.append(cur)
    return tuple(outs)


def up_block(p, up_name, de_name, x_coarse, x_skip):
    y = resize_to(x_coarse, x_skip.shape[1:3])
    y = bn_act(conv2d(y, p[up_name]["conv"]), p[up_name]["bn"])
    y = jnp.concatenate([y, x_skip], axis=-1)
    for b in p[de_name]:
        y = apply_basic_block2d(b, y)
    return y


def cls_apply(p, x, out_hw):
    y = bn_act(conv2d(x, p["cls"]["conv1"]), p["cls"]["bn"])
    y = conv2d(y, p["cls"]["conv2"]) + p["cls"]["bias2"]
    return resize_to(y, out_hw)
