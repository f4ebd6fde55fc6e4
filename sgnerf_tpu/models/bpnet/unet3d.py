"""Sparse 3D UNet (MinkUNet18A) as BPNet's stage decomposition.

Reference: /root/reference/models/bpneter/unet_3d.py (MinkUNetBase with
BLOCK=BasicBlock, LAYERS=(2,)*8, PLANES=(32,64,128,256,128,128,96,96),
INIT_DIM=32; conv0 kernel 5, down/up kernel 2 stride 2, blocks kernel 3) and
the stage split in bpnet.py:227-239:
  layer0 = conv0+bn+relu                      (p1 coords)
  layer1..4 = down-conv+bn+relu+block_i       (p2,p4,p8,p16)
  layer5 = convtr4+bn+relu                    (-> p8)
  layer6 = block5 ∘ [cat skip] ; convtr5+bn+relu (-> p4)
  layer7 = block6 ∘ [cat] ; convtr6+bn+relu   (-> p2)
  layer8 = block7 ∘ [cat] ; convtr7+bn+relu   (-> p1)
  layer9 = block8 ∘ [cat]                     (96-d final feature)
  cls    = final 1x1 conv -> classes

MinkowskiEngine is replaced by the sorted-voxel gather/scatter sparse ops
(ops/sparse.py); coordinate ancestry (`get_coords_map`) is implicit in the
per-level SparseGrid objects.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse import (SparseGrid, sparse_conv, sparse_conv_down,
                           sparse_conv_up, sparse_batch_norm)

PLANES_18A = (32, 64, 128, 256, 128, 128, 96, 96)
LAYERS_18 = (2, 2, 2, 2, 2, 2, 2, 2)
INIT_DIM = 32


def _he_conv(key, k3, ci, co, dtype=jnp.float32):
    fan = k3 * ci
    return jax.random.normal(key, (k3, ci, co), dtype) * np.sqrt(2.0 / fan)


def _bn(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "running_mean": jnp.zeros((c,), dtype),
            "running_var": jnp.ones((c,), dtype)}


def init_basic_block(key, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _he_conv(k1, 27, ci, co), "bn1": _bn(co),
         "conv2": _he_conv(k2, 27, co, co), "bn2": _bn(co)}
    if ci != co:
        p["downsample"] = {"conv": _he_conv(k3, 1, ci, co), "bn": _bn(co)}
    return p


def apply_basic_block(p, grid: SparseGrid, train_bn=False) -> jnp.ndarray:
    relu = jax.nn.relu
    x = grid.feats
    y = sparse_conv(grid, p["conv1"], kernel_size=3)
    y = sparse_batch_norm(y, grid.mask, p["bn1"], act=relu)
    y = sparse_conv(dataclasses.replace(grid, feats=y), p["conv2"],
                    kernel_size=3)
    y = sparse_batch_norm(y, grid.mask, p["bn2"])
    if "downsample" in p:
        x = sparse_conv(grid, p["downsample"]["conv"], kernel_size=1)
        x = sparse_batch_norm(x, grid.mask, p["downsample"]["bn"])
    return relu(y + x) * grid.mask[:, None]


def _apply_blocks(blocks, grid):
    for bp in blocks:
        grid = dataclasses.replace(grid, feats=apply_basic_block(bp, grid))
    return grid


def init_unet3d_params(key, in_channels: int, out_channels: int,
                       planes=PLANES_18A, layers=LAYERS_18):
    keys = iter(jax.random.split(key, 80))
    p: Dict[str, Any] = {}
    p["conv0p1s1"] = _he_conv(next(keys), 125, in_channels, INIT_DIM)
    p["bn0"] = _bn(INIT_DIM)
    inp = INIT_DIM
    for i in range(4):
        p[f"conv{i+1}"] = _he_conv(next(keys), 8, inp, inp)
        p[f"bn{i+1}"] = _bn(inp)
        blocks = []
        ci = inp
        for _ in range(layers[i]):
            blocks.append(init_basic_block(next(keys), ci, planes[i]))
            ci = planes[i]
        p[f"block{i+1}"] = blocks
        inp = planes[i]
    # decoder
    p["convtr4"] = _he_conv(next(keys), 8, planes[3], planes[4])
    p["bntr4"] = _bn(planes[4])
    dec_specs = [  # (block name, cin, cout, convtr name, tr_cin, tr_cout)
        ("block5", planes[4] + planes[2], planes[4], "convtr5", planes[4],
         planes[5]),
        ("block6", planes[5] + planes[1], planes[5], "convtr6", planes[5],
         planes[6]),
        ("block7", planes[6] + planes[0], planes[6], "convtr7", planes[6],
         planes[7]),
    ]
    for bname, cin, cout, tname, tci, tco in dec_specs:
        blocks = []
        ci = cin
        for _ in range(2):
            blocks.append(init_basic_block(next(keys), ci, cout))
            ci = cout
        p[bname] = blocks
        p[tname] = _he_conv(next(keys), 8, tci, tco)
        p[f"bntr{tname[-1]}"] = _bn(tco)
    blocks = []
    ci = planes[7] + INIT_DIM
    for _ in range(2):
        blocks.append(init_basic_block(next(keys), ci, planes[7]))
        ci = planes[7]
    p["block8"] = blocks
    p["final"] = {"kernel": _he_conv(next(keys), 1, planes[7], out_channels),
                  "bias": jnp.zeros((out_channels,))}
    return p


# ------------------------------------------------------------ staged forward

def layer0(p, grid: SparseGrid) -> SparseGrid:
    f = sparse_conv(grid, p["conv0p1s1"], kernel_size=5)
    f = sparse_batch_norm(f, grid.mask, p["bn0"], act=jax.nn.relu)
    return dataclasses.replace(grid, feats=f)


def down_stage(p, i: int, grid: SparseGrid, cap: int) -> SparseGrid:
    g, f = sparse_conv_down(grid, p[f"conv{i}"], cap)
    f = sparse_batch_norm(f, g.mask, p[f"bn{i}"], act=jax.nn.relu)
    return _apply_blocks(p[f"block{i}"], dataclasses.replace(g, feats=f))


def up_stage(p, tr: str, coarse: SparseGrid, fine: SparseGrid) -> SparseGrid:
    up = sparse_conv_up(coarse, fine.coords, fine.mask, p[tr])
    up = sparse_batch_norm(up, fine.mask, p[f"bntr{tr[-1]}"], act=jax.nn.relu)
    return dataclasses.replace(fine, feats=up)


def blocks_on_cat(p, bname: str, grid: SparseGrid,
                  skip_feats: jnp.ndarray) -> SparseGrid:
    g = dataclasses.replace(
        grid, feats=jnp.concatenate([grid.feats, skip_feats], axis=-1))
    return _apply_blocks(p[bname], g)


def cls_head(p, grid: SparseGrid) -> jnp.ndarray:
    return (jnp.einsum("mc,kcd->md", grid.feats, p["final"]["kernel"])
            + p["final"]["bias"]) * grid.mask[:, None]
