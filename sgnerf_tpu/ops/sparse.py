"""Sparse 3D convolution via sorted-voxel gather/scatter (XLA).

TPU-native replacement for MinkowskiEngine (the C++/CUDA extension behind the
reference's MinkUNet18A and Linking modules — SURVEY.md §2.5 item 3):
  * a `SparseGrid` holds voxel coords (M,3), features (M,C), a validity mask
    (capacity padding for static shapes), and a dense coord->row map over a
    fixed bounding box;
  * stride-1 conv: gather the K^3 neighbors' rows and contract
    (M,K3,Ci)x(K3,Ci,Co) on the MXU;
  * stride-2 down conv (kernel 2): output coords = unique(coords>>1), each
    gathering its 2^3 children;
  * stride-2 transpose conv (kernel 2): each fine voxel reads its parent with
    the kernel tap selected by (coord & 1) — this reproduces
    MinkowskiConvolutionTranspose onto the encoder's saved coordinate set
    (the `get_coords_map` ancestry used by bpm.py:64).

At 5 cm voxels a ScanNet room is ~1e5 occupied voxels in a <=2^24-cell box:
the dense map costs 64 MB int32 per stride level — cheap in HBM, O(1) lookup.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseGrid:
    coords: jnp.ndarray   # (M,3) int32 voxel coords (at this stride level)
    feats: jnp.ndarray    # (M,C) f32
    mask: jnp.ndarray     # (M,) bool — live rows
    lookup: jnp.ndarray   # (X*Y*Z,) int32 coord->row (-1 empty)
    dims: Tuple[int, int, int]  # STATIC grid extent (pytree aux data, so
    #                             SparseGrid works as a jit argument)

    @property
    def M(self) -> int:
        return self.coords.shape[0]

    def tree_flatten(self):
        return ((self.coords, self.feats, self.mask, self.lookup),
                tuple(self.dims))

    @classmethod
    def tree_unflatten(cls, dims, children):
        return cls(*children, dims=dims)


def _linear(coords, dims):
    return (coords[..., 0] * (dims[1] * dims[2])
            + coords[..., 1] * dims[2] + coords[..., 2])


def make_sparse_grid(coords: jnp.ndarray, feats: jnp.ndarray,
                     dims: Tuple[int, int, int],
                     mask: Optional[jnp.ndarray] = None) -> SparseGrid:
    """coords int (M,3) in [0, dims); rows with mask=False are padding.
    `dims` must be a static python tuple."""
    M = coords.shape[0]
    if mask is None:
        mask = jnp.ones((M,), bool)
    dims = tuple(int(d) for d in dims)
    nvox = int(np.prod(dims))
    lin = jnp.where(mask, _linear(coords, jnp.asarray(dims, jnp.int32)), nvox)
    lookup = jnp.full((nvox,), -1, jnp.int32).at[lin].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    return SparseGrid(coords=coords.astype(jnp.int32), feats=feats,
                      mask=mask, lookup=lookup, dims=dims)


def _offsets(k: int) -> np.ndarray:
    """Minkowski kernel offsets for odd k (centered) or k=2 ({0,1}^3)."""
    if k % 2 == 1:
        r = np.arange(k) - k // 2
    else:
        r = np.arange(k)
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.int32)


def _gather_rows(grid: SparseGrid, coords):
    """coords (...,3) -> (row (...,), valid (...,))."""
    dims = jnp.asarray(grid.dims, jnp.int32)
    inb = jnp.all((coords >= 0) & (coords < dims), axis=-1)
    lin = jnp.clip(_linear(coords, dims), 0,
                   grid.lookup.shape[0] - 1)
    row = jnp.where(inb, grid.lookup[lin], -1)
    return row, row >= 0


def sparse_conv(grid: SparseGrid, weight: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, kernel_size: int = 3
                ) -> jnp.ndarray:
    """Stride-1 sparse conv on the grid's own coords.

    weight: (K3, Ci, Co). Returns (M, Co)."""
    offs = jnp.asarray(_offsets(kernel_size))          # (K3,3)
    nbr = grid.coords[:, None, :] + offs               # (M,K3,3)
    row, ok = _gather_rows(grid, nbr)
    f = grid.feats[jnp.clip(row, 0)] * ok[..., None]   # (M,K3,Ci)
    out = jnp.einsum("mkc,kcd->md", f, weight,
                     preferred_element_type=jnp.float32
                     ).astype(weight.dtype)  # f32 accumulate, weight dtype out
    if bias is not None:
        out = out + bias
    return out * grid.mask[:, None]


def sparse_conv_down(grid: SparseGrid, weight: jnp.ndarray,
                     out_capacity: int,
                     bias: Optional[jnp.ndarray] = None
                     ) -> Tuple[SparseGrid, jnp.ndarray]:
    """Kernel-2 stride-2 down conv: returns the coarse SparseGrid (coords =
    unique(parent>>1), capacity-padded) and its features.

    weight: (8, Ci, Co)."""
    M = grid.M
    parent = jnp.where(grid.mask[:, None], grid.coords >> 1, 0)
    pdims_t = tuple((d + 1) // 2 for d in grid.dims)
    pdims = jnp.asarray(pdims_t, jnp.int32)
    # build unique parent set via sort
    plin = jnp.where(grid.mask, _linear(parent, pdims),
                     jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(plin)
    s = plin[order]
    is_first = jnp.concatenate(
        [(s[:1] < jnp.iinfo(jnp.int32).max),
         (s[1:] != s[:-1]) & (s[1:] < jnp.iinfo(jnp.int32).max)])
    rank = jnp.cumsum(is_first) - 1
    oc = jnp.zeros((out_capacity, 3), jnp.int32)
    tgt = jnp.where(is_first & (rank < out_capacity), rank, out_capacity)
    oc = oc.at[tgt].set(parent[order], mode="drop")
    omask = jnp.zeros((out_capacity,), bool).at[tgt].set(True, mode="drop")

    out_grid = make_sparse_grid(
        oc, jnp.zeros((out_capacity, weight.shape[-1])), pdims_t, mask=omask)

    offs = jnp.asarray(_offsets(2))                    # (8,3)
    child = oc[:, None, :] * 2 + offs                  # (Mo,8,3)
    row, ok = _gather_rows(grid, child)
    f = grid.feats[jnp.clip(row, 0)] * ok[..., None]
    out = jnp.einsum("mkc,kcd->md", f, weight,
                     preferred_element_type=jnp.float32).astype(weight.dtype)
    if bias is not None:
        out = out + bias
    out = out * omask[:, None]
    return dataclasses.replace(out_grid, feats=out), out


def sparse_conv_up(coarse: SparseGrid, fine_coords: jnp.ndarray,
                   fine_mask: jnp.ndarray, weight: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Kernel-2 stride-2 transpose conv onto the saved fine coordinate set.

    weight: (8, Ci, Co) [tap index = parity bits of the fine coord].
    Returns (Mf, Co)."""
    parent = fine_coords >> 1
    tap = ((fine_coords[:, 0] & 1) * 4 + (fine_coords[:, 1] & 1) * 2
           + (fine_coords[:, 2] & 1))                  # (Mf,)
    row, ok = _gather_rows(coarse, parent)
    f = coarse.feats[jnp.clip(row, 0)] * ok[..., None]  # (Mf,Ci)
    w = weight[tap]                                     # (Mf,Ci,Co)
    out = jnp.einsum("mc,mcd->md", f, w,
                     preferred_element_type=jnp.float32).astype(weight.dtype)
    if bias is not None:
        out = out + bias
    return out * fine_mask[:, None]


def sparse_batch_norm(feats, mask, p, eps=1e-5, act=None, momentum=None):
    """BatchNorm over live rows (training-style statistics computed on the
    fly — BPNet freezes BN during fine-tuning (`fix_bn`, bpnet.py:50), so
    inference uses the stored running stats instead)."""
    if "running_mean" in p and p.get("use_running", True) is not False:
        mean = p["running_mean"]
        var = p["running_var"]
    else:
        m = mask[:, None].astype(feats.dtype)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(feats * m, 0) / cnt
        var = jnp.sum((feats - mean) ** 2 * m, 0) / cnt
    y = (feats - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]
    y = y * mask[:, None]
    return act(y) if act is not None else y
