"""Neural point cloud: capacity-padded struct-of-arrays in HBM.

Functional re-design of the reference `NeuralPoints` nn.Module
(/root/reference/models/neural_points/neural_points.py):
  * per-point tensors: xyz [N,3], embedding [N,32] (`points_embeding`),
    conf [N,1], dir [N,3], color [N,3], feats [N,3] (raw RGB for BPNet),
    label [N], label_prob [N,C], sem_embedding [N,96]
    (`bpnet_points_embedding`), plus Rw2c: either a global [3,3] or, for
    edited scenes with rotated parts, a part table [T,3,3] indexed by the
    per-point `rot_idx` (the reference stores a dense per-point [N,3,3],
    neural_points.py:647-651; one int per point + a tiny table gathers
    9x cheaper on TPU);
  * set_points (:575), grow_points (:546), prune (:520),
    set_bpnet_feats (:653).

TPU-first deltas:
  * fixed capacity `Nmax` + an `active` mask keep every shape static under
    jit; grow writes into padding slots, prune flips mask bits. The grid is
    rebuilt in-process — no grow-save-exit()-restart loop (reference
    run/train_ft.py:930-954 + the bash relaunch wrapper).
  * arrays are [N,C] (the reference's [1,N,C] leading batch dim is dropped;
    the checkpoint converter adapts).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid import GridSpec, PointGrid, build_point_grid, compute_grid_spec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeuralPointCloud:
    xyz: jnp.ndarray             # (Nmax,3) f32
    embedding: jnp.ndarray       # (Nmax,F) f32
    conf: jnp.ndarray            # (Nmax,1) f32
    dir: jnp.ndarray             # (Nmax,3) f32
    color: jnp.ndarray           # (Nmax,3) f32
    feats: jnp.ndarray           # (Nmax,3) f32 raw RGB (BPNet input)
    label: jnp.ndarray           # (Nmax,) int32
    label_prob: jnp.ndarray      # (Nmax,C) f32
    sem_embedding: jnp.ndarray   # (Nmax,S) f32
    Rw2c: jnp.ndarray            # (3,3) uniform, or (T,3,3) per-part table
    rot_idx: jnp.ndarray         # (Nmax,) int32 row into Rw2c when (T,3,3)
    active: jnp.ndarray          # (Nmax,) bool
    n_active: jnp.ndarray        # () int32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


def make_point_cloud(xyz: np.ndarray, embedding: np.ndarray,
                     conf: Optional[np.ndarray] = None,
                     dir: Optional[np.ndarray] = None,
                     color: Optional[np.ndarray] = None,
                     feats: Optional[np.ndarray] = None,
                     label: Optional[np.ndarray] = None,
                     label_prob: Optional[np.ndarray] = None,
                     sem_embedding: Optional[np.ndarray] = None,
                     Rw2c: Optional[np.ndarray] = None,
                     rot_idx: Optional[np.ndarray] = None,
                     capacity: Optional[int] = None,
                     num_classes: int = 20,
                     sem_dim: int = 96) -> NeuralPointCloud:
    """Host-side constructor with capacity padding (pads go far out of range
    so they never enter the grid)."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    n = len(xyz)
    cap = int(capacity or n)
    assert cap >= n

    def pad(a, default_shape, fill=0.0):
        if a is None:
            a = np.full((n,) + default_shape, fill, np.float32)
        a = np.asarray(a, np.float32).reshape(n, -1)
        out = np.zeros((cap, a.shape[1]), np.float32)
        out[:n] = a
        return out

    pxyz = np.full((cap, 3), 1e9, np.float32)
    pxyz[:n] = xyz
    emb = pad(embedding, (embedding.shape[-1],))
    lbl = np.zeros(cap, np.int32)
    if label is not None:
        lbl[:n] = np.asarray(label).reshape(-1).astype(np.int32)
    lp = np.zeros((cap, num_classes), np.float32)
    if label_prob is not None:
        lp[:n] = np.asarray(label_prob, np.float32).reshape(n, -1)
    active = np.zeros(cap, bool)
    active[:n] = True
    return NeuralPointCloud(
        xyz=jnp.asarray(pxyz),
        embedding=jnp.asarray(emb),
        conf=jnp.asarray(pad(conf, (1,), 1.0)),
        dir=jnp.asarray(pad(dir, (3,))),
        color=jnp.asarray(pad(color, (3,))),
        feats=jnp.asarray(pad(feats, (3,))),
        label=jnp.asarray(lbl),
        label_prob=jnp.asarray(lp),
        sem_embedding=jnp.asarray(pad(sem_embedding, (sem_dim,))),
        Rw2c=jnp.asarray(Rw2c if Rw2c is not None else np.eye(3, dtype=np.float32)),
        rot_idx=jnp.asarray(np.concatenate(
            [np.asarray(rot_idx, np.int32).reshape(-1),
             np.zeros(cap - n, np.int32)]) if rot_idx is not None
            else np.zeros(cap, np.int32)),
        active=jnp.asarray(active),
        n_active=jnp.asarray(n, jnp.int32),
    )


def build_grid(cloud: NeuralPointCloud, spec: GridSpec) -> PointGrid:
    return build_point_grid(cloud.xyz, cloud.active, spec)


def grid_spec_for_cloud(cloud: NeuralPointCloud, vsize, vscale, kernel_size,
                        max_o, P, ranges=None, **spec_kwargs) -> GridSpec:
    xyz = np.asarray(cloud.xyz)
    act = np.asarray(cloud.active)
    return compute_grid_spec(xyz[act], vsize, vscale, kernel_size, max_o, P,
                             ranges=ranges, **spec_kwargs)


def prune(cloud: NeuralPointCloud, thresh: float) -> NeuralPointCloud:
    """Deactivate points with conf below thresh (reference `prune`, :520-543).
    In-process and shape-stable: only the `active` mask changes."""
    keep = cloud.active & (cloud.conf[:, 0] >= thresh)
    return dataclasses.replace(
        cloud,
        xyz=jnp.where(keep[:, None], cloud.xyz, 1e9),
        active=keep,
        n_active=jnp.sum(keep).astype(jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def _grow_jit(cloud: NeuralPointCloud, new_xyz, new_embedding, new_conf,
              new_color, new_dir, g) -> NeuralPointCloud:
    gb = new_xyz.shape[0]
    start = cloud.n_active
    k = jnp.arange(gb, dtype=jnp.int32)
    ok = (k < g) & (start + k < cloud.capacity)
    # rejected rows (bucket padding / over-capacity) target the OUT-OF-
    # BOUNDS index and DROP — never a clipped in-range slot, which a
    # legitimate new point could also target (a duplicate-index .set()
    # race whose winner XLA leaves unspecified)
    idx = jnp.where(ok, start + k, cloud.capacity)

    def put(dst, src):
        return dst.at[idx].set(jnp.asarray(src, dst.dtype), mode="drop")

    return dataclasses.replace(
        cloud,
        xyz=put(cloud.xyz, new_xyz),
        embedding=put(cloud.embedding, new_embedding),
        conf=put(cloud.conf, new_conf),
        color=put(cloud.color, new_color),
        dir=put(cloud.dir, new_dir),
        active=cloud.active.at[idx].set(True, mode="drop"),
        n_active=(start + jnp.sum(ok)).astype(jnp.int32),
    )


def grow(cloud: NeuralPointCloud, new_xyz, new_embedding, new_conf,
         new_color, new_dir) -> NeuralPointCloud:
    """Append G new points into padding slots (reference `grow_points`,
    :546-572). Caller must ensure n_active + G <= capacity (re-allocate
    host-side with a larger capacity otherwise).

    ONE jitted dispatch with the cloud DONATED: every attribute buffer
    updates in place (eager .at[].set was 7 separate dispatches, each
    copying its full multi-GB buffer through the runtime — the "~19 s
    host-side concat" in the round-3 grow probe). G pads to a 4096 bucket
    so repeated grows share one compile."""
    g = int(np.asarray(new_xyz).shape[0])
    if g == 0:
        return cloud
    gb = max(4096, (g + 4095) // 4096 * 4096)

    def padded(a, w):
        a = np.asarray(a, np.float32).reshape(g, -1)
        assert a.shape[1] == w, (a.shape, w)
        if gb == g:
            return jnp.asarray(a)
        return jnp.asarray(np.concatenate(
            [a, np.zeros((gb - g, w), np.float32)]))

    return _grow_jit(cloud, padded(new_xyz, 3), padded(new_embedding,
                                                       cloud.embedding.shape[-1]),
                     padded(new_conf, 1), padded(new_color, 3),
                     padded(new_dir, 3), jnp.asarray(g, jnp.int32))


def set_bpnet_feats(cloud: NeuralPointCloud, label_prob, label,
                    sem_embedding) -> NeuralPointCloud:
    """Attach per-point semantic predictions (reference :653-665)."""
    n = label.shape[0]
    return dataclasses.replace(
        cloud,
        label=cloud.label.at[:n].set(label.astype(jnp.int32)),
        label_prob=cloud.label_prob.at[:n].set(label_prob),
        sem_embedding=cloud.sem_embedding.at[:n].set(sem_embedding),
    )
