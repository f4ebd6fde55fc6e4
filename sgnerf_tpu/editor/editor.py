"""Point-cloud editing operations: crop / add / rigid transform + meshlab
selection matching.

Reference: /root/reference/Editor/pointcloud_editor.py:21-93 and test.py's
KDTree selection workflow. The reference's O(N*M) python loops become
vectorized KD-tree (scipy) / chunked numpy operations.
"""
from __future__ import annotations

import numpy as np

from .pointcloud import NeuralPointCloudEdit


def match_selection(cloud: NeuralPointCloudEdit, selected_xyz: np.ndarray,
                    tol: float = 1e-4) -> np.ndarray:
    """Map a meshlab-exported selection (bare xyz) back to neural-point rows
    (reference Editor/test.py:45-80, open3d KDTree)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(cloud.xyz)
    d, idx = tree.query(selected_xyz, k=1)
    return np.unique(idx[d <= tol])


def crop_point_cloud(child: NeuralPointCloudEdit,
                     father: NeuralPointCloudEdit,
                     tol: float = 1e-7) -> NeuralPointCloudEdit:
    """Remove `child`'s points from `father` (exact-position match,
    reference :21-59)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(child.xyz)
    d, _ = tree.query(father.xyz, k=1)
    return father.select(d > tol)


def add_point_cloud(child: NeuralPointCloudEdit,
                    father: NeuralPointCloudEdit) -> NeuralPointCloudEdit:
    return NeuralPointCloudEdit(
        xyz=np.concatenate([child.xyz, father.xyz]),
        embedding=np.concatenate([child.embedding, father.embedding]),
        conf=np.concatenate([child.conf, father.conf]),
        dir=np.concatenate([child.dir, father.dir]),
        color=np.concatenate([child.color, father.color]),
        label=np.concatenate([child.label, father.label]),
        params=father.params)


def transform_point_cloud_global(cloud: NeuralPointCloudEdit,
                                 T: np.ndarray) -> NeuralPointCloudEdit:
    """xyz @ R + t (world frame, reference :59-68). NOTE: the reference
    right-multiplies by R (not R^T) — kept for parity with its transform
    files. Stored point dirs rotate WITH the part (deliberate deviation from
    reference :67, which leaves them canonical: the aggregator applies Rw2c
    to sampled_dir (point_aggregators.py:648), so dirs must be in the moved
    world frame for that rotation to restore the canonical frame — the
    reference combo double-rotates, unnoticed because its shipped configs
    set shading_feature_mlp_layer3=0)."""
    R, t = T[:3, :3], T[:3, 3]
    out = cloud.select(np.ones(cloud.n, bool))
    out.xyz = cloud.xyz @ R + t
    out.dir = cloud.dir @ R
    return out


def transform_point_cloud_local(cloud: NeuralPointCloudEdit,
                                T: np.ndarray) -> NeuralPointCloudEdit:
    """Rotate about the cloud centroid (reference :70-81); dirs rotate with
    the part (see transform_point_cloud_global)."""
    R, t = T[:3, :3], T[:3, 3]
    center = cloud.xyz.mean(0)
    out = cloud.select(np.ones(cloud.n, bool))
    out.xyz = (cloud.xyz - center) @ R + t + center
    out.dir = cloud.dir @ R
    return out
