"""Editor toolkit tests: ply round-trip, crop/add/transform, checkpoint IO."""
import numpy as np
import pytest

from sgnerf_tpu.editor import (
    NeuralPointCloudEdit, crop_point_cloud, add_point_cloud,
    transform_point_cloud_global, transform_point_cloud_local)
from sgnerf_tpu.editor.editor import match_selection

pytestmark = pytest.mark.fast


def _cloud(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return NeuralPointCloudEdit(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        embedding=rng.normal(size=(n, 32)).astype(np.float32),
        conf=rng.uniform(size=n).astype(np.float32),
        dir=rng.normal(size=(n, 3)).astype(np.float32),
        color=rng.uniform(size=(n, 3)).astype(np.float32),
        label=rng.integers(0, 20, size=n).astype(np.int32))


def test_ply_roundtrip(tmp_path):
    c = _cloud()
    p = str(tmp_path / "origin_neuralpcd.ply")
    c.save_as_ply(p)
    c2 = NeuralPointCloudEdit.load_from_ply(p)
    np.testing.assert_allclose(c2.xyz, c.xyz, atol=1e-6)
    np.testing.assert_allclose(c2.embedding, c.embedding, atol=1e-6)
    np.testing.assert_allclose(c2.conf, c.conf, atol=1e-6)
    np.testing.assert_array_equal(c2.label, c.label)


def test_crop_add_roundtrip():
    father = _cloud(100)
    part = father.select(np.arange(30))
    rest = crop_point_cloud(part, father)
    assert rest.n == 70
    back = add_point_cloud(part, rest)
    assert back.n == 100
    assert sorted(map(tuple, back.xyz.tolist())) == \
        sorted(map(tuple, father.xyz.tolist()))


def test_transforms():
    c = _cloud(50)
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    g = transform_point_cloud_global(c, T)
    np.testing.assert_allclose(g.xyz, c.xyz + [1, 2, 3], atol=1e-6)
    l = transform_point_cloud_local(c, T)
    np.testing.assert_allclose(l.xyz, c.xyz + [1, 2, 3], atol=1e-5)
    # rotation about centroid preserves centroid+t
    Rz = np.eye(4)
    th = 0.5
    Rz[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    lr = transform_point_cloud_local(c, Rz)
    np.testing.assert_allclose(lr.xyz.mean(0), c.xyz.mean(0), atol=1e-5)


def test_match_selection():
    pytest.importorskip("scipy")
    c = _cloud(80)
    sel = c.xyz[[3, 10, 42]]
    idx = match_selection(c, sel)
    assert set(idx.tolist()) == {3, 10, 42}


def test_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    c = _cloud(60)
    c.params = {"block1": [{"w": np.eye(3, dtype=np.float32),
                            "b": np.zeros(3, np.float32)}]}
    p = str(tmp_path / "10_net_ray_marching.pth")
    c.to_checkpoint(p)
    c2 = NeuralPointCloudEdit.from_checkpoint(p)
    np.testing.assert_allclose(c2.xyz, c.xyz, atol=1e-6)
    np.testing.assert_allclose(c2.embedding, c.embedding, atol=1e-6)
    np.testing.assert_allclose(c2.conf, c.conf.reshape(-1), atol=1e-6)


def test_camera_path_interpolation():
    from sgnerf_tpu.utils.camera_path import interpolate_poses
    k0 = np.eye(4)
    k1 = np.eye(4)
    th = np.pi / 2
    k1[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    k1[:3, 3] = [1, 2, 3]
    path = interpolate_poses(np.stack([k0, k1]), 5)
    assert path.shape == (5, 4, 4)
    np.testing.assert_allclose(path[0], k0, atol=1e-5)
    np.testing.assert_allclose(path[-1], k1, atol=1e-5)
    # midpoint rotation is a valid rotation at 45 deg
    R = path[2][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.arccos((np.trace(R) - 1) / 2) - np.pi / 4) < 1e-4


def test_resample_scene(tmp_path):
    import os
    from sgnerf_tpu.data.resample import resample_scene
    src = tmp_path / "src"
    for sub in ("color", "depth", "pose", "label", "intrinsic"):
        (src / "exported" / sub).mkdir(parents=True)
    for i in range(10):
        (src / "exported" / "color" / f"{i}.jpg").write_bytes(b"x")
        (src / "exported" / "pose" / f"{i}.txt").write_text("0")
    (src / "exported" / "intrinsic" / "intrinsic_color.txt").write_text("1")
    dst = tmp_path / "dst"
    kept = resample_scene(str(src), str(dst), step=3)
    assert kept == 4
    assert sorted(os.listdir(dst / "exported" / "color")) == \
        ["0.jpg", "1.jpg", "2.jpg", "3.jpg"]


def test_per_point_rw2c_pth_roundtrip(tmp_path):
    """Export expands the (T,3,3) rotation table to the reference's dense
    per-point Rw2c; import factors it back into table + rot_idx
    (scene_model.py load/export, reference neural_points.py:647-651)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from sgnerf_tpu.models.checkpoint_io import (
        export_reference_checkpoint, load_torch_state_dict,
        convert_reference_checkpoint)
    rng = np.random.default_rng(0)
    n = 40
    th = 0.7
    rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    table = np.stack([np.eye(3, dtype=np.float32), rz])
    rot_idx = (np.arange(n) % 2).astype(np.int32)
    pts = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "embedding": rng.normal(size=(n, 32)).astype(np.float32),
        "conf": np.ones((n, 1), np.float32),
        "dir": rng.normal(size=(n, 3)).astype(np.float32),
        "color": rng.uniform(size=(n, 3)).astype(np.float32),
        "feats": np.zeros((n, 3), np.float32),
        "Rw2c": table[rot_idx],            # dense per-point, as export does
    }
    params = {"block1": [{"w": np.eye(3, dtype=np.float32),
                          "b": np.zeros(3, np.float32)}]}
    p = str(tmp_path / "5_net_ray_marching.pth")
    export_reference_checkpoint(params, pts, p)

    sd = load_torch_state_dict(p)
    _, pts2 = convert_reference_checkpoint(sd)
    rw = np.asarray(pts2["Rw2c"])
    assert rw.shape == (n, 3, 3)
    # the factorization the SceneModel loader applies
    _, first, inv = np.unique(np.round(rw.reshape(n, -1), 6), axis=0,
                              return_index=True, return_inverse=True)
    tab2, idx2 = rw[first], inv.astype(np.int32)
    assert len(tab2) == 2
    np.testing.assert_allclose(tab2[idx2], table[rot_idx], atol=1e-6)
