"""DTU (MVSNet-preprocessed layout) loader on a synthetic scene tree."""
import os
import types

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.fast


def _write_pfm(path, img):
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(img).astype("<f").tofile(f)


@pytest.fixture()
def dtu_tree(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "dtu"
    camdir = root / "Cameras" / "train"
    rect = root / "Rectified" / "scan1_train"
    depths = root / "Depths" / "scan1_train"
    for d in (camdir, rect, depths):
        d.mkdir(parents=True)
    n = 5
    pair = [str(n)]
    for v in range(n):
        srcs = [s for s in range(n) if s != v][:3]
        pair.append(str(v))
        pair.append(" ".join([str(len(srcs))] +
                             [f"{s} {100 - i}" for i, s in enumerate(srcs)]))
        # camera: orbit around origin at r=4, looking inward
        a = 2 * np.pi * v / n
        pos = np.array([4 * np.sin(a), 0.2, -4 * np.cos(a)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0, 1.0, 0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], 1)
        c2w[:3, 3] = pos
        w2c = np.linalg.inv(c2w)
        intr = np.array([[20.0, 0, 16], [0, 20.0, 12], [0, 0, 1]])
        cam = ("extrinsic\n"
               + "\n".join(" ".join(f"{x:.6f}" for x in row) for row in w2c)
               + "\n\nintrinsic\n"
               + "\n".join(" ".join(f"{x:.6f}" for x in row) for row in intr)
               + "\n\n2.0 0.01\n")
        (camdir / f"{v:08d}_cam.txt").write_text(cam)
        img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
        Image.fromarray(img).save(rect / f"rect_{v + 1:03d}_3_r5000.png")
        _write_pfm(str(depths / f"depth_map_{v:04d}.pfm"),
                   np.full((24, 32), 4.0, np.float32))
    (root / "Cameras" / "pair.txt").write_text("\n".join(pair) + "\n")
    return str(root)


def _opt(root):
    return types.SimpleNamespace(
        data_root=root, scan="scan1", img_wh=(64, 48), train_step=5,
        split="train", random_sample_size=4, init_view_num=3, dir_norm=1,
        bg_color="black", near_plane=0, far_plane=0,
        dtu_cam_scale=4.0, dtu_light_idx=3)


def test_dtu_dataset_items(dtu_tree):
    from sgnerf_tpu.data.dtu_dataset import DtuDataset
    ds = DtuDataset(_opt(dtu_tree))
    assert len(ds) == 4  # 5 views, every 5th is test
    rng = np.random.default_rng(1)
    it = ds.get_item(0, rng=rng)
    assert it["raydir"].shape == (16, 3)
    assert np.allclose(np.linalg.norm(it["raydir"], axis=-1), 1.0, atol=1e-4)
    assert it["gt_image"].shape == (16, 3)
    assert 0 < it["near"] < it["far"]
    # depth sweep bounds from cam files: 2.0 .. 2.0 + 0.01*192
    assert abs(it["near"] - 2.0) < 1e-5 and abs(it["far"] - 3.92) < 1e-5

    full = ds.get_item(0, full_img=True)
    assert full["raydir"].shape == (64 * 48, 3)

    init = ds.get_init_item(0)
    assert init["images"].shape == (3, 48, 64, 3)
    # pair.txt ordering respected for source views
    assert init["view_ids"][0] == ds.id_list[0]
    assert init["gt_depth"].shape == (48, 64)
    np.testing.assert_allclose(init["gt_depth"], 4.0)
    # w2c/c2w are inverses
    np.testing.assert_allclose(init["w2cs"][0] @ init["c2ws"][0],
                               np.eye(4), atol=1e-5)


def test_dtu_factory_resolution(dtu_tree):
    from sgnerf_tpu.data import find_dataset_class_by_name
    cls = find_dataset_class_by_name("dtu")
    assert cls.__name__ == "DtuDataset"


def test_dtu_depth_unprojection(dtu_tree):
    from sgnerf_tpu.data.dtu_dataset import DtuDataset
    ds = DtuDataset(_opt(dtu_tree))
    xyz = ds.load_init_depth_points(vox_res=50)
    assert len(xyz) > 50
    # all depths are 4.0 from cameras at r=4 looking at the origin ->
    # points land in a bounded shell around/behind the origin
    assert np.isfinite(xyz).all()
    assert np.linalg.norm(xyz, axis=-1).max() < 12.0


def test_dtu_ft_factory_resolution(dtu_tree):
    # the dtu_test_inf dev_scripts select dataset_name='dtu_ft' (a module
    # the reference never shipped); it must resolve to the per-scene loader
    from sgnerf_tpu.data import find_dataset_class_by_name
    from sgnerf_tpu.data.dtu_dataset import DtuDataset
    cls = find_dataset_class_by_name("dtu_ft")
    assert cls.__name__ == "DtuFtDataset" and issubclass(cls, DtuDataset)
    ds = cls(_opt(dtu_tree))
    item = ds.get_item(0)
    assert item["raydir"].shape[-1] == 3
