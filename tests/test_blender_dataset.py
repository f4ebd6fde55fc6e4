"""NeRF-synthetic dataset tests on a tiny synthetic blender scene."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("nerf") / "lego"
    root.mkdir()
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("test", 2)):
        frames = []
        (root / split).mkdir()
        for i in range(n):
            ang = 2 * np.pi * i / max(n, 1)
            pose = np.eye(4)
            pose[:3, 3] = [4 * np.sin(ang), 0, 4 * np.cos(ang)]
            fname = f"./{split}/r_{i}"
            img = (rng.uniform(0, 255, size=(32, 32, 4))).astype(np.uint8)
            Image.fromarray(img, "RGBA").save(root / split / f"r_{i}.png")
            frames.append({"file_path": fname,
                           "transform_matrix": pose.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root.parent)


def test_blender_dataset(blender_dir):
    from sgnerf_tpu.options import TrainOptions
    from sgnerf_tpu.data import create_dataset
    opt = TrainOptions().parse([
        "--dataset_name", "nerf_synth_ft", "--data_root", blender_dir,
        "--scan", "lego", "--split", "train",
        "--random_sample", "random", "--random_sample_size", "4",
        "--near_plane", "2.0", "--far_plane", "6.0", "--bg_color", "white"])
    ds = create_dataset(opt)
    assert len(ds) == 3
    item = ds.get_item(0, full_img=True)
    assert item["raydir"].shape == (16, 3)
    assert item["gt_image"].shape == (16, 3)
    assert item["full_image"].shape == (32, 32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(item["camrotc2w"], axis=0), 1.0, atol=1e-5)
    dummy = ds.get_dummyrot_item(1)
    assert dummy["raydir"].shape == (32 * 32, 3)


def test_nerf_synth_view_lists_for_alpha_masking(blender_dir):
    """alphas / view_intrinsics / world2cams feed the MVS-bootstrap
    visual-hull filter (runtime/mvs_bootstrap.py; reference
    train_ft.py:134)."""
    from sgnerf_tpu.options import TrainOptions
    from sgnerf_tpu.data import create_dataset
    opt = TrainOptions().parse([
        "--dataset_name", "nerf_synth_ft", "--data_root", blender_dir,
        "--scan", "lego", "--split", "train",
        "--random_sample", "random", "--random_sample_size", "4",
        "--near_plane", "2.0", "--far_plane", "6.0", "--bg_color", "white"])
    ds = create_dataset(opt)
    assert len(ds.alphas) == len(ds) == len(ds.world2cams)
    assert ds.alphas[0].shape == (1, 32, 32)
    np.testing.assert_allclose(
        ds.world2cams[0] @ np.asarray(ds.poses[0]), np.eye(4), atol=1e-4)
    assert ds.view_intrinsics[0].shape == (3, 3)
