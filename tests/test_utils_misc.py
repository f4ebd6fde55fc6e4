"""Smoke/golden tests for the smaller utility subsystems: blur detection
(reference utils_mine blur detector), spherical harmonics (utils/spherical),
the Visualizer loss/image/pointcloud plumbing, and result.py IoU scoring."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.fast


def test_blur_detector_orders_by_sharpness(tmp_path):
    """variance_of_laplacian ranks a blurred copy below the sharp original
    and detect_blurry flags it (reference utils_mine blur_list writer)."""
    from PIL import Image, ImageFilter
    from sgnerf_tpu.utils.blur import (variance_of_laplacian, detect_blurry,
                                       write_blur_list)
    rng = np.random.default_rng(0)
    sharp = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    im = Image.fromarray(sharp)
    p_sharp = tmp_path / "0.jpg"
    p_blur = tmp_path / "1.jpg"
    im.save(p_sharp)
    im.filter(ImageFilter.GaussianBlur(4)).save(p_blur)

    v_sharp = variance_of_laplacian(np.asarray(Image.open(p_sharp).convert("L"),
                                               np.float32))
    v_blur = variance_of_laplacian(np.asarray(Image.open(p_blur).convert("L"),
                                              np.float32))
    assert v_sharp > v_blur * 2

    ids = detect_blurry([str(p_sharp), str(p_blur)], worst_n=1)
    assert ids == [1]
    write_blur_list(str(tmp_path), ids)
    assert (tmp_path / "exported" / "blur_list.txt").exists()


def test_spherical_harmonics_table_orthonormal_l0():
    """Degree-0 SH is the constant 1/(2 sqrt(pi)); the runtime table matches
    the analytic value and returns deg^2 coefficients per direction."""
    import jax.numpy as jnp
    from sgnerf_tpu.utils.spherical import SphericalHarm_table
    sh = SphericalHarm_table(3)
    rng = np.random.default_rng(1)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh.sh_all(jnp.asarray(d)))
    assert out.shape == (32, 9)
    np.testing.assert_allclose(out[:, 0], 1.0 / (2 * np.sqrt(np.pi)),
                               rtol=1e-5)


def test_visualizer_losses_images_points_video(tmp_path):
    import types
    from sgnerf_tpu.utils.visualizer import Visualizer
    opt = types.SimpleNamespace(checkpoints_dir=str(tmp_path), name="viz",
                                show_tensorboard=0)
    viz = Visualizer(opt)
    for i in range(3):
        viz.accumulate_losses({"total": np.float32(1.0 + i)})
    viz.print_losses(10)
    viz.reset()

    img = np.clip(np.random.default_rng(0).uniform(0, 1, (8, 8, 3)), 0, 1)
    viz.display_current_results({"coarse_raycolor": img}, 0, subdir="t")
    img_dir = os.path.join(str(tmp_path), "viz", "images")
    files = []
    for root, _, fs in os.walk(img_dir):
        files += [os.path.join(root, f) for f in fs]
    assert any(f.endswith(".png") for f in files)

    viz.save_neural_points(5, np.zeros((10, 3), np.float32))
    vid = viz.gen_video(os.path.dirname(files[0]),
                        ".*coarse_raycolor.png",
                        os.path.join(str(tmp_path), "v.mp4"), fps=2)
    # mp4 may fall back to gif; either way a file must exist
    assert vid is None or os.path.exists(vid) or \
        os.path.exists(os.path.join(str(tmp_path), "v.gif"))


def test_result_iou_scoring(tmp_path):
    """result.py scores a predicted label cloud against a GT ply (reference
    result.py IoU of saved label point clouds)."""
    from sgnerf_tpu.utils.ply import write_ply
    import result as result_mod

    from sgnerf_tpu.data.prepare_scannet import label_remapper_150
    rng = np.random.default_rng(2)
    n = 500
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    # GT carries RAW ScanNet ids; score() remaps them to the 20-class set
    raw_ids = np.asarray([1, 2, 3, 4, 5])        # wall/floor/cabinet/bed/chair
    labels_raw = raw_ids[rng.integers(0, 5, n)].astype(np.int32)
    remap = label_remapper_150()
    labels20 = remap[labels_raw].astype(np.int64)
    gt = tmp_path / "gt.ply"
    write_ply(str(gt), {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                        "label": labels_raw})
    # predictions live in the remapped 20-class space; corrupt 10%
    pred_labels = labels20.copy()
    flip = rng.choice(n, n // 10, replace=False)
    pred_labels[flip] = (pred_labels[flip] + 1) % 20
    pred = tmp_path / "pred.txt"
    np.savetxt(pred, np.concatenate(
        [xyz, pred_labels[:, None].astype(np.float32)], axis=1),
        delimiter=";")
    m = result_mod.score(str(pred), str(gt))
    assert 0.5 < m < 1.0
