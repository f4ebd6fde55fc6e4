"""BPNet semantic branch tests: sparse ops oracle, UNet shapes, full forward."""
import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.ops.sparse import (
    make_sparse_grid, sparse_conv, sparse_conv_down, sparse_conv_up)
from sgnerf_tpu.models.bpnet.bpnet import (
    BPNet, BPNetConfig, voxelize, compute_linking, bpnet_forward,
    init_bpnet_params)
from sgnerf_tpu.ops.sparse import SparseGrid


def _rand_grid(n=50, dims=(16, 16, 16), c=4, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, dims[0], size=(n, 3)), axis=0)
    feats = rng.normal(size=(len(coords), c)).astype(np.float32)
    return make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(feats), dims), coords, feats


def test_sparse_conv_matches_dense_oracle():
    grid, coords, feats = _rand_grid()
    rng = np.random.default_rng(1)
    w = rng.normal(size=(27, 4, 6)).astype(np.float32)
    out = np.asarray(sparse_conv(grid, jnp.asarray(w), kernel_size=3))

    # dense oracle
    dense = np.zeros((16, 16, 16, 4), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    for i, c in enumerate(coords):
        acc = np.zeros(6, np.float32)
        for k, o in enumerate(offs):
            q = c + o
            if ((q >= 0) & (q < 16)).all():
                acc += dense[q[0], q[1], q[2]] @ w[k]
        np.testing.assert_allclose(out[i], acc, atol=1e-4)


def test_sparse_down_up_roundtrip_coords():
    grid, coords, _ = _rand_grid(n=80, seed=2)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(8, 4, 5)),
                    jnp.float32)
    down, f = sparse_conv_down(grid, w, out_capacity=128)
    dm = np.asarray(down.mask)
    dcoords = np.asarray(down.coords)[dm]
    want = np.unique(coords // 2, axis=0)
    assert sorted(map(tuple, dcoords)) == sorted(map(tuple, want))

    wu = jnp.asarray(np.random.default_rng(4).normal(size=(8, 5, 3)),
                     jnp.float32)
    up = sparse_conv_up(down, grid.coords, grid.mask, wu)
    assert up.shape == (grid.M, 3)
    assert np.isfinite(np.asarray(up)).all()


def test_voxelize_devoxelize():
    rng = np.random.default_rng(5)
    locs = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    feats = rng.uniform(0, 255, size=(500, 3)).astype(np.float32)
    vc, vf, inv, _ = voxelize(locs, feats, 0.1)
    assert len(vc) == len(vf) <= 500
    assert inv.shape == (500,)
    # same-voxel points share a row
    key = (locs / 0.1).astype(int)
    for i in range(0, 500, 83):
        same = (key == key[i]).all(-1)
        assert len(set(inv[same].tolist())) == 1


def test_compute_linking_projects_inside():
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = 16, 12
    c2w = np.eye(4)
    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])  # front / behind
    depth = np.full((24, 32), 2.0, np.float32)
    link = compute_linking(intr, c2w, pts, depth, 0.05)
    assert link[0, 2] == 1 and (link[0, :2] == [12, 16]).all()
    assert link[1, 2] == 0


@pytest.mark.slow
def test_bpnet_full_forward_smoke():
    cfg = BPNetConfig(view_num=2, img_wh=(64, 48))
    params = init_bpnet_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(6)
    M = 200
    coords = np.unique(rng.integers(0, 32, size=(M, 3)), axis=0)
    grid = make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(rng.normal(size=(len(coords), 3))
                                        .astype(np.float32)),
                            (32, 32, 32))
    imgs = jnp.asarray(rng.normal(size=(2, 48, 64, 3)).astype(np.float32))
    links = np.zeros((len(coords), 4, 2), np.int32)
    links[:, 1, :] = rng.integers(0, 48, size=(len(coords), 2))
    links[:, 2, :] = rng.integers(0, 64, size=(len(coords), 2))
    links[:, 3, :] = 1
    m = len(coords)
    sm, l2d, f3 = bpnet_forward(params, cfg, grid, imgs, jnp.asarray(links),
                                [m, m, m, m])
    assert sm.shape == (m, 20)
    assert l2d.shape == (2, 48, 64, 20)
    assert f3.shape == (m, 96)
    s = np.asarray(sm).sum(-1)
    act = np.asarray(grid.mask)
    np.testing.assert_allclose(s[act], 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(f3)).all()


@pytest.mark.slow
def test_bpnet_bf16_agrees_with_f32():
    """compute_dtype=bfloat16 must keep 3D label argmax agreement high
    (BN is inference-mode, so bf16 only perturbs conv accumulations)."""
    import dataclasses
    cfg = BPNetConfig(view_num=2, img_wh=(64, 48))
    params = init_bpnet_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    coords = np.unique(rng.integers(0, 32, size=(200, 3)), axis=0)
    grid = make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(rng.normal(size=(len(coords), 3))
                                        .astype(np.float32)),
                            (32, 32, 32))
    imgs = jnp.asarray(rng.normal(size=(2, 48, 64, 3)).astype(np.float32))
    links = np.zeros((len(coords), 4, 2), np.int32)
    links[:, 1, :] = rng.integers(0, 48, size=(len(coords), 2))
    links[:, 2, :] = rng.integers(0, 64, size=(len(coords), 2))
    links[:, 3, :] = 1
    m = len(coords)
    sm32, _, f32feat = bpnet_forward(params, cfg, grid, imgs,
                                     jnp.asarray(links), [m, m, m, m])
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    sm16, _, f16feat = bpnet_forward(params, cfg16, grid, imgs,
                                     jnp.asarray(links), [m, m, m, m])
    assert sm16.dtype == jnp.float32 and f16feat.dtype == jnp.float32
    act = np.asarray(grid.mask)
    lab32 = np.asarray(sm32).argmax(-1)[act]
    lab16 = np.asarray(sm16).argmax(-1)[act]
    assert (lab32 == lab16).mean() > 0.95, (lab32 == lab16).mean()
    assert np.isfinite(np.asarray(f16feat)).all()


def test_bpnet_2d_aug_blur(tmp_path):
    """--bpnet_aug: p=0.5 gaussian blur on the 2D branch input (reference
    bpnet_dataset/augmentation_2d.py RandomGaussianBlur; the reference's
    Crop member never moves content so blur is the whole augmentation).
    Links and labels must be untouched."""
    import os
    import numpy as np
    from PIL import Image
    from sgnerf_tpu.models.bpnet.bpnet import BPNet, BPNetConfig

    for sub in ("color", "depth", "pose", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "color/0.jpg")
    Image.fromarray((np.full((24, 32), 2000)).astype(np.uint16)).save(
        tmp_path / "depth/0.png")
    np.savetxt(tmp_path / "pose/0.txt", np.eye(4))
    Image.fromarray(rng.integers(0, 20, (24, 32)).astype(np.int32),
                    mode="I").save(tmp_path / "label/0.png")
    intr4 = np.eye(4); intr4[0, 0] = intr4[1, 1] = 20.0
    intr4[0, 2], intr4[1, 2] = 16, 12
    pts = rng.normal(size=(50, 3)).astype(np.float32) + [0, 0, 2]

    net = BPNet.__new__(BPNet)        # no params needed for _load_view
    net.cfg = BPNetConfig(img_wh=(32, 24), aug=0)
    base, link0, lab0 = net._load_view(str(tmp_path / "color/0.jpg"), pts,
                                       intr4)
    net.cfg = BPNetConfig(img_wh=(32, 24), aug=1)
    blur_seen = same_seen = False
    for seed in range(8):
        im, link, lab = net._load_view(str(tmp_path / "color/0.jpg"), pts,
                                       intr4,
                                       rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(link, link0)
        np.testing.assert_array_equal(lab, lab0)
        if np.abs(im - base).max() > 1e-4:
            blur_seen = True
        else:
            same_seen = True
    assert blur_seen and same_seen   # p=0.5: both branches occur


def test_elastic_distortion_prevoxel():
    """--bpnet_aug 3D branch: ElasticDistortion before voxelize (reference
    bpneter/bpnet.py:515 intent; augmentation.py:159-201 math). Displacement
    must be smooth (neighbors move together), bounded, and the aug=0 path
    must stay bit-identical."""
    import numpy as np
    from sgnerf_tpu.models.bpnet.bpnet import (elastic_distortion,
                                               prevoxel_distort)

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 2.0, size=(400, 3)).astype(np.float32)

    out = elastic_distortion(pts, 0.2, 0.4, np.random.default_rng(7))
    assert out.shape == pts.shape and out.dtype == np.float32
    disp = out - pts
    assert np.abs(disp).max() > 1e-4          # actually moved
    # blurred-noise magnitude: |disp| stays O(magnitude)
    assert np.abs(disp).max() < 5 * 0.4
    # smoothness: two points in the same granularity cell move ~together
    a = np.array([[1.0, 1.0, 1.0]], np.float32)
    b = a + 0.01
    pair = np.concatenate([pts, a, b])        # same noise grid for both
    moved = elastic_distortion(pair, 0.8, 1.6, np.random.default_rng(11))
    da, db = moved[-2] - pair[-2], moved[-1] - pair[-1]
    assert np.linalg.norm(da - db) < 0.25 * max(np.linalg.norm(da), 1e-3)

    # determinism per seed; chain applies both scales under one p=0.95 gate
    c1 = prevoxel_distort(pts, np.random.default_rng(5))
    c2 = prevoxel_distort(pts, np.random.default_rng(5))
    np.testing.assert_array_equal(c1, c2)
