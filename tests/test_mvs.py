"""MVS module tests: shapes, grid-sample parity with torch, depth pipeline."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.models.mvs import (
    MVSConfig, MvsPointsModel, init_mvs_params, grid_sample_norm,
    homo_warp, ndc_2_cam, feature_net_apply, official_feature_apply)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(7, 9, 4)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(50, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_norm(jnp.asarray(img), jnp.asarray(grid)))
    timg = torch.from_numpy(img).permute(2, 0, 1)[None]        # (1,C,H,W)
    tgrid = torch.from_numpy(grid)[None, None]                 # (1,1,M,2)
    want = torch.nn.functional.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode="zeros",
        align_corners=True)[0, :, 0].T.numpy()
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_feature_net_shapes():
    cfg = MVSConfig()
    params = init_mvs_params(jax.random.key(0), cfg)
    imgs = jnp.zeros((2, 32, 40, 3))
    feats = feature_net_apply(params["FeatureNet"], imgs)
    assert feats[1].shape == (2, 32, 40, 8)
    assert feats[2].shape == (2, 16, 20, 16)
    assert feats[3].shape == (2, 8, 10, 32)
    of = official_feature_apply(params["official"]["feature"], imgs)
    assert of.shape == (2, 8, 10, 32)


def test_depth_pipeline_and_gen_points():
    cfg = MVSConfig(depth_grid=16)
    model = MvsPointsModel(cfg, key=jax.random.key(1))
    V, H, W = 3, 32, 32
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32))
    # identity proj (all views co-located) — degenerate but exercises shapes
    proj = jnp.broadcast_to(jnp.eye(3, 4), (V, 3, 4))
    intr = jnp.asarray([[8.0, 0, W / 8], [0, 8.0, H / 8], [0, 0, 1]])
    near_far = (0.5, 4.0)
    cam_xyz, mask, conf = model.gen_points(imgs, proj, intr, near_far)
    h, w = H // 4, W // 4
    assert cam_xyz.shape == (h, w, 3)
    assert mask.shape == (h, w) and conf.shape == (h, w)
    assert np.isfinite(np.asarray(cam_xyz)).all()
    # z must lie within near/far
    z = np.asarray(cam_xyz[..., 2])
    assert (z >= near_far[0] - 1e-4).all() and (z <= near_far[1] + 1e-4).all()


def test_query_embedding_shapes():
    cfg = MVSConfig()
    model = MvsPointsModel(cfg, key=jax.random.key(3))
    rng = np.random.default_rng(4)
    M, H, W = 100, 24, 32
    cam_xyz = jnp.asarray(
        np.stack([rng.uniform(-1, 1, M), rng.uniform(-1, 1, M),
                  rng.uniform(1, 3, M)], -1).astype(np.float32))
    imgs = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    c2w = jnp.eye(4)[None]
    w2c = jnp.eye(4)[None]
    intr = jnp.asarray([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])[None]
    emb, color, dirs, conf = model.query_embedding(
        (H, W), cam_xyz, None, imgs, c2w, w2c, intr)
    assert emb.shape == (M, cfg.point_features_dim)
    assert color.shape == (M, 3) and dirs.shape == (M, 3)
    assert conf.shape == (M, 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-3)


def test_homo_warp_identity():
    """Warping with identity projection at unit depth returns the feature."""
    rng = np.random.default_rng(5)
    feat = jnp.asarray(rng.normal(size=(8, 8, 2)).astype(np.float32))
    proj = jnp.eye(3, 4)
    dvals = jnp.ones((1, 8, 8))
    warped, grid = homo_warp(feat, proj, dvals)
    np.testing.assert_allclose(np.asarray(warped[0]), np.asarray(feat),
                               atol=1e-5)


def test_conv_transpose3d_matches_torch():
    torch = pytest.importorskip("torch")
    from sgnerf_tpu.models.mvs import conv_transpose3d_s2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 3, 5, 6)).astype(np.float32)
    wt = rng.normal(size=(6, 2, 3, 3, 3)).astype(np.float32)
    want = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), torch.from_numpy(wt),
        stride=2, padding=1, output_padding=1).permute(0, 2, 3, 4, 1).numpy()
    w = np.transpose(wt, (2, 3, 4, 1, 0))
    got = np.asarray(conv_transpose3d_s2(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_stride2_matches_torch():
    """Downsampling convs must match torch's symmetric padding — XLA SAME
    pads asymmetrically for stride 2 and misaligns by one pixel."""
    torch = pytest.importorskip("torch")
    from sgnerf_tpu.models.mvs import conv2d, conv3d
    rng = np.random.default_rng(0)
    for k, s, H, W in ((5, 2, 16, 20), (3, 2, 8, 8), (3, 1, 7, 9),
                       (7, 2, 12, 16)):
        x = rng.normal(size=(1, H, W, 4)).astype(np.float32)
        wt = rng.normal(size=(6, 4, k, k)).astype(np.float32)  # torch OIHW
        want = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wt),
            stride=s, padding=k // 2).permute(0, 2, 3, 1).numpy()
        w = np.transpose(wt, (2, 3, 1, 0))  # HWIO
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=s))
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"k={k} s={s} H={H} W={W}")
    # 3D
    x = rng.normal(size=(1, 8, 6, 10, 3)).astype(np.float32)
    wt = rng.normal(size=(5, 3, 3, 3, 3)).astype(np.float32)
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), torch.from_numpy(wt),
        stride=2, padding=1).permute(0, 2, 3, 4, 1).numpy()
    w = np.transpose(wt, (2, 3, 4, 1, 0))
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), stride=2))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    from sgnerf_tpu.models.mvs import resize_bilinear_align_corners
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    for out_hw in ((10, 14), (9, 13), (3, 4)):
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(out_hw))


def test_predict_depth_non_divisible_dims():
    """predict_depth must run at feature dims NOT divisible by 8 (the
    CostRegNet pads the cost volume and crops after — small probe scenes
    hit this; real MVSNet inputs are multiples of 32 and take the no-pad
    path, pinned exactly by tests/test_mvs_converters.py)."""
    import jax
    import jax.numpy as jnp
    from sgnerf_tpu.models.mvs import MVSConfig, MvsPointsModel

    model = MvsPointsModel(MVSConfig(), key=jax.random.key(2))
    rng = np.random.default_rng(0)
    V, H, W, D = 2, 44, 60, 10          # features (11, 15): not 8-divisible
    imgs = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32))
    projs = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32)[:3] for _ in range(V)]))
    dvals = jnp.linspace(1.0, 3.0, D)
    depth, conf, prob = model.predict_depth(imgs, projs, dvals)
    assert depth.shape == (H // 4, W // 4)
    assert conf.shape == (H // 4, W // 4)
    assert prob.shape == (D, H // 4, W // 4)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.isfinite(np.asarray(conf)).all()
