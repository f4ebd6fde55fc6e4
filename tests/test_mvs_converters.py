"""Fabricated-checkpoint validation of the MVSNet checkpoint converters
(VERDICT-r3 item 4, applying the round-3 BPNet methodology):

  * convert_official_mvsnet_checkpoint (models/checkpoint_io.py): a real
    torch state_dict is built from the reference's OWN FeatureNet/CostRegNet
    modules (/root/reference/models/depth_estimators/mvsnet.py — pure torch,
    CPU-importable), saved in the {'model': sd, 'module.' prefixes} wrapper
    the pretrained ckpt uses (mvs_points_model.py:66-74), converted, and
    pinned by (a) leaf-level round-trip checks and (b) forward agreement of
    the component nets AND the full predict_depth pipeline against the
    reference MVSNet.forward (depth_estimators/mvsnet.py:88-144).

  * convert_mvsnerf_featurenet_checkpoint: the reference FeatureNet
    (mvs/models.py:717-765) needs inplace_abn (CUDA ext, absent here), so a
    minimal torch replica with the identical module/key structure and the
    ABN inference semantics (BN + leaky_relu 0.01 — the folded-BN mapping
    the converter docstring claims) stands in; fabricated weights round-trip
    through the converter and the jax forward must match the torch forward.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mvsnet(torch):
    sys.path.insert(0, REF)
    try:
        import importlib
        return importlib.import_module("models.depth_estimators.mvsnet")
    finally:
        sys.path.pop(0)


def _randomize_torch(torch, mod, seed):
    """Random weights AND non-trivial BN running stats (catches swapped
    mean/var or missed stats in the converter)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in mod.modules():
            for name in ("weight", "bias"):
                p = getattr(m, name, None)
                if p is not None and hasattr(p, "normal_"):
                    p.normal_(0.0, 0.3, generator=g)
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    mod.eval()
    return mod


def _align_corners_true(torch):
    """Context: force F.grid_sample(align_corners=True) inside the reference
    forward. The reference net was written for the torch<=1.1 default
    (align_corners=True; the grid is built with (W-1)/2 normalization,
    module.py:62-63) — modern torch flipped the default, which would smear
    every sample by half a pixel and test torch's version, not our
    converter."""
    import contextlib
    import torch.nn.functional as F

    @contextlib.contextmanager
    def ctx():
        orig = F.grid_sample

        def gs(inp, grid, **kw):
            kw["align_corners"] = True
            return orig(inp, grid, **kw)

        F.grid_sample = gs
        try:
            yield
        finally:
            F.grid_sample = orig
    return ctx()


def test_official_mvsnet_converter_roundtrip_and_forward(
        torch, ref_mvsnet, tmp_path):
    from sgnerf_tpu.models.checkpoint_io import (
        convert_official_mvsnet_checkpoint)
    from sgnerf_tpu.models.mvs import (official_feature_apply,
                                       official_cost_reg_apply)

    feat = _randomize_torch(torch, ref_mvsnet.FeatureNet(), 1)
    cost = _randomize_torch(torch, ref_mvsnet.CostRegNet(), 2)

    sd = {}
    for k, v in feat.state_dict().items():
        sd[f"module.feature.{k}"] = v
    for k, v in cost.state_dict().items():
        sd[f"module.cost_regularization.{k}"] = v
    path = str(tmp_path / "model_000014.ckpt")
    torch.save({"model": sd}, path)

    conv = convert_official_mvsnet_checkpoint(path)

    # --- leaf round-trip spot checks (conv transpose + BN stats verbatim)
    np.testing.assert_array_equal(
        conv["feature"]["conv0"]["conv"]["weight"],
        feat.conv0.conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        conv["feature"]["conv0"]["bn"]["running_var"],
        feat.conv0.bn.running_var.numpy())
    np.testing.assert_array_equal(
        conv["cost_regularization"]["conv7"]["0"]["weight"],
        cost.conv7[0].weight.detach().numpy().transpose(2, 3, 4, 1, 0))
    np.testing.assert_array_equal(
        conv["cost_regularization"]["prob"]["bias"],
        cost.prob.bias.detach().numpy())
    n_leaves = len(jax.tree_util.tree_leaves(conv))
    assert n_leaves >= 60, n_leaves

    # --- FeatureNet forward agreement (2 views, 32x32 -> 8x8x32)
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_f = feat(torch.from_numpy(
            imgs.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got_f = np.asarray(official_feature_apply(conv["feature"],
                                              jnp.asarray(imgs)))
    np.testing.assert_allclose(got_f, ref_f, atol=2e-4, rtol=1e-4)

    # --- CostRegNet forward agreement ((1,8,8,8,32) volume)
    vol = rng.normal(size=(1, 8, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        ref_c = cost(torch.from_numpy(
            vol.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)
    got_c = np.asarray(official_cost_reg_apply(
        conv["cost_regularization"], jnp.asarray(vol)))
    np.testing.assert_allclose(got_c, ref_c, atol=3e-4, rtol=1e-4)

    # --- full predict_depth vs the reference MVSNet.forward
    from sgnerf_tpu.models.mvs import MVSConfig, MvsPointsModel, init_mvs_params
    net = ref_mvsnet.MVSNet(refine=False)
    net.feature = feat
    net.cost_regularization = cost
    net.eval()

    V, D = 2, 8
    # small rotations + translations so the homography warp is non-trivial
    projs = np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
    th = 0.02
    projs[1, :3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32)
    projs[1, :3, 3] = [0.4, -0.2, 0.01]
    depth_values = np.linspace(1.0, 2.0, D).astype(np.float32)

    with torch.no_grad(), _align_corners_true(torch):
        t_depth, t_conf, _, t_prob = net(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))[None],
            torch.from_numpy(projs)[None],
            torch.from_numpy(depth_values)[None])

    params = init_mvs_params(jax.random.key(0), MVSConfig())
    params["official"] = conv
    model = MvsPointsModel(MVSConfig(), params=params)
    j_depth, j_conf, j_prob = model.predict_depth(
        jnp.asarray(imgs), jnp.asarray(projs[:, :3, :]),
        jnp.asarray(depth_values))

    np.testing.assert_allclose(np.asarray(j_prob), t_prob[0].numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_depth), t_depth[0].numpy(),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf[0].numpy(),
                               atol=2e-5, rtol=1e-4)


def _featurenet_replica(torch):
    """torch replica of the reference MVSNeRF FeatureNet
    (mvs/models.py:717-765) with identical module names/key structure;
    InPlaceABN -> BatchNorm + leaky_relu(0.01) (inference semantics)."""
    import torch.nn as nn

    class CBR(nn.Module):
        def __init__(self, ci, co, k=3, s=1, p=1):
            super().__init__()
            self.conv = nn.Conv2d(ci, co, k, stride=s, padding=p, bias=False)
            self.bn = nn.BatchNorm2d(co)

        def forward(self, x):
            import torch.nn.functional as F
            return F.leaky_relu(self.bn(self.conv(x)), 0.01)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Sequential(CBR(3, 8), CBR(8, 8))
            self.conv1 = nn.Sequential(CBR(8, 16, 5, 2, 2), CBR(16, 16),
                                       CBR(16, 16))
            self.conv2 = nn.Sequential(CBR(16, 32, 5, 2, 2), CBR(32, 32),
                                       CBR(32, 32))
            self.toplayer = nn.Conv2d(32, 32, 1)

        def forward(self, x):          # intermediate=True mode
            x1 = self.conv0(x)
            x2 = self.conv1(x1)
            x3 = self.toplayer(self.conv2(x2))
            return [x, x1, x2, x3]

    return Net()


@pytest.mark.fast
def test_mvsnerf_featurenet_converter_roundtrip_and_forward(torch):
    from sgnerf_tpu.models.checkpoint_io import (
        convert_mvsnerf_featurenet_checkpoint)
    from sgnerf_tpu.models.mvs import feature_net_apply

    net = _randomize_torch(torch, _featurenet_replica(torch), 7)
    sd = {f"FeatureNet.{k}": v.numpy() for k, v in net.state_dict().items()}
    conv = convert_mvsnerf_featurenet_checkpoint(sd, prefix="FeatureNet")

    # leaf round-trip spot checks
    np.testing.assert_array_equal(
        conv["conv1"]["0"]["conv"]["weight"],
        net.conv1[0].conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        conv["conv2"]["2"]["bn"]["running_mean"],
        net.conv2[2].bn.running_mean.numpy())
    np.testing.assert_array_equal(
        conv["toplayer"]["bias"], net.toplayer.bias.detach().numpy())

    rng = np.random.default_rng(11)
    imgs = rng.normal(size=(2, 24, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_lv = net(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    got_lv = feature_net_apply(conv, jnp.asarray(imgs))
    assert len(got_lv) == 4
    for lid in range(1, 4):  # level 0 is the raw image passthrough
        np.testing.assert_allclose(
            np.asarray(got_lv[lid]),
            ref_lv[lid].numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-4, err_msg=f"level {lid}")
