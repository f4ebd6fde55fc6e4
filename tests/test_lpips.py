"""LPIPS (utils/lpips.py): architecture construction, torchvision state-dict
loading, metric properties with synthetic weights, and the missing-weights
fallback. Real calibrated weights don't ship in this image (zero egress), so
these tests validate structure + semantics, not the published values."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sgnerf_tpu.utils.lpips import (_ALEX_CONVS, _ALEX_IDX, _VGG_CFG,
                                    _tv_vgg_conv_indices, lpips_distance,
                                    _load)

pytestmark = pytest.mark.fast


def _alex_backbone_state(rng):
    sd = {}
    for idx, (o, i, k, _, _, _) in zip(_ALEX_IDX, _ALEX_CONVS):
        sd[f"features.{idx}.weight"] = torch.as_tensor(
            rng.normal(scale=0.05, size=(o, i, k, k)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.zeros(o)
    # torchvision dicts carry classifier.* too; the loader must ignore them
    sd["classifier.1.weight"] = torch.zeros(2, 2)
    return sd


def _vgg_backbone_state(rng):
    sd = {}
    cin = 3
    for idx, v in zip(_tv_vgg_conv_indices(),
                      [c for c in _VGG_CFG if c != "M"]):
        sd[f"features.{idx}.weight"] = torch.as_tensor(
            rng.normal(scale=0.05, size=(v, cin, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        cin = v
    return sd


def _lin_state(chans, rng):
    return {f"lin{i}.model.1.weight": torch.as_tensor(
        rng.uniform(0, 0.1, size=(1, c, 1, 1)).astype(np.float32))
        for i, c in enumerate(chans)}


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lpips_weights")
    rng = np.random.default_rng(0)
    torch.save(_alex_backbone_state(rng), d / "alexnet-test.pth")
    torch.save(_lin_state([64, 192, 384, 256, 256], rng), d / "alex.pth")
    torch.save(_vgg_backbone_state(rng), d / "vgg16-test.pth")
    torch.save(_lin_state([64, 128, 256, 512, 512], rng), d / "vgg.pth")
    return str(d)


@pytest.mark.parametrize("net,size", [("alex", 64), ("vgg", 32)])
def test_metric_properties(weights_dir, net, size):
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.2, size=a.shape), 0, 1).astype(
        np.float32)
    same = lpips_distance(a, a.copy(), net=net, weights_dir=weights_dir)
    diff = lpips_distance(a, b, net=net, weights_dir=weights_dir)
    sym = lpips_distance(b, a, net=net, weights_dir=weights_dir)
    assert same == pytest.approx(0.0, abs=1e-9)
    assert diff > 1e-6
    assert diff == pytest.approx(sym, rel=1e-5)
    # deterministic
    assert diff == lpips_distance(a, b, net=net, weights_dir=weights_dir)


def test_alex_feature_shapes(weights_dir):
    model = _load("alex", weights_dir)
    x = torch.zeros(1, 3, 64, 64)
    chans = [f.shape[1] for f in model.backbone.features(x)]
    assert chans == [64, 192, 384, 256, 256]


def test_vgg_feature_shapes(weights_dir):
    model = _load("vgg", weights_dir)
    x = torch.zeros(1, 3, 32, 32)
    feats = model.backbone.features(x)
    assert [f.shape[1] for f in feats] == [64, 128, 256, 512, 512]
    # spatial halving at each pool: 32, 16, 8, 4, 2
    assert [f.shape[2] for f in feats] == [32, 16, 8, 4, 2]


def test_missing_weights_returns_none(tmp_path):
    a = np.zeros((16, 16, 3), np.float32)
    assert lpips_distance(a, a, net="alex", weights_dir=str(tmp_path)) is None


def test_metrics_wrapper(weights_dir):
    from sgnerf_tpu.utils.metrics import lpips
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    v = lpips(a, b, net="alex", weights_path=weights_dir)
    assert v is not None and v > 0
