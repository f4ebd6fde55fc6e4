"""Native C++ host kernels vs numpy reference implementations."""
import numpy as np
import pytest

from sgnerf_tpu.runtime import native

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def lib():
    l = native._load()
    if l is None:
        pytest.skip("native lib unavailable")
    return l


def test_compute_linking_matches_python(lib):
    from sgnerf_tpu.models.bpnet.bpnet import compute_linking as py_impl
    rng = np.random.default_rng(0)
    n = 2000
    xyz = rng.normal(size=(n, 3)).astype(np.float32) + [0, 0, 3]
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 50.0
    intr[0, 2], intr[1, 2] = 32, 24
    c2w = np.eye(4)
    c2w[:3, 3] = [0.1, -0.2, 0.0]
    depth = rng.uniform(2.0, 4.0, size=(48, 64)).astype(np.float32)
    want = py_impl(intr, c2w, xyz, depth, 0.05)
    got = native.compute_linking(intr, c2w, xyz, depth, 0.05)
    np.testing.assert_array_equal(got, want)


def test_vox_downsample_matches_numpy(lib):
    from sgnerf_tpu.ops.scatter import construct_vox_points_closest
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
    got = native.vox_downsample_closest(xyz, 20)
    _, _, want = construct_vox_points_closest(xyz, 20)
    assert set(got.tolist()) == set(np.asarray(want).tolist())


def test_nearest_view_matches_python(lib):
    from sgnerf_tpu.runtime.scene_model import nearest_view as py_impl
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    campos = rng.normal(size=(7, 3)).astype(np.float32) * 3
    camdir = rng.normal(size=(7, 3)).astype(np.float32)
    camdir /= np.linalg.norm(camdir, axis=-1, keepdims=True)
    got = native.nearest_view(campos, camdir, xyz)
    want = py_impl(campos, camdir, xyz)
    assert (got == want).mean() > 0.999  # fp tie-breaking tolerance
