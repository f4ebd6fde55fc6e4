"""Golden-value tests for the pure math core (PE, ray gen, ray march).

Where a reference module is pure torch (no CUDA), we import it directly from
/root/reference and assert numerical equivalence — the strongest possible
parity check without copying code.
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.ops import (
    positional_encoding, near_far_linear_ray_generation, ray_march,
    find_render_function, find_blend_function, ray_dist_from_z,
)
from sgnerf_tpu.ops.camera import w2pers, pers2w, get_dtu_raydir

pytestmark = pytest.mark.fast

REF = "/root/reference"


def _ref_module(relpath, name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_march(torch):
    sys.path.insert(0, REF)
    try:
        return _ref_module("models/rendering/diff_ray_marching.py", "ref_march")
    finally:
        sys.path.pop(0)


def test_positional_encoding_matches_reference_layout(torch):
    # reference formula from helpers/networks.py:175-192, recomputed in numpy
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    freqs = 5
    got = np.asarray(positional_encoding(jnp.asarray(x), freqs))
    fb = 2.0 ** np.arange(freqs)
    pts = (x[..., None] * fb).reshape(7, -1)
    want = np.stack([np.sin(pts), np.cos(pts)], axis=-1).reshape(7, -1)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got_ori = np.asarray(positional_encoding(jnp.asarray(x), freqs, ori=True))
    want_ori = np.concatenate([x, np.sin(pts), np.cos(pts)], axis=-1)
    np.testing.assert_allclose(got_ori, want_ori, rtol=1e-6)


def test_near_far_linear_matches_reference(torch, ref_march):
    campos = np.array([[0.1, -0.2, 0.3]], dtype=np.float32)
    rd = np.random.default_rng(1).normal(size=(1, 13, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    D = 40
    # no jitter -> deterministic
    raypos, seg, valid, ts = near_far_linear_ray_generation(
        jnp.asarray(campos), jnp.asarray(rd), D, near=0.5, far=6.0, jitter=0.0)
    t_raypos, t_seg, t_valid, t_ts = ref_march.near_far_linear_ray_generation(
        torch.from_numpy(campos), torch.from_numpy(rd), D, near=0.5, far=6.0,
        jitter=0.0)
    np.testing.assert_allclose(np.asarray(raypos), t_raypos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg), t_seg.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts), t_ts.numpy(), atol=1e-5)


def test_ray_march_matches_reference(torch, ref_march):
    rng = np.random.default_rng(2)
    B, R, S = 1, 9, 16
    dist = rng.uniform(0.01, 0.1, size=(B, R, S)).astype(np.float32)
    valid = (rng.uniform(size=(B, R, S)) > 0.3)
    feats = rng.uniform(0, 1, size=(B, R, S, 4)).astype(np.float32)
    bg = np.array([1.0, 1.0, 1.0], dtype=np.float32)

    got = ray_march(jnp.asarray(dist), jnp.asarray(valid), jnp.asarray(feats),
                    find_render_function("radiance"),
                    find_blend_function("alpha"), bg_color=bg)
    want = ref_march.ray_march(
        torch.from_numpy(dist), torch.from_numpy(valid),
        torch.from_numpy(feats),
        lambda f: f[..., 1:4], lambda o, t: o * t,
        bg_color=torch.from_numpy(bg))
    for g, w in zip(got[:6], want[:6]):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=1e-5)


def test_ray_dist_from_z_matches_reference_formula(torch):
    # formula from neural_points_volumetric_model.py:569-578
    rng = np.random.default_rng(3)
    z = np.sort(rng.uniform(0.1, 5.0, size=(1, 6, 10)).astype(np.float32), -1)
    z[:, :, 7:] = 0.0  # masked slots are zero like the reference
    valid = np.ones((1, 6, 10), bool)
    valid[:, :, 7:] = False
    vs = 0.008
    got = np.asarray(ray_dist_from_z(jnp.asarray(z), jnp.asarray(valid), vs))

    tz = torch.cummax(torch.from_numpy(z), dim=-1)[0]
    td = torch.cat([tz[..., 1:] - tz[..., :-1],
                    torch.full((1, 6, 1), vs)], dim=-1)
    m = (td < 1e-8) | (td > 2 * vs)
    td = td * (~m).float() + m.float() * vs
    td = td * torch.from_numpy(valid).float()
    np.testing.assert_allclose(got, td.numpy(), atol=1e-6)


def test_w2pers_roundtrip():
    rng = np.random.default_rng(4)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q.astype(np.float32)
    campos = jnp.asarray(rng.normal(size=3).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32) + 5.0)
    pers = w2pers(pts, jnp.asarray(q), campos)
    back = pers2w(pers, jnp.asarray(q), campos)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_raydir_unit_norm():
    intr = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    pix = jnp.asarray(np.mgrid[0:4, 0:4].T.reshape(-1, 2).astype(np.float32))
    rot = jnp.eye(3)
    dirs = get_dtu_raydir(pix, intr, rot, dir_norm=True)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-4)


def test_sample_pdf_matches_reference(torch, ref_march):
    """Deterministic-mode importance resampling vs the reference's numpy
    implementation (diff_ray_marching.py:36-82)."""
    from sgnerf_tpu.ops.raygen import sample_pdf
    rng = np.random.default_rng(9)
    N, R, S = 1, 5, 12
    bins = np.sort(rng.uniform(1.0, 5.0, size=(N, R, S, 1)).astype(np.float32),
                   axis=2)
    weights = rng.uniform(0.1, 1.0, size=(N, R, S, 1)).astype(np.float32)
    n_samples = 8

    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                 n_samples, det=True))
    want = ref_march.sample_pdf(torch.from_numpy(bins),
                                torch.from_numpy(weights), n_samples,
                                det=True).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_cube_ray_generation_clips_to_domain():
    from sgnerf_tpu.ops.raygen import cube_ray_generation
    campos = jnp.asarray([[0.0, 0.0, -3.0]])
    # one ray through the cube, one missing it entirely
    rd = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
    raypos, seg, valid, ts = cube_ray_generation(campos, rd, 32,
                                                 near=0.1, far=10.0,
                                                 domain_size=1.0)
    v = np.asarray(valid)
    p = np.asarray(raypos)
    assert v[0, 0].sum() > 0          # hit ray has in-cube samples
    inside = p[0, 0][v[0, 0] > 0]
    assert (np.abs(inside) < 1.0).all()
    # entry/exit span [2, 4] along +z from z=-3
    t = np.asarray(ts)[0, 0]
    assert t.min() >= 2.0 - 1e-5 and t.max() <= 4.0 + 1e-5
    assert v[0, 1].sum() == 0         # miss ray: nothing valid


def test_refined_raygen_registry():
    from sgnerf_tpu.ops.raygen import (find_refined_ray_generation_method,
                                       refine_cube_ray_generation,
                                       refine_ray_generation,
                                       near_far_linear_ray_generation)
    assert find_refined_ray_generation_method("cube") \
        is refine_cube_ray_generation
    assert find_refined_ray_generation_method("nerf_near_far_linear") \
        is refine_ray_generation
    assert find_refined_ray_generation_method("near_far_linear") \
        is refine_ray_generation

    campos = jnp.asarray([[0.0, 0.0, -3.0]])
    rd = jnp.asarray([[[0.0, 0.0, 1.0]]])
    raypos, seg, valid, ts = near_far_linear_ray_generation(
        campos, rd, 16, near=2.0, far=4.0)
    w = jnp.ones(ts.shape + (1,))
    rp2, seg2, v2, ts2 = refine_cube_ray_generation(campos, rd, 8, ts, w)
    assert rp2.shape == (1, 1, 8, 3)
    p = np.asarray(rp2)[0, 0]
    v = np.asarray(v2)[0, 0]
    inside = np.all(np.abs(p) < 1.0, axis=-1)
    np.testing.assert_array_equal(v > 0, inside)
