"""Geometric-consistency filter tests: consistent depth survives, noise dies."""
import pytest

import numpy as np
import jax.numpy as jnp

from sgnerf_tpu.models.mvs_filter import (
    check_geometric_consistency, filter_depths)

pytestmark = pytest.mark.fast


def _setup_views():
    """Two cameras looking at a fronto-parallel plane at z=2 (world frame of
    camera A); camera B is translated +0.2 in x."""
    H, W = 24, 32
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    np.float32)
    extr_a = np.eye(4, dtype=np.float32)                    # world == cam A
    extr_b = np.eye(4, dtype=np.float32)
    extr_b[0, 3] = -0.2   # world->camB: x' = x - 0.2  (camera at x=+0.2)
    depth = np.full((H, W), 2.0, np.float32)
    return intr, extr_a, extr_b, depth


def test_consistent_plane_passes():
    intr, ea, eb, depth = _setup_views()
    # the plane at z=2 is at depth 2 in BOTH cameras (pure x translation)
    mask, vis, d_re = check_geometric_consistency(
        jnp.asarray(depth), jnp.asarray(intr), jnp.asarray(ea),
        jnp.asarray(depth), jnp.asarray(intr), jnp.asarray(eb))
    m = np.asarray(mask)
    v = np.asarray(vis)
    # most pixels whose reprojection lands inside view B agree
    assert m[v].mean() > 0.9
    np.testing.assert_allclose(np.asarray(d_re)[m], 2.0, atol=0.05)


def test_inconsistent_depth_fails():
    intr, ea, eb, depth = _setup_views()
    wrong = depth * 1.5   # view B claims the plane is at z=3
    mask, vis, _ = check_geometric_consistency(
        jnp.asarray(depth), jnp.asarray(intr), jnp.asarray(ea),
        jnp.asarray(wrong), jnp.asarray(intr), jnp.asarray(eb))
    m = np.asarray(mask)
    v = np.asarray(vis)
    assert m[v].mean() < 0.1


def test_filter_depths_end_to_end():
    intr, ea, eb, depth = _setup_views()
    conf = np.full_like(depth, 0.95)
    out = filter_depths(
        [jnp.asarray(depth), jnp.asarray(depth)],
        [jnp.asarray(intr)] * 2, [jnp.asarray(ea), jnp.asarray(eb)],
        [jnp.asarray(conf)] * 2, depth_conf_thresh=0.8, geo_cnsst_num=1)
    world0, conf0 = out[0]
    assert len(world0) > 0.8 * depth.size
    # surviving points lie on the z=2 plane (world == cam A frame)
    np.testing.assert_allclose(world0[:, 2], 2.0, atol=0.05)


def test_alpha_masking_visual_hull():
    """alpha_masking (reference mvs_utils.py:572-607): a point survives
    only if every view's alpha is >0.1 at its projection; out-of-frame
    passes unless the range mask is active; near/far windows AND in."""
    import numpy as np
    from sgnerf_tpu.models.mvs_filter import alpha_masking

    H, W = 24, 32
    intr = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]],
                    np.float32)
    w2c = np.eye(4, dtype=np.float32)          # camera at origin, +z
    alpha = np.zeros((H, W), np.float32)
    alpha[:, W // 2:] = 1.0                    # right half is object

    pts = np.array([
        [0.5, 0.0, 2.0],                       # projects right -> keep
        [-0.5, 0.0, 2.0],                      # projects left  -> drop
        [9.0, 0.0, 2.0],                       # out of frame: clamps to
        #                                        right edge -> alpha 1 -> keep
        [0.5, 0.0, 50.0],                      # keep unless near_far drops
    ], np.float32)

    m = alpha_masking(pts, [alpha], [intr], [w2c], None)
    np.testing.assert_array_equal(m, [True, False, True, True])

    # range mask active: out-of-frame passes the alpha test explicitly
    # (reference :597 adds ~range_mask to the alpha sample)
    m = alpha_masking(pts, [alpha], [intr], [w2c], None, inall_img=0)
    np.testing.assert_array_equal(m, [True, False, True, True])

    # near/far window drops the far point
    m = alpha_masking(pts, [alpha], [intr], [w2c], (0.5, 10.0))
    np.testing.assert_array_equal(m, [True, False, True, False])

    # second view whose alpha is empty kills everything (hull = AND)
    m = alpha_masking(pts, [alpha, np.zeros((H, W), np.float32)],
                      [intr, intr], [w2c, w2c], None)
    np.testing.assert_array_equal(m, [False, False, False, False])
