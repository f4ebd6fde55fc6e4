"""Fused Pallas KNN select (ops/fused_knn.py) vs the XLA cache path.

Interpret mode on CPU; the compiled kernel is A/B'd on real TPU hardware
(PERFORMANCE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.ops.query import query_neighbors
from sgnerf_tpu.ops.raygen import find_ray_generation_method


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    n = 20000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz *= rng.uniform(0.8, 1.2, size=(n, 1)).astype(np.float32)
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb)
    spec = grid_spec_for_cloud(cloud, vsize=[0.04] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=65536, P=16,
                               cache_dtype="bfloat16")
    grid = build_grid(cloud, spec)

    rng2 = np.random.default_rng(11)
    R = 256
    d = (rng2.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    raygen = find_ray_generation_method("near_far_linear")
    raypos, _, _, _ = raygen(jnp.asarray([[0.0, 0.0, -3.0]]),
                             jnp.asarray(d), 64, near=1.0, far=5.0)
    return cloud, grid, raypos


def test_fused_knn_matches_exact(scene):
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16, knn_mode="fused")
    np.testing.assert_array_equal(np.asarray(q0.sample_pidx),
                                  np.asarray(q1.sample_pidx))
    np.testing.assert_array_equal(np.asarray(q0.ray_mask),
                                  np.asarray(q1.ray_mask))
    np.testing.assert_array_equal(np.asarray(q0.sample_loc_mask),
                                  np.asarray(q1.sample_loc_mask))
    assert int(jnp.sum(q1.sample_pidx >= 0)) > 100


def test_fused_knn_no_radius_limit(scene):
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.0)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.0, knn_mode="fused")
    np.testing.assert_array_equal(np.asarray(q0.sample_pidx),
                                  np.asarray(q1.sample_pidx))


def test_fused_knn_semantic_falls_back(scene):
    # semantic guidance must keep the XLA path (and not crash)
    cloud, grid, raypos = scene
    B, R = raypos.shape[:2]
    n = cloud.xyz.shape[0]
    rng = np.random.default_rng(0)
    lbl = jnp.asarray(rng.integers(0, 3, size=(B, R)).astype(np.int32))
    plbl = jnp.asarray(rng.integers(0, 3, size=(n,)).astype(np.int32))
    prob = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    q = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                        radius_limit=0.16, ray_label=lbl,
                        points_label=plbl, points_label_prob=prob,
                        key=jax.random.key(0), semantic_guidance=True,
                        knn_mode="fused")
    assert int(jnp.sum(q.sample_pidx >= 0)) > 0


def test_tile_unique_matches_numpy():
    from sgnerf_tpu.ops.fused_knn import tile_unique
    rng = np.random.default_rng(7)
    M, T, U = 1024, 128, 16
    slot = rng.integers(0, 40, size=(M,)).astype(np.int32)
    ok = rng.random(M) < 0.8
    uniq, inv = jax.jit(tile_unique, static_argnums=(2, 3))(
        jnp.asarray(slot), jnp.asarray(ok), T, U)
    uniq, inv = np.asarray(uniq), np.asarray(inv)
    for t in range(M // T):
        sl = slot[t * T:(t + 1) * T]
        okt = ok[t * T:(t + 1) * T]
        expect = np.unique(sl[okt])[:U]  # U smallest distinct valid slots
        got = uniq[t][uniq[t] >= 0]
        np.testing.assert_array_equal(got, expect)
        for i in range(T):
            v = inv[t * T + i]
            if okt[i] and sl[i] in expect:
                assert uniq[t][v] == sl[i]
            else:
                assert v == U


def test_dedup_knn_matches_exact(scene):
    # cap == tile rows: no tile can overflow -> bitwise-equal selection
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16, knn_mode="dedup",
                         dedup_tile=32, dedup_cap=256)
    np.testing.assert_array_equal(np.asarray(q0.sample_pidx),
                                  np.asarray(q1.sample_pidx))
    np.testing.assert_array_equal(np.asarray(q0.ray_mask),
                                  np.asarray(q1.ray_mask))
    assert int(jnp.sum(q1.sample_pidx >= 0)) > 100


def test_dedup_knn_no_radius_limit(scene):
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.0)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.0, knn_mode="dedup",
                         dedup_tile=32, dedup_cap=256)
    np.testing.assert_array_equal(np.asarray(q0.sample_pidx),
                                  np.asarray(q1.sample_pidx))


def test_dedup_knn_overflow_degrades_to_no_neighbors(scene):
    # tiny cap: overflowed shading points must return -1 rows (never wrong
    # ids); the non-overflowed ones still match the exact path
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16, knn_mode="dedup",
                         dedup_tile=32, dedup_cap=8)
    p0 = np.asarray(q0.sample_pidx).reshape(-1, 4)
    p1 = np.asarray(q1.sample_pidx).reshape(-1, 4)
    dropped = np.all(p1 == -1, axis=-1) & ~np.all(p0 == -1, axis=-1)
    kept = ~np.all(p1 == -1, axis=-1)
    np.testing.assert_array_equal(p1[kept], p0[kept])
    assert dropped.any()  # the tiny cap must actually overflow here


def test_dedup_knn_uneven_tile_padding(scene):
    # M = B*R*SR = 2048 not divisible by T = 24*8 = 192 -> padded path
    cloud, grid, raypos = scene
    q0 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16)
    q1 = query_neighbors(grid, cloud.xyz, raypos, K=4, SR=8,
                         radius_limit=0.16, knn_mode="dedup",
                         dedup_tile=24, dedup_cap=192)
    np.testing.assert_array_equal(np.asarray(q0.sample_pidx),
                                  np.asarray(q1.sample_pidx))
