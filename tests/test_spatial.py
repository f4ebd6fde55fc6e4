"""Spatially-sharded scene rendering (parallel/spatial.py): the slab-
decomposed render over an 8-device mesh must equal the single-device
render, and the per-shard tables must be genuinely smaller than the
replicated ones."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.parallel import (make_mesh, build_sharded_scene,
                                 shard_scene_put, render_rays_spatial)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    n = 20000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz *= rng.uniform(0.8, 1.2, size=(n, 1)).astype(np.float32)
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb, color=(xyz * 0.4 + 0.5), dir=xyz)
    spec = grid_spec_for_cloud(cloud, vsize=[0.04] * 3, vscale=[2, 2, 2],
                               kernel_size=[3, 3, 3], max_o=65536, P=16)
    grid = build_grid(cloud, spec)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=64, SR=8, K=4,
                       vsize=(0.08, 0.08, 0.08))
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    return cloud, spec, grid, cfg, params


def _rays(R, seed=11):
    rng = np.random.default_rng(seed)
    d = (rng.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray([[0.0, 0.0, -3.0]]), jnp.asarray(d),
            jnp.eye(3, dtype=np.float32)[None])


def test_sharded_render_matches_single_device(scene):
    cloud, spec, grid, cfg, params = scene
    campos, raydir, rot = _rays(256)
    bg = jnp.ones(3)

    ref = render_rays(params, cloud, grid, cfg, campos=campos,
                      raydir=raydir, camrotc2w=rot, near=1.0, far=5.0,
                      bg_color=bg)

    mesh = make_mesh()
    n = mesh.devices.size
    assert n == 8, "tests/conftest.py forces an 8-device CPU mesh"
    sharded, sspec = build_sharded_scene(cloud, spec, n)
    sharded = shard_scene_put(sharded, mesh)
    out = render_rays_spatial(params, sharded, sspec, cfg, mesh,
                              campos=campos, raydir=raydir, camrotc2w=rot,
                              near=1.0, far=5.0, bg_color=bg)

    np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                               np.asarray(ref["coarse_raycolor"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["ray_mask"]),
                                  np.asarray(ref["ray_mask"]))
    np.testing.assert_allclose(np.asarray(out["coarse_point_opacity"]),
                               np.asarray(ref["coarse_point_opacity"]),
                               atol=2e-5, rtol=1e-4)
    # the render actually hit something
    assert float(jnp.sum(out["ray_mask"])) > 32


def test_shard_tables_are_smaller(scene):
    cloud, spec, grid, cfg, params = scene
    n = 8
    sharded, sspec = build_sharded_scene(cloud, spec, n)
    # per-shard point capacity and cache rows must be well under the
    # replicated sizes (that's the point: scene memory ~1/n per chip)
    assert sspec.cap_pts < cloud.capacity
    assert sharded.nbr_packed.shape[1] < grid.nbr_packed.shape[0]
    # ownership tiles the x-range disjointly (trailing shards may be empty
    # when slab_w * n overshoots X: hi clamps to X)
    X = spec.vdim[0]
    lo = np.clip(np.asarray(sharded.own_lo), 0, X)
    hi = np.clip(np.asarray(sharded.own_hi), lo, X)
    assert lo[0] == 0 and hi.max() == X
    assert (hi - lo).sum() == X  # disjoint cover: widths sum to X
