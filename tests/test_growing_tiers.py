"""Tier-based probe-query widening (reference run/train_ft.py:434-438, :891)."""
import types

import numpy as np
import jax

from sgnerf_tpu.models.point_cloud import (
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.runtime.growing import probe_grid_for_step


def _model():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    cloud = make_point_cloud(xyz, rng.normal(size=(500, 32)).astype(np.float32))
    kwargs = dict(vsize=[0.1] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
                  max_o=4096, P=8, ranges=None)
    spec = grid_spec_for_cloud(cloud, **kwargs)
    grid = build_grid(cloud, spec)
    m = types.SimpleNamespace(grid=grid, spec=spec, grid_kwargs=kwargs,
                              state=types.SimpleNamespace(cloud=cloud))
    return m


def _opt(pks, tiers):
    return types.SimpleNamespace(prob_kernel_size=pks, prob_tiers=tiers)


def test_no_prob_kernel_uses_model_grid():
    m = _model()
    g, done = probe_grid_for_step(m, _opt(None, (100,)), 50)
    assert g is m.grid and not done


def test_same_kernel_reuses_grid():
    m = _model()
    g, done = probe_grid_for_step(m, _opt([3, 3, 3, 5, 5, 5], (1000,)), 10)
    assert g is m.grid and not done


def test_tier_widens_kernel():
    m = _model()
    g, done = probe_grid_for_step(m, _opt([3, 3, 3, 5, 5, 5], (1000,)), 2000)
    assert not done and g is not m.grid
    # widened dilation can only add occupied-query voxels (grid dims grow
    # with the kernel padding, so compare counts)
    base = np.asarray(m.grid.occ_mask).astype(bool).sum()
    wide = np.asarray(g.occ_mask).astype(bool).sum()
    assert wide >= base


def test_exhausted_tiers_stop_probing():
    m = _model()
    g, done = probe_grid_for_step(m, _opt([3, 3, 3], (1000,)), 2000)
    assert done and g is None
