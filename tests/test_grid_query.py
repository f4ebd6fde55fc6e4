"""Grid build + neighbor query vs a brute-force oracle.

Mirrors the reference's `try_build` smoke harness
(query_point_indices_worldcoords.py:990-1019) as real unit tests.
"""
import numpy as np
import jax.numpy as jnp

from sgnerf_tpu.ops.grid import (
    GridSpec, build_point_grid, compute_grid_spec, voxel_coords)
from sgnerf_tpu.ops.query import query_neighbors, mask_and_compact_samples


def _small_cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)


def _spec(xyz, vsize=0.05, P=16, max_o=4096):
    return compute_grid_spec(
        xyz, vsize=[vsize] * 3, vscale=[1, 1, 1], kernel_size=[3, 3, 3],
        max_o=max_o, P=P)


def test_grid_build_buckets_every_point():
    xyz = _small_cloud()
    spec = _spec(xyz)
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    # every point should land in some bucket (P large enough for this density)
    bucketed = np.asarray(grid.bucket_pnts)
    ids = bucketed[bucketed >= 0]
    assert sorted(ids.tolist()) == list(range(len(xyz)))
    # counts consistent
    cnt = np.asarray(grid.bucket_cnt)
    assert cnt.sum() == len(xyz)
    # vox_slot round-trips: each occupied voxel's bucket holds points of that voxel
    vs = np.asarray(grid.vox_slot)
    coords = np.asarray(voxel_coords(jnp.asarray(xyz), spec))
    for i in range(0, len(xyz), 97):
        c = coords[i]
        slot = vs[c[0], c[1], c[2]]
        assert slot >= 0
        assert i in bucketed[slot].tolist()


def test_occupancy_dilation():
    xyz = np.array([[0.5, 0.5, 0.5]], dtype=np.float32)
    spec = GridSpec(min_corner=(0, 0, 0), vsize=(0.1, 0.1, 0.1),
                    vdim=(10, 10, 10), max_o=16, P=4, kernel_size=(3, 3, 3))
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(1, bool), spec)
    occ = np.asarray(grid.occ_mask)
    assert occ[5, 5, 5] == 1
    # 3x3x3 dilation
    assert occ[4:7, 4:7, 4:7].all()
    assert occ.sum() == 27


def test_compaction_takes_first_sr_hits():
    xyz = _small_cloud()
    spec = _spec(xyz)
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    rng = np.random.default_rng(1)
    B, R, D, SR = 1, 8, 64, 6
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = np.linspace(1.5, 4.5, D, dtype=np.float32)
    raypos = campos + dirs[:, None, :] * ts[None, :, None]
    raypos = raypos[None]

    loc, smask, _ = mask_and_compact_samples(jnp.asarray(raypos), grid, SR)
    loc, smask = np.asarray(loc), np.asarray(smask)

    # oracle: recompute per-ray
    occ = np.asarray(grid.occ_mask)
    coords = np.floor((raypos - np.array(spec.min_corner))
                      / np.array(spec.vsize)).astype(int)
    for r in range(R):
        hits = []
        for d in range(D):
            c = coords[0, r, d]
            if (c >= 0).all() and (c < np.array(spec.vdim)).all() \
                    and occ[c[0], c[1], c[2]]:
                hits.append(raypos[0, r, d])
            if len(hits) == SR:
                break
        assert smask[0, r].sum() == len(hits)
        if hits:
            np.testing.assert_allclose(
                loc[0, r][: len(hits)], np.stack(hits), atol=1e-6)


def test_query_matches_bruteforce_knn():
    xyz = _small_cloud(800, seed=2)
    spec = _spec(xyz, vsize=0.15, P=64, max_o=8192)
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)

    rng = np.random.default_rng(3)
    B, R, D, SR, K = 1, 16, 80, 8, 4
    radius_limit = 4 * 0.15
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = np.linspace(1.0, 5.0, D, dtype=np.float32)
    raypos = (campos + dirs[:, None, :] * ts[None, :, None])[None]

    res = query_neighbors(grid, jnp.asarray(xyz), jnp.asarray(raypos),
                          K=K, SR=SR, radius_limit=radius_limit)
    pidx = np.asarray(res.sample_pidx)
    loc = np.asarray(res.sample_loc_w)
    smask = np.asarray(res.sample_loc_mask)

    # oracle: brute-force KNN restricted to the 3^3 voxel neighborhood & radius
    coords_pts = np.floor((xyz - np.array(spec.min_corner))
                          / np.array(spec.vsize)).astype(int)
    for r in range(R):
        for s in range(SR):
            if not smask[0, r, s]:
                assert (pidx[0, r, s] == -1).all()
                continue
            center = loc[0, r, s]
            cc = np.floor((center - np.array(spec.min_corner))
                          / np.array(spec.vsize)).astype(int)
            nbr_mask = (np.abs(coords_pts - cc) <= 1).all(axis=-1)
            d2 = ((xyz - center) ** 2).sum(-1)
            cand = np.where(nbr_mask & (d2 <= radius_limit ** 2))[0]
            want = set(cand[np.argsort(d2[cand])][:K].tolist())
            got = set(int(i) for i in pidx[0, r, s] if i >= 0)
            if len(cand) >= K:
                # exact K nearest (distance ties could differ; tolerate by dist)
                got_d = sorted(d2[list(got)].tolist())
                want_d = sorted(d2[list(want)].tolist())
                np.testing.assert_allclose(got_d, want_d, atol=1e-6)
            else:
                assert got == want


def test_ray_mask_false_for_empty_rays():
    xyz = np.array([[0.0, 0.0, 0.0]], np.float32)
    spec = GridSpec(min_corner=(-1, -1, -1), vsize=(0.1, 0.1, 0.1),
                    vdim=(20, 20, 20), max_o=8, P=4, kernel_size=(3, 3, 3))
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(1, bool), spec)
    # one ray through the point, one far away
    ts = np.linspace(-0.5, 0.5, 16, dtype=np.float32)
    ray0 = np.stack([ts, np.zeros_like(ts), np.zeros_like(ts)], -1)
    ray1 = ray0 + np.array([0, 5.0, 0], np.float32)
    raypos = np.stack([ray0, ray1])[None]
    res = query_neighbors(grid, jnp.asarray(xyz), jnp.asarray(raypos),
                          K=2, SR=4, radius_limit=0.0)
    rm = np.asarray(res.ray_mask)
    assert rm[0, 0] and not rm[0, 1]


def test_nbr_cache_recall_vs_exact():
    """The merged-neighborhood fast path must reproduce the exact 27-voxel
    KNN (distances identical) when C bounds the true neighborhood size."""
    from sgnerf_tpu.ops.grid import compute_grid_spec, build_point_grid
    xyz = _small_cloud(800, seed=7)
    kwargs = dict(vsize=[0.15] * 3, vscale=[1, 1, 1], kernel_size=[3, 3, 3],
                  max_o=8192, P=64)
    spec_exact = compute_grid_spec(xyz, nbr_cache=0, **kwargs)
    spec_fast = compute_grid_spec(xyz, nbr_cache=256, **kwargs)
    g_exact = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                               spec_exact)
    g_fast = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                              spec_fast)

    rng = np.random.default_rng(8)
    R, D, SR, K = 16, 60, 8, 4
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = np.linspace(1.0, 5.0, D, dtype=np.float32)
    raypos = (campos + dirs[:, None, :] * ts[None, :, None])[None]

    kw = dict(K=K, SR=SR, radius_limit=4 * 0.15)
    r_exact = query_neighbors(g_exact, jnp.asarray(xyz), jnp.asarray(raypos),
                              **kw)
    r_fast = query_neighbors(g_fast, jnp.asarray(xyz), jnp.asarray(raypos),
                             **kw)
    pe = np.asarray(r_exact.sample_pidx)
    pf = np.asarray(r_fast.sample_pidx)
    # neighbor distance multisets must match
    for r in range(R):
        for s in range(SR):
            de = sorted(((xyz[i] - np.asarray(r_exact.sample_loc_w)[0, r, s])
                         ** 2).sum() for i in pe[0, r, s] if i >= 0)
            df = sorted(((xyz[i] - np.asarray(r_fast.sample_loc_w)[0, r, s])
                         ** 2).sum() for i in pf[0, r, s] if i >= 0)
            np.testing.assert_allclose(de, df, atol=1e-6)


def test_perspective_query_smoke():
    from sgnerf_tpu.ops.query_pers import (
        perspective_grid_spec, query_neighbors_perspective)
    from sgnerf_tpu.ops.camera import w2pers
    rng = np.random.default_rng(11)
    xyz = _small_cloud(400, seed=11) + np.array([0, 0, 3], np.float32)
    rot = jnp.eye(3)[None]
    campos = jnp.zeros((1, 3))
    pers = np.asarray(w2pers(jnp.asarray(xyz), rot[0], campos[0]))
    spec = perspective_grid_spec(pers, vsize=[0.05, 0.05, 0.05],
                                 vscale=[1, 1, 1], kernel_size=[3, 3, 3],
                                 max_o=8192, P=16, near=1.0, far=6.0)
    # rays through the cloud
    R, D = 8, 48
    d = rng.normal(size=(1, R, 3)).astype(np.float32) * 0.1
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ts = np.linspace(1.5, 5.0, D, dtype=np.float32)
    raypos = (np.zeros(3, np.float32) + np.asarray(d)[0][:, None, :]
              * ts[None, :, None])[None]
    res, pers_j = query_neighbors_perspective(
        jnp.asarray(xyz), jnp.ones(len(xyz), bool), jnp.asarray(raypos),
        rot, campos, spec, K=4, SR=6, radius_limit=0.2)
    assert np.asarray(res.ray_mask).any()
    pidx = np.asarray(res.sample_pidx)
    assert (pidx < len(xyz)).all()
    # any found neighbor is within the radius in PERSPECTIVE space
    loc = np.asarray(res.sample_loc_w)
    sm = np.asarray(res.sample_loc_mask)
    pe = np.asarray(pers_j)
    for r in range(R):
        for s in range(6):
            for k in pidx[0, r, s]:
                if k >= 0:
                    d2 = ((pe[k] - loc[0, r, s]) ** 2).sum()
                    assert d2 <= 0.2 ** 2 + 1e-6


def test_render_rays_perspective_smoke():
    import jax
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params)
    from sgnerf_tpu.models.point_cloud import make_point_cloud
    from sgnerf_tpu.models.renderer import (RenderConfig,
                                            render_rays_perspective)
    from sgnerf_tpu.ops.query_pers import perspective_spec_from_camera
    rng = np.random.default_rng(12)
    xyz = _small_cloud(600, seed=12) + np.array([0, 0, 3], np.float32)
    cloud = make_point_cloud(xyz, rng.normal(size=(600, 32)).astype(np.float32) * 0.1,
                             color=np.zeros((600, 3), np.float32),
                             dir=np.zeros((600, 3), np.float32))
    intr = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    pspec = perspective_spec_from_camera(intr, 32, 24, 1.0, 6.0,
                                         [0.05] * 3, [1, 1, 1], [3, 3, 3],
                                         8192, 8)
    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=32, SR=6, K=4,
                       vsize=(0.05,) * 3)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    d = rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.2
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = render_rays_perspective(
        params, cloud, pspec, cfg, campos=jnp.zeros((1, 3)),
        raydir=jnp.asarray(d), camrotc2w=jnp.eye(3)[None],
        near=1.0, far=6.0, bg_color=jnp.ones(3))
    col = np.asarray(out["coarse_raycolor"])
    assert col.shape == (1, 16, 3) and np.isfinite(col).all()
    assert np.asarray(out["ray_mask"]).any()


def _rays(B=1, R=48, D=64, seed=2):
    rng = np.random.default_rng(seed)
    campos = np.array([0.0, 0.0, -2.5], np.float32)
    d = rng.normal(size=(B, R, 3)).astype(np.float32) * 0.3
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(1.0, 4.5, D, dtype=np.float32)
    raypos = campos + d[..., None, :] * t[:, None]
    return jnp.asarray(raypos)


def test_two_level_compaction_matches_flat():
    """Coarse->fine segment compaction must select exactly the flat path's
    first-SR hits when seg_cap suffices (conservativeness:
    (L-1)/2 * step < F*vsize; here 0.082 < 0.2)."""
    import dataclasses
    xyz = _small_cloud(2000, seed=1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)  # sphere surface
    spec = _spec(xyz)
    grid = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    raypos = _rays(D=64)
    SR = 8
    loc, smask, _ = mask_and_compact_samples(raypos, grid, SR)

    for C in (64 // 4, 32, 12):
        spec2 = dataclasses.replace(spec, coarse_factor=4, seg_len=4,
                                    seg_cap=C)
        grid2 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                                 spec2)
        assert np.asarray(grid2.coarse_occ).shape == tuple(
            -(-s // 4) for s in spec.vdim)
        loc2, smask2, _ = mask_and_compact_samples(raypos, grid2, SR)
        np.testing.assert_array_equal(np.asarray(smask2), np.asarray(smask)), C
        np.testing.assert_allclose(np.asarray(loc2), np.asarray(loc)), C


def test_two_level_lazy_positions_match_eager():
    """The lazy-t compaction (positions recomputed from campos + t*dir)
    must match the raypos-gather path exactly — same mask, same locs —
    through mask_and_compact_samples AND query_neighbors."""
    import dataclasses
    xyz = _small_cloud(2000, seed=1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    spec = _spec(xyz)
    spec2 = dataclasses.replace(spec, coarse_factor=4, seg_len=4, seg_cap=16)
    grid2 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                             spec2)
    B, R, D = 1, 48, 64
    rng = np.random.default_rng(2)
    campos = np.array([[0.0, 0.0, -2.5]], np.float32)
    d = rng.normal(size=(B, R, 3)).astype(np.float32) * 0.3
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.broadcast_to(np.linspace(1.0, 4.5, D, dtype=np.float32),
                        (B, R, D))
    raypos = campos[:, None, None, :] + d[..., None, :] * t[..., None]
    raypos, d, t, campos = (jnp.asarray(raypos), jnp.asarray(d),
                            jnp.asarray(t), jnp.asarray(campos))

    loc_e, sm_e, _ = mask_and_compact_samples(raypos, grid2, 8)
    loc_l, sm_l, _ = mask_and_compact_samples(raypos, grid2, 8,
                                              campos=campos, raydir=d,
                                              tvals=t)
    np.testing.assert_array_equal(np.asarray(sm_e), np.asarray(sm_l))
    np.testing.assert_allclose(np.asarray(loc_e), np.asarray(loc_l),
                               atol=1e-6)

    q1 = query_neighbors(grid2, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2)
    q2 = query_neighbors(grid2, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2, campos=campos, raydir=d,
                         tvals=t)
    np.testing.assert_array_equal(np.asarray(q1.sample_pidx),
                                  np.asarray(q2.sample_pidx))


def test_two_level_query_neighbors_end_to_end():
    import dataclasses
    xyz = _small_cloud(2000, seed=1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    spec = _spec(xyz)
    spec2 = dataclasses.replace(spec, coarse_factor=4)
    raypos = _rays(D=64)
    g1 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    g2 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec2)
    q1 = query_neighbors(g1, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2)
    q2 = query_neighbors(g2, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2)
    np.testing.assert_array_equal(np.asarray(q1.sample_pidx),
                                  np.asarray(q2.sample_pidx))
    np.testing.assert_array_equal(np.asarray(q1.ray_mask),
                                  np.asarray(q2.ray_mask))


def test_bf16_cache_dtype_neighbor_agreement():
    """cache_dtype=bfloat16 stores offsets (<0.1 mm quantization at these
    voxel sizes) — neighbor sets must agree with the f32 cache."""
    import dataclasses
    xyz = _small_cloud(2000, seed=1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    spec = _spec(xyz)
    spec16 = dataclasses.replace(spec, cache_dtype="bfloat16")
    raypos = _rays(D=64)
    g1 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    g2 = build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec16)
    assert g2.nbr_xyz.dtype == jnp.bfloat16
    q1 = query_neighbors(g1, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2)
    q2 = query_neighbors(g2, jnp.asarray(xyz), raypos, K=4, SR=8,
                         radius_limit=0.2)
    a, b = np.asarray(q1.sample_pidx), np.asarray(q2.sample_pidx)
    loc = np.asarray(q1.sample_loc_w)
    valid = a >= 0
    agree = (a[valid] == b[valid]).mean()
    assert agree > 0.98, agree
    # the flips must be benign: the bf16-chosen neighbor sits within the
    # quantization distance of the f32-chosen one
    flip = valid & (a != b) & (b >= 0)
    if flip.any():
        pa = xyz[a[flip]]
        pb = xyz[b[flip]]
        centers = np.broadcast_to(loc[..., None, :], a.shape + (3,))[flip]
        da = np.linalg.norm(pa - centers, axis=-1)
        db = np.linalg.norm(pb - centers, axis=-1)
        assert np.abs(da - db).max() < 2e-3, np.abs(da - db).max()


def test_dilate_size_separate_from_kernel_size():
    """The reference dilates occupancy by QUERY_SIZE but walks neighbor
    shells by KERNEL_SIZE (build_occ_vox receives query_size_gpu,
    query_point_indices_worldcoords.py:797; query_along_ray receives
    kernel_size_gpu, :898). With kernel 5^3 / dilate 3^3: shading points
    only within 1 voxel of occupancy, but neighbors found up to 2 voxels
    away."""
    import jax.numpy as jnp
    from sgnerf_tpu.ops.grid import compute_grid_spec, build_point_grid
    from sgnerf_tpu.ops.query import query_neighbors

    # one point at the origin-ish cell center
    xyz = np.asarray([[0.05, 0.05, 0.05]], np.float32)
    pad = np.full((7, 3), 1e9, np.float32)
    allx = np.concatenate([xyz, pad])
    mask = jnp.asarray([True] + [False] * 7)
    spec = compute_grid_spec(xyz, vsize=[0.1] * 3, vscale=[1] * 3,
                             kernel_size=[5, 5, 5], max_o=256, P=4,
                             ranges=[-1.0] * 3 + [1.0] * 3,
                             dilate_size=[3, 3, 3])
    assert spec.dilate == (3, 3, 3) and spec.kernel_size == (5, 5, 5)
    grid = build_point_grid(jnp.asarray(allx), mask, spec)
    occ = np.asarray(grid.occ_mask)
    # dilation extent 3 -> exactly a 3^3 block is marked
    assert occ.sum() == 27

    # a sample 2 voxels away is NOT a shading point (outside 3^3 dilation)
    far = np.asarray([[[[0.25, 0.05, 0.05]]]], np.float32)  # (B,R,D,3)
    near = np.asarray([[[[0.15, 0.05, 0.05]]]], np.float32)
    qf = query_neighbors(grid, jnp.asarray(allx), jnp.asarray(far),
                         K=2, SR=1, radius_limit=0.0)
    qn = query_neighbors(grid, jnp.asarray(allx), jnp.asarray(near),
                         K=2, SR=1, radius_limit=0.0)
    assert not bool(qf.ray_mask.any())
    # ...but a shading point 1 voxel away finds the neighbor (search 5^3
    # covers it through the cache built over the kernel extent)
    assert bool(qn.ray_mask.all())
    assert int(qn.sample_pidx[0, 0, 0, 0]) == 0


def test_perspective_shpnt_jitter():
    """Train-time shading-point depth jitter on the perspective path
    (reference query_point_indices.py:96,116-126): uniform/gaussian perturb
    the render vs passfunc; inference (is_train=False) is unaffected."""
    import dataclasses
    import jax
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params)
    from sgnerf_tpu.models.point_cloud import make_point_cloud
    from sgnerf_tpu.models.renderer import (RenderConfig,
                                            render_rays_perspective)
    from sgnerf_tpu.ops.query_pers import perspective_spec_from_camera
    rng = np.random.default_rng(12)
    xyz = _small_cloud(600, seed=12) + np.array([0, 0, 3], np.float32)
    cloud = make_point_cloud(
        xyz, rng.normal(size=(600, 32)).astype(np.float32) * 0.1,
        color=np.zeros((600, 3), np.float32),
        dir=np.zeros((600, 3), np.float32))
    intr = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    pspec = perspective_spec_from_camera(intr, 32, 24, 1.0, 6.0,
                                         [0.05] * 3, [1, 1, 1], [3, 3, 3],
                                         8192, 8)
    base = RenderConfig(agg=AggregatorConfig(), z_depth_dim=32, SR=6, K=4,
                        vsize=(0.05,) * 3, jitter=0.0)
    params = init_aggregator_params(jax.random.key(0), base.agg)
    d = rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.2
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    kw = dict(campos=jnp.zeros((1, 3)), raydir=jnp.asarray(d),
              camrotc2w=jnp.eye(3)[None], near=1.0, far=6.0,
              bg_color=jnp.ones(3))
    key = jax.random.key(3)

    cols = {}
    for mode in ("passfunc", "uniform", "gaussian"):
        cfg = dataclasses.replace(base, shpnt_jitter=mode)
        out = render_rays_perspective(params, cloud, pspec, cfg,
                                      key=key, is_train=True, **kw)
        cols[mode] = np.asarray(out["coarse_raycolor"])
    assert np.abs(cols["uniform"] - cols["passfunc"]).max() > 1e-6
    assert np.abs(cols["gaussian"] - cols["passfunc"]).max() > 1e-6
    # inference ignores the jitter mode entirely
    c1 = render_rays_perspective(
        params, cloud, pspec,
        dataclasses.replace(base, shpnt_jitter="uniform"), **kw)
    c2 = render_rays_perspective(params, cloud, pspec, base, **kw)
    np.testing.assert_array_equal(np.asarray(c1["coarse_raycolor"]),
                                  np.asarray(c2["coarse_raycolor"]))


def test_max_o_overflow_warns(capsys):
    """Occupied voxels past max_o drop silently in the reference; our build
    prints a warning so the quality loss is visible."""
    from sgnerf_tpu.ops.grid import compute_grid_spec, build_point_grid
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    xyz = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    spec = compute_grid_spec(xyz, vsize=[0.05] * 3, vscale=[1] * 3,
                             kernel_size=[3, 3, 3], max_o=64, P=4,
                             ranges=[-2.0] * 3 + [2.0] * 3)
    build_point_grid(jnp.asarray(xyz), jnp.ones(5000, bool), spec)
    assert "max_o" in capsys.readouterr().out


def test_world_vs_perspective_render_parity():
    """On a frustum-contained scene built so both queriers must select the
    SAME neighbor sets (tight clusters placed exactly at ray-sample
    positions, separated farther than either kernel's reach), the
    world-coords path (wcoord_query=1) and the perspective path
    (wcoord_query=0, reference query_point_indices.py) render identical
    colors up to the pers<->world roundtrip epsilon."""
    import jax
    from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                              init_aggregator_params)
    from sgnerf_tpu.models.point_cloud import (
        make_point_cloud, build_grid, grid_spec_for_cloud)
    from sgnerf_tpu.models.renderer import (RenderConfig, render_rays,
                                            render_rays_perspective)
    from sgnerf_tpu.ops.query_pers import perspective_spec_from_camera

    rng = np.random.default_rng(7)
    near, far, D = 1.0, 5.0, 12           # sample spacing 1/3
    R = 6
    # hit-ray directions separated by >=0.7 TAN-ANGLE units (rays are
    # vertical lines in perspective space: clusters must be farther apart
    # than radius_limit+kernel reach in BOTH metrics, angular included)
    lat = np.array([[0.0, 0.0], [0.5, 0.5], [0.5, -0.5],
                    [-0.5, 0.5], [-0.5, -0.5], [0.0, 0.0]], np.float32)
    d = np.concatenate([lat, np.ones((R, 1), np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # one miss ray
    d[-1] = np.array([0.0, 0.95, 0.3], np.float32)
    d[-1] /= np.linalg.norm(d[-1])
    # 3-point clusters exactly at one sample position per hit ray
    pts = []
    for r in range(R - 1):
        i = 2 + r
        t = near + (i + 0.5) * (far - near) / D
        c = t * d[r]
        pts += [c + rng.uniform(-0.008, 0.008, 3).astype(np.float32)
                for _ in range(3)]
    xyz = np.stack(pts).astype(np.float32)
    emb = rng.normal(size=(len(xyz), 32)).astype(np.float32) * 0.1
    cloud = make_point_cloud(xyz, emb,
                             color=np.full((len(xyz), 3), 0.5, np.float32),
                             dir=np.tile(np.array([0, 0, 1], np.float32),
                                         (len(xyz), 1)))
    cfg = RenderConfig(agg=AggregatorConfig(act_type="LeakyReLU"),
                       z_depth_dim=D, SR=4, K=4, vsize=(0.05,) * 3)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)
    wspec = grid_spec_for_cloud(cloud, vsize=[0.05] * 3, vscale=[2, 2, 2],
                                kernel_size=[3, 3, 3], max_o=8192, P=16)
    grid = build_grid(cloud, wspec)
    intr = np.array([[40.0, 0, 24], [0, 40.0, 24], [0, 0, 1]])
    pspec = perspective_spec_from_camera(intr, 48, 48, near, far,
                                         [0.05] * 3, [2, 2, 2], [3, 3, 3],
                                         8192, 16)
    kw = dict(campos=jnp.zeros((1, 3)), raydir=jnp.asarray(d)[None],
              camrotc2w=jnp.eye(3)[None], near=near, far=far,
              bg_color=jnp.asarray([0.2, 0.4, 0.6]))
    ow = render_rays(params, cloud, grid, cfg, **kw)
    op = render_rays_perspective(params, cloud, pspec, cfg, **kw)
    mw = np.asarray(ow["ray_mask"])
    mp = np.asarray(op["ray_mask"])
    np.testing.assert_array_equal(mw, mp)
    assert mw[0, :-1].all() and not mw[0, -1]
    np.testing.assert_allclose(np.asarray(ow["coarse_raycolor"]),
                               np.asarray(op["coarse_raycolor"]), atol=1e-4)


def test_blocked_cache_build_matches_oneshot(monkeypatch):
    """The reference-scale block-wise cache build (donated-output
    dynamic-update-slice macro-blocks) produces the same dil_slot and
    packed table as the one-shot program."""
    from sgnerf_tpu.ops import grid as G
    xyz = _small_cloud(3000, seed=5)
    spec = compute_grid_spec(xyz, vsize=[0.06] * 3, vscale=[1, 1, 1],
                             kernel_size=[3, 3, 3], max_o=8192, P=16,
                             nbr_cache=16, cache_dtype="bfloat16")
    grid = G._build_grid_core(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                              spec)
    n_dil = int(np.asarray(grid.occ_mask).astype(np.int64).sum())
    max_d = ((n_dil + 1023) // 1024) * 1024
    ds1, pk1 = G._build_nbr_cache(grid, spec, max_d)
    monkeypatch.setattr(G, "_CACHE_BLOCK", 2048)
    monkeypatch.setattr(G, "_BLOCK_CHUNK", 512)
    ds2, pk2 = G._build_nbr_cache_blocked(grid, spec, max_d)
    np.testing.assert_array_equal(np.asarray(ds1), np.asarray(ds2))
    np.testing.assert_array_equal(np.asarray(pk1),
                                  np.asarray(pk2)[:max_d])


def test_blocked_build_pow2_padding(monkeypatch):
    """Regression guard for the 17x gather-layout pathology
    (PERFORMANCE.md, probe_pack_layout.py): a bare row-gather from the
    ONESHOT-built table measured 557-585 ms/call at 149k rows where the
    BLOCKED (pow2-row-padded) table measured 33-34 ms — same reported
    layout, so the only controllable property is the blocked build's row
    padding. Pins: (a) _CACHE_BLOCK is a power of two, (b) the blocked
    table's row count is a _CACHE_BLOCK multiple (never exactly max_d),
    (c) big tables route to the blocked build, small ones to one-shot."""
    from sgnerf_tpu.ops import grid as G
    assert G._CACHE_BLOCK & (G._CACHE_BLOCK - 1) == 0 and G._CACHE_BLOCK > 0

    xyz = _small_cloud(2000, seed=7)
    spec = compute_grid_spec(xyz, vsize=[0.06] * 3, vscale=[1, 1, 1],
                             kernel_size=[3, 3, 3], max_o=8192, P=16,
                             nbr_cache=16, cache_dtype="bfloat16")
    grid = G._build_grid_core(jnp.asarray(xyz), jnp.ones(len(xyz), bool),
                              spec)
    n_dil = int(np.asarray(grid.occ_mask).astype(np.int64).sum())
    max_d = ((n_dil + 1023) // 1024) * 1024
    monkeypatch.setattr(G, "_CACHE_BLOCK", 4096)
    monkeypatch.setattr(G, "_BLOCK_CHUNK", 512)
    assert max_d % G._CACHE_BLOCK != 0, "scene too round to test padding"
    _, pk = G._build_nbr_cache_blocked(grid, spec, max_d)
    assert pk.shape[0] % G._CACHE_BLOCK == 0 and pk.shape[0] > max_d

    # routing: the table_gb gate picks blocked above _BLOCKED_TABLE_GB
    calls = []
    monkeypatch.setattr(G, "_build_nbr_cache_blocked",
                        lambda *a: calls.append("blocked") or (None, None))
    monkeypatch.setattr(G, "_build_nbr_cache_oneshot",
                        lambda *a: calls.append("oneshot") or (None, None))
    monkeypatch.setattr(G, "_BLOCKED_TABLE_GB", 0.0)   # everything is "big"
    G.build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    monkeypatch.setattr(G, "_BLOCKED_TABLE_GB", 1e9)   # nothing is "big"
    G.build_point_grid(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    assert calls == ["blocked", "oneshot"]
