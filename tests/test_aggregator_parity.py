"""Weight-level parity: our aggregator vs the reference PointAggregator.

Constructs the actual reference torch module (pure-torch file, CPU-safe),
copies its weights through the checkpoint converter, feeds both with
identical inputs, and asserts the decoded (alpha, rgb) match to float32
tolerance. This is the strongest possible evidence that converted reference
checkpoints will render identically.
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.models.aggregator import AggregatorConfig, aggregate
from sgnerf_tpu.models.checkpoint_io import convert_reference_checkpoint

REF = "/root/reference"


def _shim_scipy():
    import scipy.special
    if not hasattr(scipy.special, "sph_harm"):
        scipy.special.sph_harm = scipy.special.sph_harm_y
    if not hasattr(scipy.special, "lpmn"):
        def lpmn(m, n, z):
            P = np.zeros((m + 1, n + 1))
            return P, P
        scipy.special.lpmn = lpmn


def _ref_aggregator(torch, predict_semantic=0, bpnet_layer=0):
    _shim_scipy()
    sys.path.insert(0, REF)
    try:
        import importlib
        mod = importlib.import_module("models.aggregators.point_aggregators")
    finally:
        sys.path.pop(0)

    class Opt:
        pass

    o = Opt()
    flags = dict(
        act_type="LeakyReLU", point_hyper_dim=256, point_features_dim=32,
        agg_distance_kernel="linear", agg_axis_weight=None, agg_dist_pers=20,
        apply_pnt_mask=1, modulator_concat=0, agg_intrp_order=2,
        shading_feature_mlp_layer0=1, shading_feature_mlp_layer1=2,
        shading_feature_mlp_layer2=0,
        shading_feature_mlp_layer2_bpnet=bpnet_layer,
        shading_feature_mlp_layer3=0, shading_feature_mlp_layer4=1,
        shading_feature_mlp_linear=0, shading_feature_num=256,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=4,
        shading_color_channel_num=3, num_feat_freqs=3, num_hyperfeat_freqs=0,
        dist_xyz_freq=5, dist_xyz_deno=0, weight_xyz_freq=2, weight_feat_dim=8,
        agg_weight_norm=1, view_ori=0, agg_feat_xyz_mode="None",
        agg_alpha_xyz_mode="None", agg_color_xyz_mode="None", act_super=1,
        num_pos_freqs=10, num_viewdir_freqs=4, which_agg_model="viewmlp",
        sh_degree=4, sh_dist_func="sh_quadric", sh_act="sigmoid",
        predict_semantic=predict_semantic, sparse_loss_weight=0,
        zero_one_loss_items=["conf_coefficient"], prob=0,
        feature_init_method="rand", point_color_mode="1", point_dir_mode="1")
    for k, v in flags.items():
        setattr(o, k, v)
    return mod.PointAggregator(o), o


def _inputs(seed=0, B=1, R=12, SR=5, K=4, F=32, with_sem=False):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(B, R, SR, K)) > 0.35
    mask[:, 0] = False          # a fully-invalid ray
    mask[:, 1, :, 1:] = False   # single-neighbor samples

    def r(*shape, scale=1.0):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    loc_w = r(B, R, SR, 3)
    xyz = loc_w[..., None, :] + r(B, R, SR, K, 3, scale=0.02)
    loc = loc_w + np.array([0, 0, 3], np.float32)      # fake perspective
    xyz_pers = xyz + np.array([0, 0, 3], np.float32)
    m4 = mask[..., None]
    data = dict(
        sampled_color=r(B, R, SR, K, 3) * m4,
        sampled_label_embedding=(r(B, R, SR, K, 96) * m4 if with_sem else None),
        sampled_dir=r(B, R, SR, K, 3) * m4,
        sampled_conf=np.abs(r(B, R, SR, K, 1)) * m4 + 0.5,
        sampled_embedding=r(B, R, SR, K, F, scale=0.3) * m4,
        sampled_xyz_pers=(xyz_pers * m4).astype(np.float32),
        sampled_xyz=(xyz * m4).astype(np.float32),
        sample_pnt_mask=mask,
        sample_loc=loc.astype(np.float32),
        sample_loc_w=loc_w,
        sample_ray_dirs=r(B, R, SR, 3),
    )
    return data


@pytest.mark.parametrize("with_sem", [False, True])
def test_aggregator_matches_reference(with_sem):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref, opt = _ref_aggregator(torch, predict_semantic=int(with_sem),
                               bpnet_layer=1 if with_sem else 0)
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)

    data = _inputs(with_sem=with_sem)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)

    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, ref_w, ref_conf = ref(
            t["sampled_color"], t["sampled_label_embedding"],
            torch.eye(3), t["sampled_dir"], t["sampled_conf"],
            t["sampled_embedding"], t["sampled_xyz_pers"], t["sampled_xyz"],
            t["sample_pnt_mask"], t["sample_loc"], t["sample_loc_w"],
            t["sample_ray_dirs"], vsize, 0.0)

    cfg = AggregatorConfig(
        predict_semantic=int(with_sem),
        shading_feature_mlp_layer2_bpnet=1 if with_sem else 0)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, w, conf = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"],
        sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"],
        sampled_label_embedding=j["sampled_label_embedding"],
        sampled_xyz=j["sampled_xyz"],
        sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"],
        sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.eye(3), vsize=vsize)

    ref_out = ref_out.numpy()
    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=1e-3)


def test_bf16_compute_close_to_f32():
    import dataclasses as dc
    import jax
    from sgnerf_tpu.models.aggregator import init_aggregator_params, aggregate
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)
    data = _inputs(seed=3)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    kwargs = dict(
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"], Rw2c=jnp.eye(3))
    out32, _, _, _ = aggregate(params, cfg, **kwargs)
    cfg16 = dc.replace(cfg, compute_dtype="bfloat16")
    out16, _, _, _ = aggregate(params, cfg16, **kwargs)
    # bf16 matmuls: expect close but not bit-equal
    diff = np.abs(np.asarray(out32) - np.asarray(out16))
    assert diff.max() < 0.05, diff.max()


def _rand_rots(rng, shape):
    """Random proper rotations via QR, batched over leading dims."""
    a = rng.normal(size=shape + (3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q.astype(np.float32)


def test_aggregator_block3_per_point_rw2c_matches_reference():
    """block3 (color/dir features) + per-neighbor Rw2c vs the reference
    viewmlp (point_aggregators.py:565-599, :638-653)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    probe, opt = _ref_aggregator(torch)
    opt.shading_feature_mlp_layer3 = 2
    ref = type(probe)(opt)                  # rebuild with block3 active
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)
    assert "block3" in params

    rng = np.random.default_rng(5)
    data = _inputs(seed=5)
    B, R, SR, K = data["sample_pnt_mask"].shape
    rots = _rand_rots(rng, (B, R, SR, K))
    vsize = np.array([0.008, 0.008, 0.008], np.float32)

    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, _, _ = ref(
            t["sampled_color"], None, torch.from_numpy(rots),
            t["sampled_dir"], t["sampled_conf"], t["sampled_embedding"],
            t["sampled_xyz_pers"], t["sampled_xyz"], t["sample_pnt_mask"],
            t["sample_loc"], t["sample_loc_w"], t["sample_ray_dirs"],
            vsize, 0.0)

    cfg = AggregatorConfig(shading_feature_mlp_layer3=2)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, _, _ = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.asarray(rots), vsize=vsize)
    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_rotation_invariance_with_rw2c():
    """Rigidly rotating all world-frame inputs while supplying Rw2c = R
    (the right-multiplied rotation) must reproduce the unrotated output —
    the invariance per-part Rw2c exists to preserve (run/editing.py)."""
    import jax
    from sgnerf_tpu.models.aggregator import init_aggregator_params
    cfg = AggregatorConfig(shading_feature_mlp_layer3=2)
    params = init_aggregator_params(jax.random.key(1), cfg)
    data = _inputs(seed=7)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}

    def run(d, Rw2c):
        out, _, w, _ = aggregate(
            params, cfg,
            sampled_embedding=d["sampled_embedding"],
            sampled_color=d["sampled_color"], sampled_dir=d["sampled_dir"],
            sampled_conf=d["sampled_conf"], sampled_label_embedding=None,
            sampled_xyz=d["sampled_xyz"],
            sampled_xyz_pers=d["sampled_xyz_pers"],
            sample_pnt_mask=d["sample_pnt_mask"], sample_loc=d["sample_loc"],
            sample_loc_w=d["sample_loc_w"],
            sample_ray_dirs=d["sample_ray_dirs"], Rw2c=Rw2c)
        return np.asarray(out), np.asarray(w)

    base_out, base_w = run(j, None)

    R = _rand_rots(np.random.default_rng(9), ())
    rot = dict(j)
    # sampled_dir rotates with the part (editor.py rotates stored dirs so
    # the aggregator's Rw2c application restores the canonical frame)
    for k in ("sampled_xyz", "sample_loc_w", "sample_ray_dirs",
              "sampled_dir"):
        rot[k] = j[k] @ R
    out_u, w_u = run(rot, jnp.asarray(R))      # uniform (3,3)
    np.testing.assert_allclose(out_u, base_out, atol=2e-4)
    np.testing.assert_allclose(w_u, base_w, atol=2e-4)

    B, Rr, SR, K = np.asarray(j["sample_pnt_mask"]).shape
    per = jnp.broadcast_to(jnp.asarray(R), (B, Rr, SR, K, 3, 3))
    out_p, w_p = run(rot, per)                 # per-neighbor path
    np.testing.assert_allclose(out_p, base_out, atol=2e-4)
    np.testing.assert_allclose(w_p, base_w, atol=2e-4)


# ------------------------------------------------------------ yuze variant

def _ref_yuze_aggregator(torch, layer3=2, layer4=1, linear=0):
    """Construct the reference's yuze aggregator VARIANT
    (point_aggregators_yuze.py — active block4 angle features, optional
    block_linear, alpha from the pre-block3 feat_branch)."""
    _shim_scipy()
    sys.path.insert(0, REF)
    try:
        import importlib
        mod = importlib.import_module(
            "models.aggregators.point_aggregators_yuze")
    finally:
        sys.path.pop(0)
    _, opt = _ref_aggregator(torch)     # reuse the flag template
    opt.shading_feature_mlp_layer3 = layer3
    opt.shading_feature_mlp_layer4 = layer4
    opt.shading_feature_mlp_linear = linear
    return mod.PointAggregator(opt), opt


@pytest.mark.parametrize("layer3,layer4,linear,rotate",
                         [(0, 1, 0, False),   # canonical: block4 only
                          (0, 2, 1, False),   # deep block4 + block_linear
                          (0, 1, 0, True)])   # uniform Rw2c rotation
def test_yuze_variant_matches_reference(layer3, layer4, linear, rotate):
    """Our agg_variant='yuze' vs the actual reference
    point_aggregators_yuze.py module, weight-for-weight.

    Parity domain is layer3=0: the reference module itself CRASHES when
    layer3>0 and layer4>0 are combined (block3 compacts sampled_color/
    sampled_dir by pnt_mask_flat, then block4 re-indexes the already-
    compacted tensors with the full-length mask — IndexError at yuze
    :671-685), so there is no reference semantics to match there. Our
    dense-masked version has no compaction and supports the combination."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref, _ = _ref_yuze_aggregator(torch, layer3, layer4, linear)
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)
    assert "block4" in params
    if linear:
        assert "block_linear" in params

    data = _inputs(seed=11)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)
    rot = (_rand_rots(np.random.default_rng(13), ()) if rotate
           else np.eye(3, dtype=np.float32))

    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, ref_w, ref_conf = ref(
            t["sampled_color"], None, torch.from_numpy(rot),
            t["sampled_dir"], t["sampled_conf"], t["sampled_embedding"],
            t["sampled_xyz_pers"], t["sampled_xyz"], t["sample_pnt_mask"],
            t["sample_loc"], t["sample_loc_w"], t["sample_ray_dirs"],
            vsize, 0.0)

    cfg = AggregatorConfig(agg_variant="yuze",
                           shading_feature_mlp_layer3=layer3,
                           shading_feature_mlp_layer4=layer4,
                           shading_feature_mlp_linear=linear)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, w, conf = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.asarray(rot), vsize=vsize)

    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_yuze_roundtrip_export():
    """block4/block_linear survive an export->convert cycle
    (checkpoint_io.py block list)."""
    import jax
    from sgnerf_tpu.models.aggregator import init_aggregator_params
    from sgnerf_tpu.models.checkpoint_io import export_reference_checkpoint
    torch = pytest.importorskip("torch")
    import tempfile, os
    cfg = AggregatorConfig(agg_variant="yuze", shading_feature_mlp_layer3=1,
                           shading_feature_mlp_layer4=1,
                           shading_feature_mlp_linear=1)
    params = init_aggregator_params(jax.random.key(3), cfg)
    pts = {"xyz": np.zeros((4, 3), np.float32),
           "embedding": np.zeros((4, 32), np.float32)}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.pth")
        export_reference_checkpoint(
            {k: v for k, v in params.items()}, pts, p)
        sd = {k: v.numpy() for k, v in torch.load(p).items()}
    back, _ = convert_reference_checkpoint(sd)
    for blk in ("block1", "block3", "block4", "block_linear",
                "alpha_branch", "color_branch"):
        assert blk in back, blk
        for a, b in zip(params[blk], back[blk]):
            np.testing.assert_array_equal(np.asarray(a["w"]), b["w"])
            np.testing.assert_array_equal(np.asarray(a["b"]), b["b"])


@pytest.mark.parametrize("layer3", [0, 2])
def test_agg_intrp_order1_matches_reference(layer3):
    """agg_intrp_order=1 (interpolate-then-decode, the reference's DTU
    generalizable-inference configs dev_scripts/dtu_test_inf/*): features
    weight-sum over K first, one alpha decode per shading point
    (point_aggregators.py:715-742)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    probe, opt = _ref_aggregator(torch)
    opt.agg_intrp_order = 1
    opt.shading_feature_mlp_layer3 = layer3
    ref = type(probe)(opt)
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)

    data = _inputs(seed=17)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)
    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, _, _ = ref(
            t["sampled_color"], None, torch.eye(3),
            t["sampled_dir"], t["sampled_conf"], t["sampled_embedding"],
            t["sampled_xyz_pers"], t["sampled_xyz"], t["sample_pnt_mask"],
            t["sample_loc"], t["sample_loc_w"], t["sample_ray_dirs"],
            vsize, 0.0)

    cfg = AggregatorConfig(agg_intrp_order=1,
                           shading_feature_mlp_layer3=layer3)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, _, _ = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.eye(3), vsize=vsize)
    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_unpack_embedding_modes_reference_packing():
    """unpack_embedding_modes vs the reference's set_points packing recipe
    (neural_points.py:594-620): conf -> dir -> color each PREPENDED when
    mode contains "0"; "01" packs AND keeps the separate copy (so the
    width guard must leave the packed embedding intact — the reference's
    point_features_dim counts the full packed width and block1 consumes
    it whole)."""
    from sgnerf_tpu.models.checkpoint_io import unpack_embedding_modes
    rng = np.random.default_rng(0)
    F, N = 8, 6
    feats = rng.normal(size=(N, F)).astype(np.float32)
    conf = rng.normal(size=(N, 1)).astype(np.float32)
    dr = rng.normal(size=(N, 3)).astype(np.float32)
    col = rng.normal(size=(N, 3)).astype(np.float32)

    # reference packing order: conf prepends, then dir prepends, then color
    packed = np.concatenate([col, dr, conf, feats], axis=-1)

    # pure mode "0": attributes live only in the embedding -> strip them out
    out = unpack_embedding_modes(
        {"embedding": packed, "conf": None, "dir": None, "color": None},
        point_conf_mode="0", point_dir_mode="0", point_color_mode="0",
        point_features_dim=F)
    np.testing.assert_array_equal(out["embedding"], feats)
    np.testing.assert_array_equal(out["conf"], conf)
    np.testing.assert_array_equal(out["dir"], dr)
    np.testing.assert_array_equal(out["color"], col)

    # mode "01" (the reference's DTU ete/inf configs): the separate copies
    # exist AND point_features_dim counts the packed width — embedding
    # must pass through un-stripped (block1 consumes the packed layout)
    out = unpack_embedding_modes(
        {"embedding": packed, "conf": conf, "dir": dr, "color": col},
        point_conf_mode="01", point_dir_mode="01", point_color_mode="01",
        point_features_dim=packed.shape[-1])
    np.testing.assert_array_equal(out["embedding"], packed)
    np.testing.assert_array_equal(out["conf"], conf)

    # pure mode "1" (ScanNet default): nothing packed, nothing stripped
    out = unpack_embedding_modes(
        {"embedding": feats, "conf": conf, "dir": dr, "color": col},
        point_conf_mode="1", point_dir_mode="1", point_color_mode="1",
        point_features_dim=F)
    np.testing.assert_array_equal(out["embedding"], feats)


@pytest.mark.parametrize("kernel,pers", [("linear", 20), ("quadric", 0),
                                         ("numlinear", 20),
                                         ("numquadric", 0)])
def test_non_unit_axis_weight_matches_reference(kernel, pers):
    """agg_axis_weight != (1,1,1): the reference's weighted distance-kernel
    branches (point_aggregators.py:475-513), quirks included (linear
    applies aw[0] to the xy norm and aw[1] to |z|). Every shipped config
    uses unit weights; this pins the branch anyway. quadric/numquadric
    broadcast the 3-wide weight over the full dists row, so (like the
    reference) they only run with 3-wide dists (agg_dist_pers<=9)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    probe, opt = _ref_aggregator(torch)
    opt.agg_distance_kernel = kernel
    opt.agg_dist_pers = pers
    ref = type(probe)(opt)
    # the reference constructor pins axis_weight to a CUDA tensor (:283);
    # install the CPU equivalent post-construction
    aw = (2.0, 0.5, 1.0)
    ref.axis_weight = torch.tensor(aw)[None, None, None, None, :]
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)

    data = _inputs(seed=19)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)
    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, ref_w, _ = ref(
            t["sampled_color"], None, torch.eye(3),
            t["sampled_dir"], t["sampled_conf"], t["sampled_embedding"],
            t["sampled_xyz_pers"], t["sampled_xyz"], t["sample_pnt_mask"],
            t["sample_loc"], t["sample_loc_w"], t["sample_ray_dirs"],
            vsize, 0.0)

    cfg = AggregatorConfig(agg_distance_kernel=kernel, agg_dist_pers=pers,
                           axis_weight=aw)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, w, _ = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.eye(3), vsize=vsize)
    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_block2_matches_reference_no_feat_pe():
    """shading_feature_mlp_layer2 (block2: re-concat PE'd dists, then MLP —
    point_aggregators.py:331-341,:624-630). Parity domain is
    num_feat_freqs=0: the reference init adds dist_xyz_dim only when
    feature PE is off while its forward concatenates dists whenever
    agg_intrp_order>0, so the reference module crashes for layer2>0 with
    feature PE on. Our init/forward gate identically (order>0) and so
    also support the PE-on combination."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    probe, opt = _ref_aggregator(torch)
    opt.shading_feature_mlp_layer2 = 2
    opt.num_feat_freqs = 0
    ref = type(probe)(opt)
    sd = {f"aggregator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _ = convert_reference_checkpoint(sd)
    assert "block2" in params

    data = _inputs(seed=23)
    vsize = np.array([0.008, 0.008, 0.008], np.float32)
    t = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    with torch.no_grad():
        ref_out, ref_valid, _, _ = ref(
            t["sampled_color"], None, torch.eye(3),
            t["sampled_dir"], t["sampled_conf"], t["sampled_embedding"],
            t["sampled_xyz_pers"], t["sampled_xyz"], t["sample_pnt_mask"],
            t["sample_loc"], t["sample_loc_w"], t["sample_ray_dirs"],
            vsize, 0.0)

    cfg = AggregatorConfig(shading_feature_mlp_layer2=2, num_feat_freqs=0)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, _, _ = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.eye(3), vsize=vsize)
    np.testing.assert_allclose(np.asarray(valid),
                               ref_valid.numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_block2_with_feat_pe_runs():
    """layer2>0 + num_feat_freqs>0 (the combination the reference module
    cannot construct consistently) runs end-to-end in our consistent
    gating."""
    import jax
    from sgnerf_tpu.models.aggregator import init_aggregator_params
    cfg = AggregatorConfig(shading_feature_mlp_layer2=1)
    params = init_aggregator_params(jax.random.key(0), cfg)
    data = _inputs(seed=29)
    j = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in data.items()}
    out, valid, _, _ = aggregate(
        params, cfg,
        sampled_embedding=j["sampled_embedding"],
        sampled_color=j["sampled_color"], sampled_dir=j["sampled_dir"],
        sampled_conf=j["sampled_conf"], sampled_label_embedding=None,
        sampled_xyz=j["sampled_xyz"], sampled_xyz_pers=j["sampled_xyz_pers"],
        sample_pnt_mask=j["sample_pnt_mask"], sample_loc=j["sample_loc"],
        sample_loc_w=j["sample_loc_w"],
        sample_ray_dirs=j["sample_ray_dirs"],
        Rw2c=jnp.eye(3))
    assert np.isfinite(np.asarray(out)).all()
