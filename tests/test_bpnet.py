"""BPNet semantic branch tests: sparse ops oracle, UNet shapes, full forward."""
import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnerf_tpu.ops.sparse import (
    make_sparse_grid, sparse_conv, sparse_conv_down, sparse_conv_up)
from sgnerf_tpu.models.bpnet.bpnet import (
    BPNet, BPNetConfig, voxelize, compute_linking, bpnet_forward,
    init_bpnet_params)
from sgnerf_tpu.ops.sparse import SparseGrid


def _rand_grid(n=50, dims=(16, 16, 16), c=4, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, dims[0], size=(n, 3)), axis=0)
    feats = rng.normal(size=(len(coords), c)).astype(np.float32)
    return make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(feats), dims), coords, feats


def test_sparse_conv_matches_dense_oracle():
    grid, coords, feats = _rand_grid()
    rng = np.random.default_rng(1)
    w = rng.normal(size=(27, 4, 6)).astype(np.float32)
    out = np.asarray(sparse_conv(grid, jnp.asarray(w), kernel_size=3))

    # dense oracle
    dense = np.zeros((16, 16, 16, 4), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(-1, 3)
    for i, c in enumerate(coords):
        acc = np.zeros(6, np.float32)
        for k, o in enumerate(offs):
            q = c + o
            if ((q >= 0) & (q < 16)).all():
                acc += dense[q[0], q[1], q[2]] @ w[k]
        np.testing.assert_allclose(out[i], acc, atol=1e-4)


def test_sparse_down_up_roundtrip_coords():
    grid, coords, _ = _rand_grid(n=80, seed=2)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(8, 4, 5)),
                    jnp.float32)
    down, f = sparse_conv_down(grid, w, out_capacity=128)
    dm = np.asarray(down.mask)
    dcoords = np.asarray(down.coords)[dm]
    want = np.unique(coords // 2, axis=0)
    assert sorted(map(tuple, dcoords)) == sorted(map(tuple, want))

    wu = jnp.asarray(np.random.default_rng(4).normal(size=(8, 5, 3)),
                     jnp.float32)
    up = sparse_conv_up(down, grid.coords, grid.mask, wu)
    assert up.shape == (grid.M, 3)
    assert np.isfinite(np.asarray(up)).all()


def test_voxelize_devoxelize():
    rng = np.random.default_rng(5)
    locs = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    feats = rng.uniform(0, 255, size=(500, 3)).astype(np.float32)
    vc, vf, inv, _ = voxelize(locs, feats, 0.1)
    assert len(vc) == len(vf) <= 500
    assert inv.shape == (500,)
    # same-voxel points share a row
    key = (locs / 0.1).astype(int)
    for i in range(0, 500, 83):
        same = (key == key[i]).all(-1)
        assert len(set(inv[same].tolist())) == 1


def test_compute_linking_projects_inside():
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = 16, 12
    c2w = np.eye(4)
    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])  # front / behind
    depth = np.full((24, 32), 2.0, np.float32)
    link = compute_linking(intr, c2w, pts, depth, 0.05)
    assert link[0, 2] == 1 and (link[0, :2] == [12, 16]).all()
    assert link[1, 2] == 0


@pytest.mark.slow
def test_bpnet_full_forward_smoke():
    cfg = BPNetConfig(view_num=2, img_wh=(64, 48))
    params = init_bpnet_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(6)
    M = 200
    coords = np.unique(rng.integers(0, 32, size=(M, 3)), axis=0)
    grid = make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(rng.normal(size=(len(coords), 3))
                                        .astype(np.float32)),
                            (32, 32, 32))
    imgs = jnp.asarray(rng.normal(size=(2, 48, 64, 3)).astype(np.float32))
    links = np.zeros((len(coords), 4, 2), np.int32)
    links[:, 1, :] = rng.integers(0, 48, size=(len(coords), 2))
    links[:, 2, :] = rng.integers(0, 64, size=(len(coords), 2))
    links[:, 3, :] = 1
    m = len(coords)
    sm, l2d, f3 = bpnet_forward(params, cfg, grid, imgs, jnp.asarray(links),
                                [m, m, m, m])
    assert sm.shape == (m, 20)
    assert l2d.shape == (2, 48, 64, 20)
    assert f3.shape == (m, 96)
    s = np.asarray(sm).sum(-1)
    act = np.asarray(grid.mask)
    np.testing.assert_allclose(s[act], 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(f3)).all()


@pytest.mark.slow
def test_bpnet_bf16_agrees_with_f32():
    """compute_dtype=bfloat16 must keep 3D label argmax agreement high
    (BN is inference-mode, so bf16 only perturbs conv accumulations)."""
    import dataclasses
    cfg = BPNetConfig(view_num=2, img_wh=(64, 48))
    params = init_bpnet_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    coords = np.unique(rng.integers(0, 32, size=(200, 3)), axis=0)
    grid = make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(rng.normal(size=(len(coords), 3))
                                        .astype(np.float32)),
                            (32, 32, 32))
    imgs = jnp.asarray(rng.normal(size=(2, 48, 64, 3)).astype(np.float32))
    links = np.zeros((len(coords), 4, 2), np.int32)
    links[:, 1, :] = rng.integers(0, 48, size=(len(coords), 2))
    links[:, 2, :] = rng.integers(0, 64, size=(len(coords), 2))
    links[:, 3, :] = 1
    m = len(coords)
    sm32, _, f32feat = bpnet_forward(params, cfg, grid, imgs,
                                     jnp.asarray(links), [m, m, m, m])
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    sm16, _, f16feat = bpnet_forward(params, cfg16, grid, imgs,
                                     jnp.asarray(links), [m, m, m, m])
    assert sm16.dtype == jnp.float32 and f16feat.dtype == jnp.float32
    act = np.asarray(grid.mask)
    lab32 = np.asarray(sm32).argmax(-1)[act]
    lab16 = np.asarray(sm16).argmax(-1)[act]
    assert (lab32 == lab16).mean() > 0.95, (lab32 == lab16).mean()
    assert np.isfinite(np.asarray(f16feat)).all()


def test_bpnet_2d_aug_blur(tmp_path):
    """--bpnet_aug: p=0.5 gaussian blur on the 2D branch input (reference
    bpnet_dataset/augmentation_2d.py RandomGaussianBlur; the reference's
    Crop member never moves content so blur is the whole augmentation).
    Links and labels must be untouched."""
    import os
    import numpy as np
    from PIL import Image
    from sgnerf_tpu.models.bpnet.bpnet import BPNet, BPNetConfig

    for sub in ("color", "depth", "pose", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "color/0.jpg")
    Image.fromarray((np.full((24, 32), 2000)).astype(np.uint16)).save(
        tmp_path / "depth/0.png")
    np.savetxt(tmp_path / "pose/0.txt", np.eye(4))
    Image.fromarray(rng.integers(0, 20, (24, 32)).astype(np.int32),
                    mode="I").save(tmp_path / "label/0.png")
    intr4 = np.eye(4); intr4[0, 0] = intr4[1, 1] = 20.0
    intr4[0, 2], intr4[1, 2] = 16, 12
    pts = rng.normal(size=(50, 3)).astype(np.float32) + [0, 0, 2]

    net = BPNet.__new__(BPNet)        # no params needed for _load_view
    net.cfg = BPNetConfig(img_wh=(32, 24), aug=0)
    base, link0, lab0 = net._load_view(str(tmp_path / "color/0.jpg"), pts,
                                       intr4)
    net.cfg = BPNetConfig(img_wh=(32, 24), aug=1)
    blur_seen = same_seen = False
    for seed in range(8):
        im, link, lab = net._load_view(str(tmp_path / "color/0.jpg"), pts,
                                       intr4,
                                       rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(link, link0)
        np.testing.assert_array_equal(lab, lab0)
        if np.abs(im - base).max() > 1e-4:
            blur_seen = True
        else:
            same_seen = True
    assert blur_seen and same_seen   # p=0.5: both branches occur


def test_elastic_distortion_prevoxel():
    """--bpnet_aug 3D branch: ElasticDistortion before voxelize (reference
    bpneter/bpnet.py:515 intent; augmentation.py:159-201 math). Displacement
    must be smooth (neighbors move together), bounded, and the aug=0 path
    must stay bit-identical."""
    import numpy as np
    from sgnerf_tpu.models.bpnet.bpnet import (elastic_distortion,
                                               prevoxel_distort)

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 2.0, size=(400, 3)).astype(np.float32)

    out = elastic_distortion(pts, 0.2, 0.4, np.random.default_rng(7))
    assert out.shape == pts.shape and out.dtype == np.float32
    disp = out - pts
    assert np.abs(disp).max() > 1e-4          # actually moved
    # blurred-noise magnitude: |disp| stays O(magnitude)
    assert np.abs(disp).max() < 5 * 0.4
    # smoothness: two points in the same granularity cell move ~together
    a = np.array([[1.0, 1.0, 1.0]], np.float32)
    b = a + 0.01
    pair = np.concatenate([pts, a, b])        # same noise grid for both
    moved = elastic_distortion(pair, 0.8, 1.6, np.random.default_rng(11))
    da, db = moved[-2] - pair[-2], moved[-1] - pair[-1]
    assert np.linalg.norm(da - db) < 0.25 * max(np.linalg.norm(da), 1e-3)

    # determinism per seed; chain applies both scales under one p=0.95 gate
    c1 = prevoxel_distort(pts, np.random.default_rng(5))
    c2 = prevoxel_distort(pts, np.random.default_rng(5))
    np.testing.assert_array_equal(c1, c2)


# ------------------------- BPNet checkpoint converter (fabricated reference)

def _me_offsets_ref(k):
    """MinkowskiEngine kernel-region enumeration, coded independently of
    checkpoint_io._me_kernel: FIRST spatial axis varies fastest; odd k is
    centered, k=2 uses {0,1} (ME KernelRegion semantics)."""
    r = list(range(-(k // 2), k // 2 + 1)) if k % 2 else list(range(k))
    return [(ox, oy, oz) for oz in r for oy in r for ox in r]


def test_me_kernel_matches_me_order_oracle():
    """Pin the _me_kernel permutation semantically: a kernel given in ME row
    order, applied by an ME-order dense oracle, must equal our sparse convs
    fed the converted kernel — for the 5^3 stem, 3^3 blocks, and the 2^3
    stride-2 down/up convs (VERDICT r2 item 6)."""
    from sgnerf_tpu.models.checkpoint_io import _me_kernel
    rng = np.random.default_rng(11)
    grid, coords, feats = _rand_grid(n=60, seed=11)
    dense = np.zeros((16, 16, 16, 4), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats

    for k in (3, 5):
        w_me = rng.normal(size=(k ** 3, 4, 5)).astype(np.float32)
        out = np.asarray(sparse_conv(grid, jnp.asarray(_me_kernel(w_me)),
                                     kernel_size=k))
        for i, c in enumerate(coords):
            acc = np.zeros(5, np.float32)
            for ki, o in enumerate(_me_offsets_ref(k)):
                q = c + np.asarray(o)
                if ((q >= 0) & (q < 16)).all():
                    acc += dense[q[0], q[1], q[2]] @ w_me[ki]
            np.testing.assert_allclose(out[i], acc, atol=1e-4,
                                       err_msg=f"k={k} row {i}")

    # stride-2 down conv (kernel 2)
    w_me = rng.normal(size=(8, 4, 5)).astype(np.float32)
    down, f = sparse_conv_down(grid, jnp.asarray(_me_kernel(w_me)),
                               out_capacity=128)
    dm = np.asarray(down.mask)
    dc = np.asarray(down.coords)
    f = np.asarray(f)
    for i in np.nonzero(dm)[0]:
        acc = np.zeros(5, np.float32)
        for ki, o in enumerate(_me_offsets_ref(2)):
            q = dc[i] * 2 + np.asarray(o)
            if (q < 16).all():
                acc += dense[q[0], q[1], q[2]] @ w_me[ki]
        np.testing.assert_allclose(f[i], acc, atol=1e-4)

    # stride-2 transpose conv (kernel 2): fine voxel reads its parent with
    # the tap of its parity bits
    wu_me = rng.normal(size=(8, 5, 3)).astype(np.float32)
    up = np.asarray(sparse_conv_up(down, grid.coords, grid.mask,
                                   jnp.asarray(_me_kernel(wu_me))))
    offs = _me_offsets_ref(2)
    for i, c in enumerate(coords):
        par = c // 2
        j = np.nonzero(dm & (dc == par).all(-1))[0]
        want = (f[j[0]] @ wu_me[offs.index(tuple(c - par * 2))]
                if len(j) else np.zeros(3, np.float32))
        np.testing.assert_allclose(up[i], want, atol=1e-4)


def _to_ref_me(a):
    """Our (K3,ci,co) z-fastest kernel -> ME x-fastest rows; (1,ci,co) ->
    ME's 2-D (ci,co) for kernel_size=1. Independent re-encoding (loop-built
    permutation, not checkpoint_io's transpose trick)."""
    a = np.asarray(a)
    if a.shape[0] == 1:
        return a[0]
    k = round(a.shape[0] ** (1 / 3))
    assert k ** 3 == a.shape[0]
    out = np.empty_like(a)
    for x in range(k):
        for y in range(k):
            for z in range(k):
                out[z * k * k + y * k + x] = a[x * k * k + y * k + z]
    return out


def _to_ref_2d(a):
    """Our HWIO conv -> torch OIHW."""
    return np.ascontiguousarray(np.asarray(a).transpose(3, 2, 0, 1))


def _fabricate_reference_bpnet_sd(p):
    """Emit the exact bpnet_5cm.pth.tar state_dict key/shape format
    (reference bpnet.py:214-245 attribute naming = state_dict prefixes;
    unet_2d.py:25-48, unet_3d.py:46-113 + ME BasicBlock conv1/norm1/conv2/
    norm2/downsample, bpm.py:27-51 Linking) from our param tree."""
    sd = {}

    def put_bn(prefix, bn):
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{k}"] = np.asarray(bn[k])

    def put_block2d(prefix, b):
        sd[f"{prefix}.conv1.weight"] = _to_ref_2d(b["conv1"])
        put_bn(f"{prefix}.bn1", b["bn1"])
        sd[f"{prefix}.conv2.weight"] = _to_ref_2d(b["conv2"])
        put_bn(f"{prefix}.bn2", b["bn2"])
        if "downsample" in b:
            sd[f"{prefix}.downsample.0.weight"] = _to_ref_2d(
                b["downsample"]["conv"])
            put_bn(f"{prefix}.downsample.1", b["downsample"]["bn"])

    u2 = p["unet2d"]
    sd["layer0_2d.0.weight"] = _to_ref_2d(u2["conv1"])
    put_bn("layer0_2d.1", u2["bn1"])
    for i in (1, 2, 3, 4):
        for j, b in enumerate(u2[f"layer{i}"]):
            put_block2d(f"layer{i}_2d.{j}", b)
    for j in (4, 3, 2):
        sd[f"up{j}_2d.0.weight"] = _to_ref_2d(u2[f"up{j}"]["conv"])
        put_bn(f"up{j}_2d.1", u2[f"up{j}"]["bn"])
        for i, b in enumerate(u2[f"delayer{j}"]):
            put_block2d(f"delayer{j}_2d.{i}", b)
    sd["cls_2d.0.weight"] = _to_ref_2d(u2["cls"]["conv1"])
    put_bn("cls_2d.1", u2["cls"]["bn"])
    sd["cls_2d.3.weight"] = _to_ref_2d(u2["cls"]["conv2"])
    sd["cls_2d.3.bias"] = np.asarray(u2["cls"]["bias2"])

    def put_mink_block(prefix, b):
        sd[f"{prefix}.conv1.kernel"] = _to_ref_me(b["conv1"])
        put_bn(f"{prefix}.norm1.bn", b["bn1"])
        sd[f"{prefix}.conv2.kernel"] = _to_ref_me(b["conv2"])
        put_bn(f"{prefix}.norm2.bn", b["bn2"])
        if "downsample" in b:
            sd[f"{prefix}.downsample.0.kernel"] = _to_ref_me(
                b["downsample"]["conv"])
            put_bn(f"{prefix}.downsample.1.bn", b["downsample"]["bn"])

    u3 = p["unet3d"]
    sd["layer0_3d.0.kernel"] = _to_ref_me(u3["conv0p1s1"])
    put_bn("layer0_3d.1.bn", u3["bn0"])
    for i in (1, 2, 3, 4):
        sd[f"layer{i}_3d.0.kernel"] = _to_ref_me(u3[f"conv{i}"])
        put_bn(f"layer{i}_3d.1.bn", u3[f"bn{i}"])
        for j, b in enumerate(u3[f"block{i}"]):
            put_mink_block(f"layer{i}_3d.3.{j}", b)
    sd["layer5_3d.0.kernel"] = _to_ref_me(u3["convtr4"])
    put_bn("layer5_3d.1.bn", u3["bntr4"])
    for li, bname, tname in ((6, "block5", "convtr5"),
                             (7, "block6", "convtr6"),
                             (8, "block7", "convtr7")):
        for j, b in enumerate(u3[bname]):
            put_mink_block(f"layer{li}_3d.0.{j}", b)
        sd[f"layer{li}_3d.1.kernel"] = _to_ref_me(u3[tname])
        put_bn(f"layer{li}_3d.2.bn", u3[f"bntr{tname[-1]}"])
    for j, b in enumerate(u3["block8"]):
        put_mink_block(f"layer9_3d.{j}", b)
    sd["cls_3d.kernel"] = _to_ref_me(u3["final"]["kernel"])   # 2-D in ME
    sd["cls_3d.bias"] = np.asarray(u3["final"]["bias"])

    for lv in ("p5", "p4", "p3", "p2"):
        lk = p[f"linker_{lv}"]
        pre = f"linker_{lv}"
        sd[f"{pre}.view_fusion.0.kernel"] = _to_ref_me(
            lk["view_fusion"]["conv1"])
        put_bn(f"{pre}.view_fusion.1.bn", lk["view_fusion"]["bn1"])
        sd[f"{pre}.view_fusion.3.kernel"] = _to_ref_me(
            lk["view_fusion"]["conv2"])
        put_bn(f"{pre}.view_fusion.4.bn", lk["view_fusion"]["bn2"])
        sd[f"{pre}.fuseTo3d.0.kernel"] = _to_ref_me(lk["fuseTo3d"]["conv"])
        put_bn(f"{pre}.fuseTo3d.1.bn", lk["fuseTo3d"]["bn"])
        sd[f"{pre}.view_sep.0.kernel"] = _to_ref_me(lk["view_sep"]["conv"])
        put_bn(f"{pre}.view_sep.1.bn", lk["view_sep"]["bn"])
        sd[f"{pre}.fuseTo2d.0.weight"] = _to_ref_2d(lk["fuseTo2d"]["conv"])
        put_bn(f"{pre}.fuseTo2d.1", lk["fuseTo2d"]["bn"])
    return sd


@pytest.mark.slow
def test_convert_bpnet_fabricated_checkpoint(tmp_path):
    """Full-converter round trip against a fabricated reference-format
    checkpoint: our init tree -> exact bpnet_5cm.pth.tar key format (torch
    .pth.tar with module. prefixes + state_dict wrapper) -> converter ->
    forward agreement with the original tree (VERDICT r2 item 6)."""
    torch = pytest.importorskip("torch")
    from sgnerf_tpu.models.checkpoint_io import convert_bpnet_checkpoint

    cfg = BPNetConfig(view_num=2, img_wh=(64, 48))
    params = init_bpnet_params(jax.random.key(3), cfg)
    sd = _fabricate_reference_bpnet_sd(params)
    path = str(tmp_path / "bpnet_5cm.pth.tar")
    torch.save({"state_dict": {f"module.{k}": torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd.items()}}, path)

    conv = convert_bpnet_checkpoint(path)

    # every converted leaf must equal the original tree bit-for-bit
    flat_a = jax.tree_util.tree_leaves_with_path(conv)
    by_path = {jax.tree_util.keystr(kp): np.asarray(v)
               for kp, v in jax.tree_util.tree_leaves_with_path(params)
               if hasattr(v, "shape")}
    assert len(flat_a) > 400
    for kp, v in flat_a:
        ks = jax.tree_util.keystr(kp)
        assert ks in by_path, f"converter emitted unknown leaf {ks}"
        np.testing.assert_array_equal(np.asarray(v), by_path[ks],
                                      err_msg=ks)

    # and the converted tree must run the full forward identically
    rng = np.random.default_rng(12)
    coords = np.unique(rng.integers(0, 32, size=(150, 3)), axis=0)
    grid = make_sparse_grid(jnp.asarray(coords, jnp.int32),
                            jnp.asarray(rng.normal(size=(len(coords), 3))
                                        .astype(np.float32)),
                            (32, 32, 32))
    imgs = jnp.asarray(rng.normal(size=(2, 48, 64, 3)).astype(np.float32))
    links = np.zeros((len(coords), 4, 2), np.int32)
    links[:, 1, :] = rng.integers(0, 48, size=(len(coords), 2))
    links[:, 2, :] = rng.integers(0, 64, size=(len(coords), 2))
    links[:, 3, :] = 1
    m = len(coords)
    caps = [m, m, m, m]
    sm_a, l2_a, f3_a = bpnet_forward(params, cfg, grid, imgs,
                                     jnp.asarray(links), caps)
    sm_b, l2_b, f3_b = bpnet_forward(conv, cfg, grid, imgs,
                                     jnp.asarray(links), caps)
    np.testing.assert_allclose(np.asarray(sm_a), np.asarray(sm_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2_a), np.asarray(l2_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f3_a), np.asarray(f3_b), atol=1e-6)


@pytest.mark.slow
def test_train_bpnet_vox_cache(tmp_path):
    """aug=0 voxelization caching (round-4, semantic-refresh cost): a
    second train_bpnet call on the SAME cloud must reuse the cached
    voxelization/SparseGrid (links projected for the M voxel
    representatives only) and return bitwise-identical outputs; a changed
    cloud must invalidate the cache."""
    import os
    from PIL import Image
    from sgnerf_tpu.models.bpnet.bpnet import BPNet, BPNetConfig

    for sub in ("color", "depth", "pose", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(2):
        img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"color/{i}.jpg")
        Image.fromarray(np.full((24, 32), 2000, np.uint16)).save(
            tmp_path / f"depth/{i}.png")
        np.savetxt(tmp_path / f"pose/{i}.txt", np.eye(4))
        paths.append(str(tmp_path / f"color/{i}.jpg"))
    intr4 = np.eye(4)
    intr4[0, 0] = intr4[1, 1] = 20.0
    intr4[0, 2], intr4[1, 2] = 16, 12

    locs = (rng.normal(size=(300, 3)) * 0.4 + [0, 0, 2]).astype(np.float32)
    feats = rng.uniform(0, 255, (300, 3)).astype(np.float32)

    net = BPNet(BPNetConfig(view_num=2, img_wh=(32, 24)),
                key=jax.random.key(1))
    out1 = net.train_bpnet(locs, feats, paths, paths[0], intr4)
    assert net._vox_cache is not None
    grid1 = net._vox_cache["grid"]          # hold a reference: id() stays valid
    out2 = net.train_bpnet(locs, feats, paths, paths[0], intr4)
    assert net._vox_cache["grid"] is grid1              # reused, not rebuilt
    for a, b in zip(out1[:4], out2[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # changed cloud -> recompute
    locs2 = locs + 0.05
    net.train_bpnet(locs2, feats, paths, paths[0], intr4)
    assert net._vox_cache["grid"] is not grid1
