"""Checkpoint I/O: native format + reference PyTorch `.pth` conversion.

Reference checkpoint layout ({iter}_net_ray_marching.pth, a flat state_dict of
`NeuralPointsRayMarching` — /root/reference/models/base_model.py:85-102, load
at neural_points.py:321-383):
  * neural_points.xyz                  [N,3]
  * neural_points.points_embeding      [1,N,32]
  * neural_points.points_conf          [1,N,1]
  * neural_points.points_dir           [1,N,3]
  * neural_points.points_color         [1,N,3]
  * neural_points.points_feats         [N,3]
  * neural_points.points_label         [N,1] (optional)
  * neural_points.Rw2c                 [3,3] (optional)
  * aggregator.block1.{0,2}.weight/bias          (Sequential: Linear at even idx)
  * aggregator.block2_bpnet.{0,..}.weight/bias   (optional)
  * aggregator.alpha_branch.{0}.weight/bias
  * aggregator.color_branch.{0,2,4,6}.weight/bias
Torch Linear stores weight as [out,in]; ours is [in,out].

A separate {iter}_states.pth holds counters (epoch/total_steps/best_PSNR,
run/train_ft.py:613-648). The 96-d BPNet point embedding is saved as
{iter}_semanticEmbedding.pth (neural_points_volumetric_model.py:674-681).

Native format: a single .npz of flattened key paths (no pickle), plus a JSON
sidecar for counters.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- native format

def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v

    def listify(d):
        if not isinstance(d, dict):
            return d
        keys = list(d.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(d[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in d.items()}

    return listify(root)


def save_native(path: str, tree: Any, meta: Optional[Dict] = None):
    flat: Dict[str, np.ndarray] = {}
    _flatten("", tree, flat)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_native(path: str) -> Tuple[Any, Optional[Dict]]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return _unflatten(flat), meta


# ------------------------------------------------------- reference .pth import

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _seq_layers(sd: Dict[str, np.ndarray], prefix: str):
    """Collect Linear layers of a torch Sequential in index order."""
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.weight$")
    idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    return [{"w": np.ascontiguousarray(sd[f"{prefix}.{i}.weight"].T.copy()),
             "b": sd[f"{prefix}.{i}.bias"].copy()} for i in idxs]


def convert_reference_checkpoint(sd: Dict[str, np.ndarray]):
    """Split a reference state dict into (aggregator params, point arrays).

    Returns (params, points) where points has keys xyz/embedding/conf/dir/
    color/feats/label/Rw2c (None when absent)."""
    params: Dict[str, Any] = {}
    for block in ("block1", "block2", "block2_bpnet", "block3",
                  "block4", "block_linear",     # yuze aggregator variant
                  "alpha_branch", "color_branch"):
        layers = _seq_layers(sd, f"aggregator.{block}")
        if layers:
            params[block] = layers

    def squeeze(name):
        a = sd.get(name)
        if a is None:
            return None
        a = np.asarray(a, np.float32)
        return a[0] if a.ndim == 3 and a.shape[0] == 1 else a

    points = {
        "xyz": sd.get("neural_points.xyz"),
        "embedding": squeeze("neural_points.points_embeding"),
        "conf": squeeze("neural_points.points_conf"),
        "dir": squeeze("neural_points.points_dir"),
        "color": squeeze("neural_points.points_color"),
        "feats": sd.get("neural_points.points_feats"),
        "label": sd.get("neural_points.points_label"),
        "Rw2c": sd.get("neural_points.Rw2c"),
    }
    return params, points


def export_reference_checkpoint(params: Dict[str, Any], points: Dict[str, Any],
                                path: str):
    """Write a reference-compatible .pth so reference tooling (Editor, eval)
    can consume our checkpoints."""
    import torch
    sd = {}
    for block, layers in params.items():
        for li, layer in enumerate(layers):
            sd[f"aggregator.{block}.{2 * li}.weight"] = torch.from_numpy(
                np.ascontiguousarray(np.asarray(layer["w"]).T))
            sd[f"aggregator.{block}.{2 * li}.bias"] = torch.from_numpy(
                np.asarray(layer["b"]))

    def unsqueeze(a):
        return torch.from_numpy(np.asarray(a, np.float32))[None]

    sd["neural_points.xyz"] = torch.from_numpy(
        np.asarray(points["xyz"], np.float32))
    for src, dst in (("embedding", "points_embeding"), ("conf", "points_conf"),
                     ("dir", "points_dir"), ("color", "points_color")):
        if points.get(src) is not None:
            sd[f"neural_points.{dst}"] = unsqueeze(points[src])
    if points.get("feats") is not None:
        sd["neural_points.points_feats"] = torch.from_numpy(
            np.asarray(points["feats"], np.float32))
    if points.get("Rw2c") is not None:
        sd["neural_points.Rw2c"] = torch.from_numpy(
            np.asarray(points["Rw2c"], np.float32))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import torch as _t
    _t.save(sd, path)


# -------------------------------------------------- MVSNet .ckpt conversion

def _conv_w(a):
    """torch conv (co,ci,k...) or transpose-conv (ci,co,k...) -> trailing-IO:
    2D (kh,kw,ci,co); 3D and transpose-3D (kd,kh,kw,ci/co,co/ci) — the same
    permutation works for both conv3d (DHWIO) and our conv_transpose3d_s2
    (which takes (k,k,k,co,ci) with transpose_kernel=True)."""
    a = np.asarray(a)
    if a.ndim == 4:
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    return np.ascontiguousarray(a.transpose(2, 3, 4, 1, 0))


def convert_official_mvsnet_checkpoint(path: str):
    """Convert the reference's pretrained MVSNet checkpoint
    (pre_d_est, e.g. MVSNet/model_000014.ckpt with a {'model': state_dict}
    wrapper — mvs_points_model.py:66-74) into our `official` param tree."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw)
    flat = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        flat[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else v

    def bn(prefix):
        return {"weight": flat[f"{prefix}.weight"],
                "bias": flat[f"{prefix}.bias"],
                "running_mean": flat[f"{prefix}.running_mean"],
                "running_var": flat[f"{prefix}.running_var"]}

    def cbr(prefix):
        # reference ConvBnReLU: .conv (Conv, no bias) + .bn
        return {"conv": {"weight": _conv_w(flat[f"{prefix}.conv.weight"])},
                "bn": bn(f"{prefix}.bn")}

    feature = {f"conv{i}": cbr(f"feature.conv{i}") for i in range(7)}
    feature["feature"] = {"weight": _conv_w(flat["feature.feature.weight"]),
                          "bias": flat["feature.feature.bias"]}

    cr = "cost_regularization"
    cost = {f"conv{i}": cbr(f"{cr}.conv{i}") for i in (0, 1, 2, 3, 4, 5, 6)}
    for i in (7, 9, 11):
        cost[f"conv{i}"] = {
            "0": {"weight": _conv_w(flat[f"{cr}.conv{i}.0.weight"])},
            "1": bn(f"{cr}.conv{i}.1")}
    cost["prob"] = {"weight": _conv_w(flat[f"{cr}.prob.weight"]),
                    "bias": flat[f"{cr}.prob.bias"]}
    return {"feature": feature, "cost_regularization": cost}


def convert_mvsnerf_featurenet_checkpoint(sd: Dict[str, np.ndarray],
                                          prefix: str = "FeatureNet"):
    """Convert the MVSNeRF-style FeatureNet (mvs/models.py:717-765, ABN
    normalization) used by query_embedding. ABN params map to our
    BN+leaky_relu directly (weight/bias/running stats)."""
    def bn(p):
        return {"weight": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
                "running_mean": sd[f"{p}.running_mean"],
                "running_var": sd[f"{p}.running_var"]}

    def cbr(p):
        return {"conv": {"weight": _conv_w(sd[f"{p}.conv.weight"])},
                "bn": bn(f"{p}.bn")}

    out = {
        "conv0": {"0": cbr(f"{prefix}.conv0.0"), "1": cbr(f"{prefix}.conv0.1")},
        "conv1": {str(i): cbr(f"{prefix}.conv1.{i}") for i in range(3)},
        "conv2": {str(i): cbr(f"{prefix}.conv2.{i}") for i in range(3)},
        "toplayer": {"weight": _conv_w(sd[f"{prefix}.toplayer.weight"]),
                     "bias": sd[f"{prefix}.toplayer.bias"]},
    }
    return out


def unpack_embedding_modes(points: Dict[str, Any], point_conf_mode: str = "1",
                           point_dir_mode: str = "1",
                           point_color_mode: str = "1",
                           point_features_dim: int = 32) -> Dict[str, Any]:
    """Undo mode-0 attribute packing: with point_{conf,dir,color}_mode "0",
    the attribute was concatenated into points_embeding instead of stored
    separately (reference set_points, neural_points.py:594-620; packing order
    conf -> dir -> color, each PREPENDED, so the final leading layout is
    [color(3), dir(3), conf(1), features])."""
    emb = points.get("embedding")
    if emb is None:
        return points
    out = dict(points)
    emb = np.asarray(emb)
    if "0" in str(point_color_mode) and out.get("color") is None \
            and emb.shape[-1] > point_features_dim:
        out["color"], emb = emb[:, :3], emb[:, 3:]
    if "0" in str(point_dir_mode) and out.get("dir") is None \
            and emb.shape[-1] > point_features_dim:
        out["dir"], emb = emb[:, :3], emb[:, 3:]
    if "0" in str(point_conf_mode) and out.get("conf") is None \
            and emb.shape[-1] > point_features_dim:
        out["conf"], emb = emb[:, :1], emb[:, 1:]
    out["embedding"] = emb
    return out


def load_reference_states(path: str) -> Dict[str, Any]:
    """Read the companion {iter}_states.pth (epoch/total_steps/best_PSNR —
    run/train_ft.py:613-648)."""
    import torch
    st = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in dict(st).items():
        try:
            out[k] = float(v) if hasattr(v, "item") else v
        except Exception:
            out[k] = v
    return out


# ---------------------------------------------------- BPNet .pth.tar import

def _me_kernel(a, reorder=True):
    """MinkowskiEngine conv kernel (K3, ci, co) -> ours (K3, ci, co).

    ME enumerates hypercube kernel offsets with the FIRST spatial axis
    varying fastest; our ops/sparse._offsets varies the LAST axis fastest
    (meshgrid 'ij'). `reorder` permutes rows between the two conventions
    (an involution for cubic kernels). Pinned against an independent
    ME-ordering dense oracle in tests/test_bpnet.py
    (test_me_kernel_matches_me_order_oracle) and round-tripped through a
    fabricated reference-format checkpoint (test_convert_bpnet_fabricated).

    kernel_size=1 convs (block downsamples, cls_3d) are stored 2-D
    (ci, co) by ME — lift them to our (1, ci, co)."""
    a = np.asarray(a)
    if a.ndim == 2:
        return a[None]
    if not reorder or a.ndim != 3:
        return a
    k3 = a.shape[0]
    k = round(k3 ** (1 / 3))
    if k ** 3 != k3:
        return a
    idx = np.arange(k3).reshape(k, k, k)           # ME: x fastest
    perm = idx.transpose(2, 1, 0).reshape(-1)      # ours: z fastest
    return a[perm]


def _bn_t(sd, p):
    return {"weight": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
            "running_mean": sd[f"{p}.running_mean"],
            "running_var": sd[f"{p}.running_var"]}


def convert_bpnet_checkpoint(path_or_sd, classes: int = 20):
    """Convert a reference BPNet checkpoint (bpnetweight flag, e.g.
    bpnet_5cm.pth.tar with a {'state_dict': ...} wrapper) into our
    param tree (models/bpnet). Maps the 2D ResUNet-34, the MinkUNet18A
    stages, and the 4 Linking modules (bpnet.py:212-245 naming)."""
    if isinstance(path_or_sd, str):
        import torch
        raw = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        sd = raw.get("state_dict", raw.get("model", raw))
        sd = {(k[len("module."):] if k.startswith("module.") else k):
              (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
              for k, v in sd.items()}
    else:
        sd = path_or_sd

    out: Dict[str, Any] = {"unet2d": {}, "unet3d": {}}

    # ---- 2D branch
    def block2d(prefix, stride):
        b = {"conv1": _conv_w(sd[f"{prefix}.conv1.weight"]),
             "bn1": _bn_t(sd, f"{prefix}.bn1"),
             "conv2": _conv_w(sd[f"{prefix}.conv2.weight"]),
             "bn2": _bn_t(sd, f"{prefix}.bn2")}
        if f"{prefix}.downsample.0.weight" in sd:
            b["downsample"] = {
                "conv": _conv_w(sd[f"{prefix}.downsample.0.weight"]),
                "bn": _bn_t(sd, f"{prefix}.downsample.1")}
        return b

    def layer2d(prefix, stride):
        blocks = []
        i = 0
        while f"{prefix}.{i}.conv1.weight" in sd:
            blocks.append(block2d(f"{prefix}.{i}", stride if i == 0 else 1))
            i += 1
        return blocks

    u2 = out["unet2d"]
    u2["conv1"] = _conv_w(sd["layer0_2d.0.weight"])
    u2["bn1"] = _bn_t(sd, "layer0_2d.1")
    for i, stride in ((1, 1), (2, 2), (3, 2), (4, 2)):
        u2[f"layer{i}"] = layer2d(f"layer{i}_2d", stride)
    for j in (4, 3, 2):
        u2[f"up{j}"] = {"conv": _conv_w(sd[f"up{j}_2d.0.weight"]),
                        "bn": _bn_t(sd, f"up{j}_2d.1")}
        u2[f"delayer{j}"] = layer2d(f"delayer{j}_2d", 1)
    u2["cls"] = {"conv1": _conv_w(sd["cls_2d.0.weight"]),
                 "bn": _bn_t(sd, "cls_2d.1"),
                 "conv2": _conv_w(sd["cls_2d.3.weight"]),
                 "bias2": sd["cls_2d.3.bias"]}

    # ---- 3D branch (ME kernels are already (K3, ci, co))
    u3 = out["unet3d"]
    u3["conv0p1s1"] = _me_kernel(sd["layer0_3d.0.kernel"])
    u3["bn0"] = _bn_t(sd, "layer0_3d.1.bn")

    def mink_block(prefix):
        b = {"conv1": _me_kernel(sd[f"{prefix}.conv1.kernel"]),
             "bn1": _bn_t(sd, f"{prefix}.norm1.bn"),
             "conv2": _me_kernel(sd[f"{prefix}.conv2.kernel"]),
             "bn2": _bn_t(sd, f"{prefix}.norm2.bn")}
        if f"{prefix}.downsample.0.kernel" in sd:
            b["downsample"] = {
                "conv": _me_kernel(sd[f"{prefix}.downsample.0.kernel"]),
                "bn": _bn_t(sd, f"{prefix}.downsample.1.bn")}
        return b

    def mink_blocks(prefix):
        blocks = []
        i = 0
        while f"{prefix}.{i}.conv1.kernel" in sd:
            blocks.append(mink_block(f"{prefix}.{i}"))
            i += 1
        return blocks

    # encoder stages: layer{i}_3d = Sequential(conv, bn, relu, blocks)
    for i in range(1, 5):
        u3[f"conv{i}"] = _me_kernel(sd[f"layer{i}_3d.0.kernel"])
        u3[f"bn{i}"] = _bn_t(sd, f"layer{i}_3d.1.bn")
        u3[f"block{i}"] = mink_blocks(f"layer{i}_3d.3")
    # decoder: layer5 = (convtr4, bn); layer6 = (block5, convtr5, bn); ...
    u3["convtr4"] = _me_kernel(sd["layer5_3d.0.kernel"])
    u3["bntr4"] = _bn_t(sd, "layer5_3d.1.bn")
    for li, (bname, tname) in ((6, ("block5", "convtr5")),
                               (7, ("block6", "convtr6")),
                               (8, ("block7", "convtr7"))):
        u3[bname] = mink_blocks(f"layer{li}_3d.0")
        u3[tname] = _me_kernel(sd[f"layer{li}_3d.1.kernel"])
        u3[f"bntr{tname[-1]}"] = _bn_t(sd, f"layer{li}_3d.2.bn")
    u3["block8"] = mink_blocks("layer9_3d")
    u3["final"] = {"kernel": _me_kernel(sd["cls_3d.kernel"]),
                   "bias": sd.get("cls_3d.bias", np.zeros(classes, np.float32))}

    # ---- linkers
    for lv in ("p5", "p4", "p3", "p2"):
        p = f"linker_{lv}"
        out[p] = {
            "view_fusion": {
                "conv1": _me_kernel(sd[f"{p}.view_fusion.0.kernel"]),
                "bn1": _bn_t(sd, f"{p}.view_fusion.1.bn"),
                "conv2": _me_kernel(sd[f"{p}.view_fusion.3.kernel"]),
                "bn2": _bn_t(sd, f"{p}.view_fusion.4.bn")},
            "fuseTo3d": {
                "conv": _me_kernel(sd[f"{p}.fuseTo3d.0.kernel"]),
                "bn": _bn_t(sd, f"{p}.fuseTo3d.1.bn")},
            "view_sep": {
                "conv": _me_kernel(sd[f"{p}.view_sep.0.kernel"]),
                "bn": _bn_t(sd, f"{p}.view_sep.1.bn")},
            "fuseTo2d": {
                "conv": _conv_w(sd[f"{p}.fuseTo2d.0.weight"]),
                "bn": _bn_t(sd, f"{p}.fuseTo2d.1")},
        }
    return out
