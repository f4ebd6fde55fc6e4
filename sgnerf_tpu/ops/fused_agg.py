"""Fused Pallas aggregator MLP: PE -> block1 -> alpha head -> weighted
K-reduction in one VMEM-resident kernel.

The XLA path (models/aggregator.py `aggregate`) materializes every
per-neighbor intermediate in HBM: the assembled PE input (Mn,284), two
256-wide hidden activations, the per-neighbor alpha — ~8-10 GB of HBM
round-trips per 9216-ray chunk for compute the MXU finishes in ~3 ms.
This kernel keeps a TM*K-row tile of neighbors entirely in VMEM through

    PE(feat, num_feat_freqs) ++ PE(dist, dist_xyz_freq)
      -> block1 (Linear->LeakyReLU stack, width 256)
      -> per-neighbor alpha = softplus(raw - 1)         (reference
         point_aggregators.py:298 raw2out_density, act_super=1)
      -> weighted sum over the K neighbor slots          (reference :743-770)

and only writes the per-shading-point (M, 256+1) result. HBM traffic drops
from ~8 GB to ~0.5 GB per chunk.

PE layout trick: the reference interleaves sin/cos per element with the
frequency axis innermost per channel (helpers/networks.py:175-192; see
ops/pe.py). Lane-interleaving is awkward in Mosaic, so the kernel computes
[sin(x (x) freqs) | cos(x (x) freqs)] in frequency-major blocks and the HOST
permutes block1's first weight matrix rows to match (`_permute_w1`): the
fused kernel is bit-for-bit the same function of the checkpoint weights.

The inputs stay POINT-MAJOR, flattened to 2-D ((M*K, C) — a leading-axis
merge, free in XLA; 3-D (M, K, C) operands were measured to cost ~16 ms
of XLA-side relayout copies per chunk, and a neighbor-major transpose at
entry ~13 ms). Each grid step takes a (TM*K, C) block and the weighted
K-reduction splits the leading axis back to (TM, K, C+1) — a Mosaic
layout no-op, K=8 is exactly the f32 sublane tile — and sums over the
sublane axis. (A first version used an MXU selector matmul S @ (h*w);
its cost is O(M*K*C*TM) and profiled at 16 ms/chunk — the sublane
reduction removes it.)
The two PE halves share one sin and one cos matmul (rows [WsinF; WsinD]),
so block1's first layer runs as 3 MXU contractions (K-dims 32/126/126)
instead of 5.

Differentiable everywhere: a custom_vjp pairs the Pallas forward with a
backward chosen by the `bwd` static flag — "xla" recomputes the un-fused
path and differentiates it (no hand-written kernel, but every per-neighbor
intermediate round-trips HBM twice more), "pallas" runs a fused backward
kernel (`_pallas_backward`): each tile recomputes its activations in VMEM,
backprops alpha head -> MLP stack -> PE in-register, writes per-row input
grads, and accumulates the weight grads across the (sequential) grid steps
into revisited output blocks. Gradients are exact (f32 parity with
jax.vjp of the XLA path is tested; bf16 matmul mode matches the XLA
recompute's own tolerance). Enabled via AggregatorConfig.fused_mlp="pallas"
(options --fused_mlp auto turns it on when the backend is a TPU);
--fused_bwd picks the backward (default xla until the kernel is measured
on real hardware).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _w1_rows(F: int, nf: int, Dd: int, df: int):
    """Row indices of block1's first weight matrix (reference layout
    [feat | PE(feat) | PE(dist)], sin/cos interleaved with frequency
    innermost per channel) for the kernel's frequency-major sin/cos-split
    layout. Returns (sin_rows_f, cos_rows_f, sin_rows_d, cos_rows_d)."""
    # reference rows F + 2*(c*nf + f) + s  (s=0 sin, 1 cos)
    c = np.arange(F)[:, None]
    f = np.arange(nf)[None, :]
    sin_rows = (F + 2 * (c * nf + f)).T.reshape(-1)      # f-major: c + F*f
    base = F + 2 * F * nf
    c = np.arange(Dd)[:, None]
    f = np.arange(df)[None, :]
    sin_rows_d = (base + 2 * (c * df + f)).T.reshape(-1)  # c + Dd*f
    return sin_rows, sin_rows + 1, sin_rows_d, sin_rows_d + 1


def _permute_w1(w1: jnp.ndarray, F: int, nf: int, Dd: int, df: int):
    """Split block1's first weight matrix (rows ordered for the reference
    feature layout [feat | PE(feat) | PE(dist)]) into per-part matrices whose
    rows match the kernel's frequency-major, sin/cos-split layout.

    F: feature channels, nf: num_feat_freqs, Dd: dist channels,
    df: dist_xyz_freq. Returns (Wf, WsinF, WcosF, WsinD, WcosD).
    """
    sin_rows, cos_rows, sin_rows_d, cos_rows_d = _w1_rows(F, nf, Dd, df)
    return (w1[:F], w1[sin_rows], w1[cos_rows],
            w1[sin_rows_d], w1[cos_rows_d])


def _unpermute_dw1(dWf, dWsin, dWcos, F: int, nf: int, Dd: int, df: int):
    """Inverse of `_permute_w1` for gradients: scatter the kernel-layout
    weight grads back into the reference row order."""
    sin_rows, cos_rows, sin_rows_d, cos_rows_d = _w1_rows(F, nf, Dd, df)
    R1 = F + 2 * F * nf + 2 * Dd * df
    dW1 = jnp.zeros((R1, dWf.shape[1]), dWf.dtype)
    dW1 = dW1.at[np.arange(F)].set(dWf)
    dW1 = dW1.at[sin_rows].set(dWsin[:F * nf])
    dW1 = dW1.at[cos_rows].set(dWcos[:F * nf])
    dW1 = dW1.at[sin_rows_d].set(dWsin[F * nf:])
    dW1 = dW1.at[cos_rows_d].set(dWcos[F * nf:])
    return dW1


def _freq_major(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """(..., C) -> (..., C*freqs) as [x*2^0 | x*2^1 | ...] (frequency-major
    lane blocks, matching `_permute_w1`'s row order)."""
    return jnp.concatenate([x * (2.0 ** f) for f in range(freqs)], axis=-1)


def _dot_mm(bf16):
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def dot(a, b):
        return jnp.dot(a.astype(mm), b.astype(mm),
                       preferred_element_type=jnp.float32)
    return dot


def _block1_alpha_body(feat_ref, d_ref, w_ref,
                       wf_ref, wsin_ref, wcos_ref, b1_ref,
                       rest_w_refs, rest_b_refs, wa_ref, ba_ref,
                       *, K: int, nf: int, df: int, bf16: bool,
                       n_rest: int):
    """Shared kernel body: PE -> block1 -> per-neighbor alpha -> weighted
    K-reduction. Returns (TM, C+1) f32 [feat_agg | alpha_agg]."""
    dot = _dot_mm(bf16)
    TMK, F = feat_ref.shape
    TM = TMK // K
    feat = feat_ref[...]                       # (TMK, F) point-major rows
    d = d_ref[...]
    pf = _freq_major(feat, nf)                 # (KTM, F*nf)
    pd = _freq_major(d, df)                    # (KTM, Dd*df)
    z = jnp.concatenate([pf, pd], axis=-1)     # (KTM, F*nf + Dd*df)
    h = (dot(feat, wf_ref[...])
         + dot(jnp.sin(z), wsin_ref[...]) + dot(jnp.cos(z), wcos_ref[...])
         + b1_ref[...])
    h = jax.nn.leaky_relu(h, negative_slope=0.01)
    for i in range(n_rest):
        h = jax.nn.leaky_relu(
            dot(h, rest_w_refs[i][...]) + rest_b_refs[i][...],
            negative_slope=0.01)

    # per-neighbor alpha: softplus(h @ wa + ba - 1); wa enters as a (1, C)
    # row so the head is a lane reduction, not a width-1 matmul
    raw = jnp.sum(h * wa_ref[...], axis=-1, keepdims=True) + ba_ref[...]
    alpha = jax.nn.softplus(raw - 1.0)         # (KTM, 1)

    w = w_ref[...]                             # (TMK, 1) weight*conf, 0 masked
    z2 = jnp.concatenate([h * w, alpha * w], axis=-1)  # (TMK, C+1)

    # weighted sum over the K neighbor slots: split the leading axis (a
    # layout no-op — K=8 becomes the sublane dim) and reduce over it.
    # No selector matmul (O(M*K*C*TM), profiled 16 ms/chunk) and no XLA
    # transpose to neighbor-major (profiled ~13 ms of copies).
    return jnp.sum(z2.reshape(TM, K, z2.shape[-1]), axis=1)


def _kernel(feat_ref, d_ref, w_ref,
            wf_ref, wsin_ref, wcos_ref, b1_ref,
            rest_w_refs, rest_b_refs, wa_ref, ba_ref,
            out_ref, *, K: int, nf: int, df: int, bf16: bool,
            n_rest: int):
    out_ref[...] = _block1_alpha_body(
        feat_ref, d_ref, w_ref, wf_ref, wsin_ref, wcos_ref, b1_ref,
        rest_w_refs, rest_b_refs, wa_ref, ba_ref,
        K=K, nf=nf, df=df, bf16=bf16, n_rest=n_rest)


def _kernel_color(feat_ref, d_ref, w_ref, vd_ref,
                  wf_ref, wsin_ref, wcos_ref, b1_ref,
                  rest_w_refs, rest_b_refs, wa_ref, ba_ref,
                  cwf_ref, cwsin_ref, cwcos_ref, cb0_ref,
                  crest_w_refs, crest_b_refs,
                  out_ref, *, K: int, nf: int, df: int, vf: int,
                  bf16: bool, n_rest: int, n_crest: int):
    """block1+alpha body, then the COLOR branch on the K-reduced features:
    [feat_agg | PE(viewdir)] -> color MLP (LeakyReLU between layers, raw
    logits out). Runs on TM rows (8x fewer than the per-neighbor stage, so
    it adds ~1 us/block) and shrinks the kernel output from (TM, C+1) to
    (TM, 4) — the (M,257) f32 HBM round-trip plus the XLA color stage's
    concat/relayout copies disappear (reference viewmlp color head,
    point_aggregators.py:743-780)."""
    red = _block1_alpha_body(
        feat_ref, d_ref, w_ref, wf_ref, wsin_ref, wcos_ref, b1_ref,
        rest_w_refs, rest_b_refs, wa_ref, ba_ref,
        K=K, nf=nf, df=df, bf16=bf16, n_rest=n_rest)
    C = red.shape[-1] - 1
    fa = red[:, :C]                            # (TM, C) weighted features
    alpha = red[:, C:]                         # (TM, 1)

    dot = _dot_mm(bf16)
    zv = _freq_major(vd_ref[...], vf)          # (TM, 3*vf) freq-major
    hc = (dot(fa, cwf_ref[...])
          + dot(jnp.sin(zv), cwsin_ref[...])
          + dot(jnp.cos(zv), cwcos_ref[...]) + cb0_ref[...])
    if n_crest > 0:                            # layer 0 is last when alone
        hc = jax.nn.leaky_relu(hc, negative_slope=0.01)
    for i in range(n_crest):
        hc = dot(hc, crest_w_refs[i][...]) + crest_b_refs[i][...]
        if i < n_crest - 1:                    # raw logits out (act_last=False)
            hc = jax.nn.leaky_relu(hc, negative_slope=0.01)
    out_ref[...] = jnp.concatenate([alpha, hc], axis=-1)   # (TM, 1+3)


def _kernel_color_march(feat_ref, d_ref, w_ref, vd_ref, dr_ref, rv_ref,
                        wf_ref, wsin_ref, wcos_ref, b1_ref,
                        rest_w_refs, rest_b_refs, wa_ref, ba_ref,
                        cwf_ref, cwsin_ref, cwcos_ref, cb0_ref,
                        crest_w_refs, crest_b_refs,
                        out_ref, *, K: int, nf: int, df: int, vf: int,
                        SR: int, bf16: bool, n_rest: int, n_crest: int):
    """The color-fused body, then the VOLUME MARCH in-kernel: sigmoid color
    (raw2out_color, act_super), opacity = 1-exp(-sigma*dist), exclusive
    transmission cumprod along each ray's SR slots (rows are ray-major with
    SR innermost, so a (TM,1)->(TM/SR,SR) reshape groups rays), radiance
    blend. Emits (TM/SR, 4) [ray_color | background_transmission] — the
    eval render's per-sample tensors never touch HBM (reference ray_march,
    diff_ray_marching.py:509; our ops/march.py ray_march)."""
    dot = _dot_mm(bf16)
    red = _block1_alpha_body(
        feat_ref, d_ref, w_ref, wf_ref, wsin_ref, wcos_ref, b1_ref,
        rest_w_refs, rest_b_refs, wa_ref, ba_ref,
        K=K, nf=nf, df=df, bf16=bf16, n_rest=n_rest)
    C = red.shape[-1] - 1
    fa = red[:, :C]
    alpha = red[:, C:]                         # (TM, 1) softplus'd sigma

    zv = _freq_major(vd_ref[...], vf)
    hc = (dot(fa, cwf_ref[...])
          + dot(jnp.sin(zv), cwsin_ref[...])
          + dot(jnp.cos(zv), cwcos_ref[...]) + cb0_ref[...])
    if n_crest > 0:
        hc = jax.nn.leaky_relu(hc, negative_slope=0.01)
    for i in range(n_crest):
        hc = dot(hc, crest_w_refs[i][...]) + crest_b_refs[i][...]
        if i < n_crest - 1:
            hc = jax.nn.leaky_relu(hc, negative_slope=0.01)
    # raw2out_color with act_super (models/aggregator.py raw2out_color)
    rgb = jax.nn.sigmoid(hc) * (1.0 + 2 * 0.001) - 0.001   # (TM, 3)

    sigma = alpha * rv_ref[...]                # (TM, 1)
    op = 1.0 - jnp.exp(-sigma * dr_ref[...])
    TM = op.shape[0]
    TMray = TM // SR
    a = (1.0 - op + 1e-10).reshape(TMray, SR)
    # exclusive cumprod along the SR lanes, sequential like jnp.cumprod
    cols = [jnp.ones((TMray, 1), jnp.float32)]
    for s in range(SR - 1):
        cols.append(cols[-1] * a[:, s:s + 1])
    T = jnp.concatenate(cols, axis=1)          # (TMray, SR) exclusive
    bgT = T[:, SR - 1:SR] * a[:, SR - 1:SR]    # full transmission
    ws = op.reshape(TMray, SR) * T             # alpha_blend weights
    color = jnp.sum(ws.reshape(TMray, SR, 1) * rgb.reshape(TMray, SR, 3),
                    axis=1)                    # (TMray, 3)
    out_ref[...] = jnp.concatenate([color, bgT], axis=-1)


def fused_block1_alpha_color_march(feat, d, w, vd, ray_dist, ray_valid,
                                   block1, alpha_branch, color_branch,
                                   *, K: int, nf: int, df: int, vf: int,
                                   SR: int, bf16: bool):
    """Eval-only fully-fused shading+march: returns (Mray, 4) [ray_color |
    background_transmission] for M = Mray*SR shading points (inputs as in
    fused_block1_alpha_color plus per-row ray_dist (M,) and ray_valid (M,)
    f32). Not differentiable (the eval render path never is)."""
    M, _, F = feat.shape
    Dd = d.shape[-1]
    C = block1[0]["w"].shape[1]
    assert M % SR == 0, (M, SR)

    # forward tile: ray-aligned (TM % SR == 0) AND with TM//SR a multiple
    # of 8 — Mosaic requires the output block's sublane dim (TM//SR rays)
    # be 8-divisible (caught by deviceless AOT compile; interpret missed it)
    base = SR * 8
    TM = base * max(1, 320 // base)
    pad = (-M) % TM
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
        ray_dist = jnp.pad(ray_dist, ((0, pad),))
        ray_valid = jnp.pad(ray_valid, ((0, pad),))
    Mp = M + pad

    feat2 = feat.reshape(Mp * K, F)
    d2 = d.reshape(Mp * K, Dd)
    w2 = w.reshape(Mp * K, 1)
    dr = ray_dist.reshape(Mp, 1).astype(jnp.float32)
    rv = ray_valid.reshape(Mp, 1).astype(jnp.float32)

    Wf, WsinF, WcosF, WsinD, WcosD = _permute_w1(block1[0]["w"], F, nf, Dd, df)
    Wsin = jnp.concatenate([WsinF, WsinD], axis=0)
    Wcos = jnp.concatenate([WcosF, WcosD], axis=0)
    b1 = block1[0]["b"].reshape(1, C)
    rest_w = tuple(l["w"] for l in block1[1:])
    rest_b = tuple(l["b"].reshape(1, C) for l in block1[1:])
    wa = alpha_branch[0]["w"].reshape(1, C)
    ba = alpha_branch[0]["b"].reshape(1, 1)
    Cc0 = color_branch[0]["w"].shape[1]
    CWf, CWsin, CWcos = _permute_wc(color_branch[0]["w"], C, 3, vf)
    cb0 = color_branch[0]["b"].reshape(1, Cc0)
    crest_w = tuple(l["w"] for l in color_branch[1:])
    crest_b = tuple(l["b"].reshape(1, -1) for l in color_branch[1:])
    n_rest, n_crest = len(rest_w), len(crest_w)
    grid = (Mp // TM,)

    def row_spec(cols, rows_per):
        return pl.BlockSpec((rows_per, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_color_march, K=K, nf=nf, df=df, vf=vf, SR=SR, bf16=bf16,
        n_rest=n_rest, n_crest=n_crest)

    def wrapped(f_r, d_r, w_r, vd_r, dr_r, rv_r, wf_r, wsin_r, wcos_r,
                b1_r, *rest):
        rw = rest[:n_rest]
        rb = rest[n_rest:2 * n_rest]
        wa_r, ba_r, cwf_r, cwsin_r, cwcos_r, cb0_r = \
            rest[2 * n_rest:2 * n_rest + 6]
        crw = rest[2 * n_rest + 6:2 * n_rest + 6 + n_crest]
        crb = rest[2 * n_rest + 6 + n_crest:2 * n_rest + 6 + 2 * n_crest]
        out_r = rest[-1]
        kernel(f_r, d_r, w_r, vd_r, dr_r, rv_r, wf_r, wsin_r, wcos_r, b1_r,
               rw, rb, wa_r, ba_r, cwf_r, cwsin_r, cwcos_r, cb0_r,
               crw, crb, out_r)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[row_spec(F, TM * K), row_spec(Dd, TM * K),
                  row_spec(1, TM * K), row_spec(3, TM),
                  row_spec(1, TM), row_spec(1, TM),
                  full(Wf), full(Wsin), full(Wcos), full(b1)]
        + [full(x) for x in rest_w] + [full(x) for x in rest_b]
        + [full(wa), full(ba),
           full(CWf), full(CWsin), full(CWcos), full(cb0)]
        + [full(x) for x in crest_w] + [full(x) for x in crest_b],
        out_specs=pl.BlockSpec((TM // SR, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp // SR, 4), jnp.float32),
        interpret=_interpret(),
    )(feat2, d2, w2, vd, dr, rv, Wf, Wsin, Wcos, b1, *rest_w, *rest_b,
      wa, ba, CWf, CWsin, CWcos, cb0, *crest_w, *crest_b)
    return out[:M // SR]


def _permute_wc(w0: jnp.ndarray, C: int, Dv: int, vf: int):
    """Split the color branch's first weight matrix — rows ordered for the
    reference's [feat_agg | PE(viewdir)] input, whose viewdir PE is
    channel-major [sin(c*vf+f) | cos(c*vf+f)] (ops/pe.py ori=True with the
    raw dirs split off, aggregator.py:348-350) — into (Wfeat, Wsin, Wcos)
    with PE rows permuted frequency-major to match `_freq_major`."""
    Wfeat = w0[:C]
    c = np.arange(Dv)[:, None]
    f = np.arange(vf)[None, :]
    rows = (C + c * vf + f).T.reshape(-1)      # freq-major: row[f*Dv+c]
    Wsin = w0[rows]
    Wcos = w0[rows + Dv * vf]
    return Wfeat, Wsin, Wcos


def _xla_ref(cfgt, feat, d, w, block1, alpha_branch):
    """Un-fused XLA statement of the same function (mirrors
    models/aggregator.py's block1/alpha/weight-sum math); used as the
    backward-pass recompute target of the custom_vjp."""
    K, nf, df, bf16 = cfgt
    from .pe import positional_encoding

    def mlp(layers, x, act_last=True):
        for i, l in enumerate(layers):
            if bf16:
                x = jnp.dot(x.astype(jnp.bfloat16),
                            l["w"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + l["b"]
            else:
                x = x @ l["w"] + l["b"]
            if act_last or i < len(layers) - 1:
                x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return x

    x = jnp.concatenate(
        [feat, positional_encoding(feat, nf), positional_encoding(d, df)],
        axis=-1)
    h = mlp(block1, x)
    raw = mlp(alpha_branch, h, act_last=False)
    alpha_nb = jax.nn.softplus(raw - 1.0)
    wk = w[..., None]
    return jnp.sum(h * wk, axis=-2), jnp.sum(alpha_nb * wk, axis=-2)


# Backward tile: the kernel holds ~3x the forward's live activations
# (recompute + grads), so it runs a smaller tile than the forward's 320.
# SGNERF_BWD_TM overrides for tile sweeps (dev_scripts/probe_train_fused.py);
# VMEM ceiling AOT-verified on v5e: 160 compiles, 192 OOMs. TPU sweep at
# 1024-ray steps: 64 -> 80.1 ms, 96 -> 79.9, 160 -> 77.9 (vs 86.0 un-fused)
# — 160, the ceiling, is the default.
_BWD_TM = int(os.environ.get("SGNERF_BWD_TM", "160"))


def _bwd_kernel(feat_ref, d_ref, w_ref, g_ref,
                wf_ref, wsin_ref, wcos_ref, b1_ref,
                rest_w_refs, rest_b_refs, wa_ref, ba_ref,
                wfT_ref, wsinT_ref, wcosT_ref, rest_wT_refs,
                dfeat_ref, dd_ref, dw_ref,
                dwf_ref, dwsin_ref, dwcos_ref, db1_ref,
                drw_refs, drb_refs, dwa_ref, dba_ref,
                *, K: int, nf: int, df: int, bf16: bool, n_rest: int):
    """Fused backward: recompute the tile's activations in VMEM (the same
    math as `_block1_alpha_body`), then backprop alpha head -> MLP stack ->
    PE in-register. Per-row input grads write to tile-indexed outputs; the
    weight grads accumulate across the sequential grid steps into revisited
    (constant-index) output blocks."""
    dot = _dot_mm(bf16)
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def dotT(a, b):   # (R, Ca) x (R, Cb) -> (Ca, Cb), contraction over rows
        return jax.lax.dot_general(a.astype(mm), b.astype(mm),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    TMK, F = feat_ref.shape
    TM = TMK // K
    Dd = d_ref.shape[-1]
    feat = feat_ref[...]
    d = d_ref[...]
    w = w_ref[...]

    # ---- forward recompute (bit-identical to _block1_alpha_body)
    pf = _freq_major(feat, nf)
    pd = _freq_major(d, df)
    z = jnp.concatenate([pf, pd], axis=-1)     # (TMK, Z)
    s, c = jnp.sin(z), jnp.cos(z)
    h = (dot(feat, wf_ref[...]) + dot(s, wsin_ref[...])
         + dot(c, wcos_ref[...]) + b1_ref[...])
    acts = [jax.nn.leaky_relu(h, negative_slope=0.01)]
    for i in range(n_rest):
        acts.append(jax.nn.leaky_relu(
            dot(acts[-1], rest_w_refs[i][...]) + rest_b_refs[i][...],
            negative_slope=0.01))
    a_last = acts[-1]
    raw = jnp.sum(a_last * wa_ref[...], axis=-1, keepdims=True) + ba_ref[...]
    alpha = jax.nn.softplus(raw - 1.0)

    # ---- backward
    C = a_last.shape[-1]
    g = g_ref[...]                              # (TM, C+1) [gF | gA]
    # broadcast the per-point cotangents over the K neighbor slots INSIDE
    # the arithmetic, in (TM, K, C) space — the reshape to/from row-major
    # is a layout no-op, while a materialized broadcast_to+reshape lowers
    # to a gather Mosaic rejects (caught by deviceless AOT compile)
    # lax.slice_in_dim + reshape: jnp's mixed basic/None indexing emits a
    # gather op Mosaic rejects (caught by deviceless AOT compile)
    gF3 = jax.lax.slice_in_dim(g, 0, C, axis=1).reshape(TM, 1, C)
    gA3 = jax.lax.slice_in_dim(g, C, C + 1, axis=1).reshape(TM, 1, 1)
    a3 = a_last.reshape(TM, K, C)
    w3 = w.reshape(TM, K, 1)

    # out rows were [a_last*w | alpha*w], K-reduced
    dw_rows = (jnp.sum(a3 * gF3, axis=-1, keepdims=True)
               + alpha.reshape(TM, K, 1) * gA3).reshape(TMK, 1)
    da = (gF3 * w3).reshape(TMK, C)
    dalpha = (gA3 * w3).reshape(TMK, 1)
    draw = dalpha * jax.nn.sigmoid(raw - 1.0)   # softplus'(x) = sigmoid(x)
    dwa_c = jnp.sum(a_last * draw, axis=0, keepdims=True)   # (1, C)
    dba_c = jnp.sum(draw, axis=0, keepdims=True)            # (1, 1)
    da = da + draw * wa_ref[...]

    drw_c, drb_c = [None] * n_rest, [None] * n_rest
    for i in reversed(range(n_rest)):
        # leaky_relu' via the activation's own sign (sign-preserving, and
        # jnp.where(x >= 0, ...) matches XLA's gradient at exactly 0)
        dh = jnp.where(acts[i + 1] >= 0, da, 0.01 * da)
        drw_c[i] = dotT(acts[i], dh)                        # (C, C)
        drb_c[i] = jnp.sum(dh, axis=0, keepdims=True)       # (1, C)
        da = dot(dh, rest_wT_refs[i][...])
    dh0 = jnp.where(acts[0] >= 0, da, 0.01 * da)
    dwf_c = dotT(feat, dh0)                                 # (F, C)
    dwsin_c = dotT(s, dh0)                                  # (Z, C)
    dwcos_c = dotT(c, dh0)
    db1_c = jnp.sum(dh0, axis=0, keepdims=True)

    # d/dz of sin/cos terms, then fold the frequency-major blocks back
    dz = dot(dh0, wsinT_ref[...]) * c - dot(dh0, wcosT_ref[...]) * s
    dfeat = dot(dh0, wfT_ref[...])
    Zf = F * nf
    for f in range(nf):
        dfeat = dfeat + dz[:, f * F:(f + 1) * F] * (2.0 ** f)
    dd_out = dz[:, Zf:Zf + Dd] if df > 0 else jnp.zeros_like(d)
    for f in range(1, df):
        dd_out = dd_out + dz[:, Zf + f * Dd:Zf + (f + 1) * Dd] * (2.0 ** f)

    dfeat_ref[...] = dfeat
    dd_ref[...] = dd_out
    dw_ref[...] = dw_rows

    first = pl.program_id(0) == 0
    for ref, val in ([(dwf_ref, dwf_c), (dwsin_ref, dwsin_c),
                      (dwcos_ref, dwcos_c), (db1_ref, db1_c),
                      (dwa_ref, dwa_c), (dba_ref, dba_c)]
                     + list(zip(drw_refs, drw_c))
                     + list(zip(drb_refs, drb_c))):
        @pl.when(first)
        def _(ref=ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        ref[...] += val


def _pallas_backward(cfgt, feat, d, w, block1, alpha_branch, g):
    """Fused backward of `_pallas_forward`'s function. `g` is the output
    cotangent pair (gF (M, C), gA (M, 1)). Returns tangents in the primal
    structures (block1 grads back in the reference row order)."""
    K, nf, df, bf16 = cfgt[:4]
    M, _, F = feat.shape
    Dd = d.shape[-1]
    C = block1[0]["w"].shape[1]
    g2 = jnp.concatenate([g[0], g[1]], axis=-1)            # (M, C+1)

    TM = _BWD_TM
    pad = (-M) % TM
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    Mp = M + pad

    feat2 = feat.reshape(Mp * K, F)
    d2 = d.reshape(Mp * K, Dd)
    w2 = w.reshape(Mp * K, 1)

    Wf, WsinF, WcosF, WsinD, WcosD = _permute_w1(block1[0]["w"], F, nf, Dd, df)
    Wsin = jnp.concatenate([WsinF, WsinD], axis=0)
    Wcos = jnp.concatenate([WcosF, WcosD], axis=0)
    b1 = block1[0]["b"].reshape(1, C)
    rest_w = tuple(l["w"] for l in block1[1:])
    rest_b = tuple(l["b"].reshape(1, C) for l in block1[1:])
    wa = alpha_branch[0]["w"].reshape(1, C)
    ba = alpha_branch[0]["b"].reshape(1, 1)
    n_rest = len(rest_w)
    Z = Wsin.shape[0]
    grid = (Mp // TM,)

    def row_spec(cols, rows_per=None):
        return pl.BlockSpec(((rows_per or TM * K), cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_bwd_kernel, K=K, nf=nf, df=df, bf16=bf16,
                               n_rest=n_rest)

    def wrapped(*refs):
        (f_r, d_r, w_r, g_r, wf_r, wsin_r, wcos_r, b1_r) = refs[:8]
        i = 8
        rw = refs[i:i + n_rest]; i += n_rest
        rb = refs[i:i + n_rest]; i += n_rest
        wa_r, ba_r, wfT_r, wsinT_r, wcosT_r = refs[i:i + 5]; i += 5
        rwT = refs[i:i + n_rest]; i += n_rest
        (dfeat_r, dd_r, dw_r, dwf_r, dwsin_r, dwcos_r,
         db1_r) = refs[i:i + 7]; i += 7
        drw = refs[i:i + n_rest]; i += n_rest
        drb = refs[i:i + n_rest]; i += n_rest
        dwa_r, dba_r = refs[i:]
        kernel(f_r, d_r, w_r, g_r, wf_r, wsin_r, wcos_r, b1_r, rw, rb,
               wa_r, ba_r, wfT_r, wsinT_r, wcosT_r, rwT,
               dfeat_r, dd_r, dw_r, dwf_r, dwsin_r, dwcos_r, db1_r,
               drw, drb, dwa_r, dba_r)

    out_shapes = (
        [jax.ShapeDtypeStruct((Mp * K, F), jnp.float32),
         jax.ShapeDtypeStruct((Mp * K, Dd), jnp.float32),
         jax.ShapeDtypeStruct((Mp * K, 1), jnp.float32),
         jax.ShapeDtypeStruct((F, C), jnp.float32),
         jax.ShapeDtypeStruct((Z, C), jnp.float32),
         jax.ShapeDtypeStruct((Z, C), jnp.float32),
         jax.ShapeDtypeStruct((1, C), jnp.float32)]
        + [jax.ShapeDtypeStruct((C, C), jnp.float32)] * n_rest
        + [jax.ShapeDtypeStruct((1, C), jnp.float32)] * n_rest
        + [jax.ShapeDtypeStruct((1, C), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)])
    out_specs = (
        [row_spec(F), row_spec(Dd), row_spec(1),
         full((F, C)), full((Z, C)), full((Z, C)), full((1, C))]
        + [full((C, C))] * n_rest + [full((1, C))] * n_rest
        + [full((1, C)), full((1, 1))])

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[row_spec(F), row_spec(Dd), row_spec(1),
                  row_spec(C + 1, rows_per=TM),
                  full(Wf.shape), full(Wsin.shape), full(Wcos.shape),
                  full(b1.shape)]
        + [full(x.shape) for x in rest_w] + [full(x.shape) for x in rest_b]
        + [full(wa.shape), full(ba.shape),
           full((C, F)), full((C, Z)), full((C, Z))]
        + [full((C, C))] * n_rest,
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        interpret=_interpret(),
    )(feat2, d2, w2, g2, Wf, Wsin, Wcos, b1, *rest_w, *rest_b, wa, ba,
      Wf.T, Wsin.T, Wcos.T, *(x.T for x in rest_w))

    dfeat = outs[0][:M * K].reshape(M, K, F)
    dd = outs[1][:M * K].reshape(M, K, Dd)
    dw = outs[2][:M * K].reshape(M, K)
    dW1 = _unpermute_dw1(outs[3], outs[4], outs[5], F, nf, Dd, df)
    dblock1 = [{"w": dW1, "b": outs[6].reshape(block1[0]["b"].shape)}]
    for i in range(n_rest):
        dblock1.append({"w": outs[7 + i],
                        "b": outs[7 + n_rest + i].reshape(
                            block1[1 + i]["b"].shape)})
    dwa = outs[7 + 2 * n_rest].reshape(alpha_branch[0]["w"].shape)
    dba = outs[8 + 2 * n_rest].reshape(alpha_branch[0]["b"].shape)
    return dfeat, dd, dw, dblock1, [{"w": dwa, "b": dba}]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfgt, feat, d, w, block1, alpha_branch):
    return _pallas_forward(cfgt[:4], feat, d, w, block1, alpha_branch)


def _fused_fwd(cfgt, feat, d, w, block1, alpha_branch):
    out = _pallas_forward(cfgt[:4], feat, d, w, block1, alpha_branch)
    return out, (feat, d, w, block1, alpha_branch)


def _fused_bwd(cfgt, res, g):
    if len(cfgt) > 4 and cfgt[4] == "pallas":
        return _pallas_backward(cfgt, *res, g)
    _, vjp = jax.vjp(lambda *a: _xla_ref(cfgt[:4], *a), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _xla_color_tail(cfgv, fa, vd, color_branch):
    """The color branch on the K-reduced features (reference viewmlp color
    head, point_aggregators.py:743-780): [fa | PE(viewdir)] -> MLP, raw
    logits out."""
    vf, bf16 = cfgv
    from .pe import positional_encoding
    pe = positional_encoding(vd, vf, ori=True)[..., 3:]
    x = jnp.concatenate([fa, pe], axis=-1)
    for i, l in enumerate(color_branch):
        if bf16:
            x = jnp.dot(x.astype(jnp.bfloat16), l["w"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + l["b"]
        else:
            x = x @ l["w"] + l["b"]
        if i < len(color_branch) - 1:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
    return x


def _xla_ref_color(cfgt2, feat, d, w, vd, block1, alpha_branch,
                   color_branch):
    """Un-fused statement of the color-fused kernel's function (mirrors
    aggregate()'s fused tail, aggregator.py:433-435); the backward-pass
    recompute target of `_fused_color`'s "xla" backward."""
    K, nf, df, vf, bf16 = cfgt2[:5]
    fa, al = _xla_ref((K, nf, df, bf16), feat, d, w, block1, alpha_branch)
    x = _xla_color_tail((vf, bf16), fa, vd, color_branch)
    return jnp.concatenate([al, x], axis=-1)   # (M, 4), matches the kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_color(cfgt2, feat, d, w, vd, block1, alpha_branch, color_branch):
    return _pallas_forward_color(cfgt2[:5], feat, d, w, vd, block1,
                                 alpha_branch, color_branch)


def _fused_color_fwd(cfgt2, feat, d, w, vd, block1, alpha_branch,
                     color_branch):
    out = _pallas_forward_color(cfgt2[:5], feat, d, w, vd, block1,
                                alpha_branch, color_branch)
    return out, (feat, d, w, vd, block1, alpha_branch, color_branch)


def _fused_color_bwd(cfgt2, res, g):
    K, nf, df, vf, bf16 = cfgt2[:5]
    if len(cfgt2) <= 5 or cfgt2[5] != "pallas":
        _, vjp = jax.vjp(lambda *a: _xla_ref_color(cfgt2[:5], *a), *res)
        return vjp(g)
    # pallas backward: re-run the (fast) fused forward for the reduced
    # features, differentiate the tiny M-row color tail in XLA, then run
    # the fused per-neighbor backward with the tail's feature cotangent
    feat, d, w, vd, block1, alpha_branch, color_branch = res
    fa, _ = _pallas_forward((K, nf, df, bf16), feat, d, w, block1,
                            alpha_branch)
    _, vjp = jax.vjp(
        lambda fa_, vd_, cb_: _xla_color_tail((vf, bf16), fa_, vd_, cb_),
        fa, vd, color_branch)
    dfa, dvd, dcb = vjp(g[:, 1:4])
    dfeat, dd, dw, dblock1, dalpha = _pallas_backward(
        (K, nf, df, bf16), feat, d, w, block1, alpha_branch,
        (dfa, g[:, 0:1]))
    return dfeat, dd, dw, dvd, dblock1, dalpha, dcb


_fused_color.defvjp(_fused_color_fwd, _fused_color_bwd)


@functools.partial(jax.jit,
                   static_argnames=("K", "nf", "df", "bf16", "bwd"))
def fused_block1_alpha(feat: jnp.ndarray,      # (M, K, F) f32
                       d: jnp.ndarray,         # (M, K, Dd)
                       w: jnp.ndarray,         # (M, K) weight*conf (0=masked)
                       block1: List[Dict[str, jnp.ndarray]],
                       alpha_branch: List[Dict[str, jnp.ndarray]],
                       *, K: int, nf: int, df: int, bf16: bool,
                       bwd: str = "xla"):
    """Returns (feat_agg (M, C), alpha (M, 1)). Requires a single-layer
    alpha head (shading_alpha_mlp_layer=1, the reference default).
    Differentiable; bwd picks the backward ("xla" recompute or the fused
    "pallas" kernel — module docstring)."""
    assert len(alpha_branch) == 1, "fused path needs a 1-layer alpha head"
    return _fused((K, nf, df, bf16, bwd), feat, d, w, block1, alpha_branch)


@functools.partial(jax.jit,
                   static_argnames=("K", "nf", "df", "vf", "bf16", "bwd"))
def fused_block1_alpha_color(feat: jnp.ndarray,  # (M, K, F) f32
                             d: jnp.ndarray,     # (M, K, Dd)
                             w: jnp.ndarray,     # (M, K) weight*conf (0=mask)
                             vd: jnp.ndarray,    # (M, 3) rotated viewdirs
                             block1: List[Dict[str, jnp.ndarray]],
                             alpha_branch: List[Dict[str, jnp.ndarray]],
                             color_branch: List[Dict[str, jnp.ndarray]],
                             *, K: int, nf: int, df: int, vf: int,
                             bf16: bool, bwd: str = "xla"):
    """Returns (alpha (M, 1), raw_color (M, 3) pre-raw2out logits). The
    color branch runs in-kernel on the K-reduced features, so the (M, C+1)
    intermediate never touches HBM. Requires a 1-layer alpha head and
    vf > 0. Differentiable; bwd as in fused_block1_alpha."""
    assert len(alpha_branch) == 1, "fused path needs a 1-layer alpha head"
    assert vf > 0, "fused color head needs PE'd viewdirs"
    out = _fused_color((K, nf, df, vf, bf16, bwd), feat, d, w, vd, block1,
                       alpha_branch, color_branch)
    return out[:, 0:1], out[:, 1:4]


def _pallas_forward_color(cfgt2, feat, d, w, vd, block1, alpha_branch,
                          color_branch):
    K, nf, df, vf, bf16 = cfgt2
    M, Kk, F = feat.shape
    Dd = d.shape[-1]
    C = block1[0]["w"].shape[1]

    TM = 320                                   # see _pallas_forward's sweep
    pad = (-M) % TM
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
    Mp = M + pad

    feat2 = feat.reshape(Mp * K, F)
    d2 = d.reshape(Mp * K, Dd)
    w2 = w.reshape(Mp * K, 1)

    Wf, WsinF, WcosF, WsinD, WcosD = _permute_w1(block1[0]["w"], F, nf, Dd, df)
    Wsin = jnp.concatenate([WsinF, WsinD], axis=0)
    Wcos = jnp.concatenate([WcosF, WcosD], axis=0)
    b1 = block1[0]["b"].reshape(1, C)
    rest_w = tuple(l["w"] for l in block1[1:])
    rest_b = tuple(l["b"].reshape(1, C) for l in block1[1:])
    wa = alpha_branch[0]["w"].reshape(1, C)
    ba = alpha_branch[0]["b"].reshape(1, 1)

    Cc0 = color_branch[0]["w"].shape[1]
    CWf, CWsin, CWcos = _permute_wc(color_branch[0]["w"], C, 3, vf)
    cb0 = color_branch[0]["b"].reshape(1, Cc0)
    crest_w = tuple(l["w"] for l in color_branch[1:])
    crest_b = tuple(l["b"].reshape(1, -1) for l in color_branch[1:])

    n_rest = len(rest_w)
    n_crest = len(crest_w)
    grid = (Mp // TM,)

    def row_spec(cols, rows_per=None):
        return pl.BlockSpec(((rows_per or TM * K), cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_color, K=K, nf=nf, df=df, vf=vf, bf16=bf16,
        n_rest=n_rest, n_crest=n_crest)

    def wrapped(f_r, d_r, w_r, vd_r, wf_r, wsin_r, wcos_r, b1_r, *rest):
        rw = rest[:n_rest]
        rb = rest[n_rest:2 * n_rest]
        wa_r, ba_r, cwf_r, cwsin_r, cwcos_r, cb0_r = \
            rest[2 * n_rest:2 * n_rest + 6]
        crw = rest[2 * n_rest + 6:2 * n_rest + 6 + n_crest]
        crb = rest[2 * n_rest + 6 + n_crest:2 * n_rest + 6 + 2 * n_crest]
        out_r = rest[-1]
        kernel(f_r, d_r, w_r, vd_r, wf_r, wsin_r, wcos_r, b1_r,
               rw, rb, wa_r, ba_r, cwf_r, cwsin_r, cwcos_r, cb0_r,
               crw, crb, out_r)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[row_spec(F), row_spec(Dd), row_spec(1),
                  row_spec(3, rows_per=TM),
                  full(Wf), full(Wsin), full(Wcos), full(b1)]
        + [full(x) for x in rest_w] + [full(x) for x in rest_b]
        + [full(wa), full(ba),
           full(CWf), full(CWsin), full(CWcos), full(cb0)]
        + [full(x) for x in crest_w] + [full(x) for x in crest_b],
        out_specs=pl.BlockSpec((TM, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 4), jnp.float32),
        interpret=_interpret(),
    )(feat2, d2, w2, vd, Wf, Wsin, Wcos, b1, *rest_w, *rest_b, wa, ba,
      CWf, CWsin, CWcos, cb0, *crest_w, *crest_b)
    return out[:M]


def _pallas_forward(cfgt, feat, d, w, block1, alpha_branch):
    K, nf, df, bf16 = cfgt
    M, Kk, F = feat.shape
    Dd = d.shape[-1]
    C = block1[0]["w"].shape[1]

    # tile-size sweep (bench, rays/s): 256 -> 79.9k, 320 -> 82.8k (+3.6%,
    # the kernel was invocation-overhead-bound), 352 -> 82.7k (saturated),
    # 512 -> scoped-VMEM OOM (22.4 MB vs the 16 MB limit, ~44 KB/row of
    # scratch). 320 keeps headroom for wider rows (semantic embedding)
    TM = 320
    pad = (-M) % TM
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
    Mp = M + pad

    # flat 2-D operands: leading-axis merges are free in XLA, and 2-D
    # (rows, cols) Pallas operands avoid the 3-D-operand relayout copies
    feat2 = feat.reshape(Mp * K, F)
    d2 = d.reshape(Mp * K, Dd)
    w2 = w.reshape(Mp * K, 1)

    Wf, WsinF, WcosF, WsinD, WcosD = _permute_w1(block1[0]["w"], F, nf, Dd, df)
    Wsin = jnp.concatenate([WsinF, WsinD], axis=0)   # rows match z=[pf|pd]
    Wcos = jnp.concatenate([WcosF, WcosD], axis=0)
    b1 = block1[0]["b"].reshape(1, C)
    rest_w = tuple(l["w"] for l in block1[1:])
    rest_b = tuple(l["b"].reshape(1, C) for l in block1[1:])
    wa = alpha_branch[0]["w"].reshape(1, C)     # (C,1) -> row
    ba = alpha_branch[0]["b"].reshape(1, 1)

    n_rest = len(rest_w)
    grid = (Mp // TM,)

    def row_spec(cols):
        return pl.BlockSpec((TM * K, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, K=K, nf=nf, df=df, bf16=bf16, n_rest=n_rest)

    def wrapped(f_r, d_r, w_r, wf_r, wsin_r, wcos_r, b1_r, *rest):
        rw_refs = rest[:n_rest]
        rb_refs = rest[n_rest:2 * n_rest]
        wa_r, ba_r, out_r = rest[2 * n_rest:]
        kernel(f_r, d_r, w_r, wf_r, wsin_r, wcos_r, b1_r,
               rw_refs, rb_refs, wa_r, ba_r, out_r)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[row_spec(F), row_spec(Dd), row_spec(1),
                  full(Wf), full(Wsin), full(Wcos), full(b1)]
        + [full(x) for x in rest_w] + [full(x) for x in rest_b]
        + [full(wa), full(ba)],
        out_specs=pl.BlockSpec((TM, C + 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C + 1), jnp.float32),
        interpret=_interpret(),
    )(feat2, d2, w2, Wf, Wsin, Wcos, b1, *rest_w, *rest_b, wa, ba)
    out = out[:M]
    return out[:, :C], out[:, C:C + 1]
