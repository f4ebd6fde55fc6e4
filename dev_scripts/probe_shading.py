"""Sub-split of the shading stage (aggregate + ray_march) at bench shapes.

Stage-4 marginal is 58 ms/chunk (probe_render_stages) while its matmul FLOPs
(~0.5 TFLOP f32) explain only ~10-15 ms -> suspect HBM traffic of the
PE-expanded per-neighbor intermediates ((1.77M, 290) f32 = 2 GB each).
Feeds synthetic gathered tensors (no query) and times cumulative prefixes;
also times the full aggregate in bf16 compute.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params, aggregate, compute_dists,
    _dist_weights, _mlp_apply)
from sgnerf_tpu.ops.pe import positional_encoding  # noqa: E402
from sgnerf_tpu.ops.march import ray_march, ray_dist_from_z  # noqa: E402
from sgnerf_tpu.ops.march import find_render_function, find_blend_function  # noqa: E402

B, R, SR, K, F = 1, 9216, 24, 8, 32


def bench(fn, args_list, iters=10, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:6.2f} ms (incl ~27 ms dispatch)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    cfg = AggregatorConfig()
    params = init_aggregator_params(jax.random.key(0), cfg)

    def mk(i):
        r = np.random.default_rng(i)
        return {
            "sampled_embedding": jnp.asarray(
                r.normal(size=(B, R, SR, K, F)).astype(np.float32) * 0.1),
            "sampled_color": jnp.asarray(
                r.uniform(size=(B, R, SR, K, 3)).astype(np.float32)),
            "sampled_dir": jnp.asarray(
                r.normal(size=(B, R, SR, K, 3)).astype(np.float32)),
            "sampled_conf": jnp.asarray(
                r.uniform(size=(B, R, SR, K, 1)).astype(np.float32)),
            "sampled_xyz": jnp.asarray(
                r.normal(size=(B, R, SR, K, 3)).astype(np.float32)),
            "sampled_xyz_pers": jnp.asarray(
                r.normal(size=(B, R, SR, K, 3)).astype(np.float32)),
            "sample_pnt_mask": jnp.asarray(
                r.uniform(size=(B, R, SR, K)) > 0.3),
            "sample_loc": jnp.asarray(
                r.normal(size=(B, R, SR, 3)).astype(np.float32)),
            "sample_loc_w": jnp.asarray(
                r.normal(size=(B, R, SR, 3)).astype(np.float32)),
            "sample_ray_dirs": jnp.asarray(
                r.normal(size=(B, R, SR, 3)).astype(np.float32)),
        }
    inputs = [mk(i) for i in range(4)]

    @jax.jit
    def s_w(inp):
        d = compute_dists(cfg, inp["sampled_xyz"], inp["sampled_xyz_pers"],
                          inp["sample_loc"], inp["sample_loc_w"])
        w = _dist_weights(cfg, d, inp["sample_pnt_mask"])
        return jnp.sum(w)

    @jax.jit
    def s_pe(inp):
        d = compute_dists(cfg, inp["sampled_xyz"], inp["sampled_xyz_pers"],
                          inp["sample_loc"], inp["sample_loc_w"])
        w = _dist_weights(cfg, d, inp["sample_pnt_mask"])
        d = d / float(cfg.dist_xyz_deno * np.linalg.norm([0.008] * 3))
        d = positional_encoding(d, abs(cfg.dist_xyz_freq))
        feat = inp["sampled_embedding"]
        feat = jnp.concatenate(
            [feat, positional_encoding(feat, cfg.num_feat_freqs), d], axis=-1)
        return jnp.sum(feat) + jnp.sum(w)

    @jax.jit
    def s_block1(inp):
        d = compute_dists(cfg, inp["sampled_xyz"], inp["sampled_xyz_pers"],
                          inp["sample_loc"], inp["sample_loc_w"])
        w = _dist_weights(cfg, d, inp["sample_pnt_mask"])
        d = d / float(cfg.dist_xyz_deno * np.linalg.norm([0.008] * 3))
        d = positional_encoding(d, abs(cfg.dist_xyz_freq))
        feat = inp["sampled_embedding"]
        feat = jnp.concatenate(
            [feat, positional_encoding(feat, cfg.num_feat_freqs), d], axis=-1)
        feat = _mlp_apply(cfg, params["block1"], feat)
        return jnp.sum(feat) + jnp.sum(w)

    def full(inp, c):
        dec, rv, w, cc = aggregate(
            params, c,
            sampled_label_embedding=None, Rw2c=None, vsize=(0.008,) * 3,
            **inp)
        return dec, rv

    @jax.jit
    def s_agg(inp):
        dec, rv = full(inp, cfg)
        return jnp.sum(dec)

    @jax.jit
    def s_march(inp):
        dec, rv = full(inp, cfg)
        rd = ray_dist_from_z(inp["sample_loc"][..., 2], rv, 0.008, 1)
        out = ray_march(rd, rv, dec, find_render_function("radiance"),
                        find_blend_function("alpha"), jnp.ones(3))
        return jnp.sum(out[0])

    cfg_bf = AggregatorConfig(compute_dtype="bfloat16")
    params_bf = params

    @jax.jit
    def s_march_bf(inp):
        dec, rv = full(inp, cfg_bf)
        rd = ray_dist_from_z(inp["sample_loc"][..., 2], rv, 0.008, 1)
        out = ray_march(rd, rv, dec, find_render_function("radiance"),
                        find_blend_function("alpha"), jnp.ones(3))
        return jnp.sum(out[0])

    bench(s_w, [(i,) for i in inputs], tag="dists+weights")
    bench(s_pe, [(i,) for i in inputs], tag="+PE assembly (290ch)")
    bench(s_block1, [(i,) for i in inputs], tag="+block1 (2x256 MLP)")
    bench(s_agg, [(i,) for i in inputs], tag="+alpha/color = aggregate")
    bench(s_march, [(i,) for i in inputs], tag="+march (full stage)")
    bench(s_march_bf, [(i,) for i in inputs], tag="full stage, bf16 compute")


if __name__ == "__main__":
    main()
