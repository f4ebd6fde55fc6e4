"""A/B the fused Pallas aggregator kernel vs the XLA path at bench scale.

Isolated stage: per-neighbor PE -> block1 -> alpha -> weighted K-sum at
M = 9216*24 shading points, K=8, F=32 (the canonical chunk). Varies inputs
per iteration, syncs via scalar reduction (CLAUDE.md timing rules).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    from sgnerf_tpu.runtime.jax_setup import setup
    setup()
    import jax.numpy as jnp
    from sgnerf_tpu.models.aggregator import (
        AggregatorConfig, init_aggregator_params, _mlp_apply,
        raw2out_density)
    from sgnerf_tpu.ops.pe import positional_encoding
    from sgnerf_tpu.ops.fused_agg import fused_block1_alpha

    M, K, F, Dd = 9216 * 24, 8, 32, 6
    cfg_f32 = AggregatorConfig()
    cfg_bf16 = AggregatorConfig(compute_dtype="bfloat16")
    params = init_aggregator_params(jax.random.key(0), cfg_f32)

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(M, K, F)).astype(np.float32) * 0.2)
             for _ in range(3)]
    d = jnp.asarray(rng.normal(size=(M, K, Dd)).astype(np.float32) * 0.01)
    w = jnp.asarray((rng.random((M, K)) < 0.36).astype(np.float32)
                    * rng.random((M, K)).astype(np.float32))

    def xla_path(cfg):
        def f(params, feat, d, w):
            x = jnp.concatenate(
                [feat, positional_encoding(feat, cfg.num_feat_freqs),
                 positional_encoding(d, abs(cfg.dist_xyz_freq))], axis=-1)
            h = _mlp_apply(cfg, params["block1"], x)
            raw = _mlp_apply(cfg, params["alpha_branch"], h, act_last=False)
            alpha = raw2out_density(cfg, raw) * w[..., None]
            fa = jnp.sum(h * w[..., None], axis=-2)
            return jnp.sum(fa) + jnp.sum(jnp.sum(alpha, axis=-2))
        return jax.jit(f)

    def fused_path(cfg):
        def f(params, feat, d, w):
            fa, al = fused_block1_alpha(
                feat, d, w, params["block1"], params["alpha_branch"],
                K=K, nf=cfg.num_feat_freqs, df=abs(cfg.dist_xyz_freq),
                bf16=(cfg.compute_dtype == "bfloat16"))
            return jnp.sum(fa) + jnp.sum(al)
        return jax.jit(f)

    for name, mk, cfg in [("xla_f32", xla_path, cfg_f32),
                          ("xla_bf16", xla_path, cfg_bf16),
                          ("fused_f32", fused_path, cfg_f32),
                          ("fused_bf16", fused_path, cfg_bf16)]:
        fn = mk(cfg)
        t0 = time.perf_counter()
        v0 = float(fn(params, feats[0], d, w))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s val={v0:.4f}")
        iters = 10
        t0 = time.perf_counter()
        res = [fn(params, feats[i % 3], d, w) for i in range(iters)]
        vals = [float(r) for r in res]
        dt = (time.perf_counter() - t0) / iters * 1000
        assert len(set(vals)) > 1
        print(f"{name}: {dt:.1f} ms/iter (pipelined)")


if __name__ == "__main__":
    main()
