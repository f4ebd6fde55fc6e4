"""Compiled-HLO collective census for the ray-DP sharding claims.

The multi-chip story (PERFORMANCE.md, SURVEY.md §2.6) rests on structural
facts this test pins at the compiler level — against the reference's
nn.DataParallel scatter/gather (neural_points_volumetric_model.py:238-245),
replaced here by shard_map over the ray axis (parallel/sharded.py):

1. The sharded FORWARD render has ZERO cross-device collectives — rays are
   embarrassingly parallel and each device runs the complete single-chip
   program on its ray block, so per-chip throughput scales linearly with
   chips. (GSPMD sharding propagation could not guarantee this: the CPU
   partitioner all-gathers at `top_k`, and the Mosaic kernels cannot be
   GSPMD-partitioned at all — the sharded fused render refuses to compile
   on real multi-chip TPU, dev_scripts/probe_raydp_aot.py. shard_map makes
   the property hold by construction on every backend; this census catches
   any regression that reintroduces sharding-propagation renders.)

2. The sharded TRAIN step's only collectives are all-reduces: the psums
   shard_map's transpose inserts for the replicated params/point-attribute
   gradients, plus the small loss reductions — no all-gather /
   collective-permute / all-to-all / reduce-scatter, i.e. pure data
   parallelism with gradient summation over ICI.
"""
import re

import jax

from sgnerf_tpu.models.train import TrainConfig, create_train_state, train_step
from sgnerf_tpu.parallel import make_mesh, shard_batch
from sgnerf_tpu.parallel.sharded import render_rays_sharded, replicate_tree

from test_parallel import _scene, _batch

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "all-to-all", "reduce-scatter", "collective-broadcast")


def _census(hlo_text: str):
    return {c: len(re.findall(c, hlo_text)) for c in _COLLECTIVES}


def test_sharded_forward_render_has_no_collectives():
    cloud, grid, cfg, params = _scene()
    mesh = make_mesh(8)
    batch = shard_batch(_batch(R=64), mesh)
    params_r = replicate_tree(params, mesh)
    cloud_r = replicate_tree(cloud, mesh)
    grid_r = replicate_tree(grid, mesh)

    def fwd(params, cloud, grid, campos, raydir, camrotc2w, near, far, bg):
        return render_rays_sharded(
            params, cloud, grid, cfg, mesh, campos=campos, raydir=raydir,
            camrotc2w=camrotc2w, near=near, far=far, bg_color=bg)

    txt = jax.jit(fwd).lower(
        params_r, cloud_r, grid_r, batch["campos"], batch["raydir"],
        batch["camrotc2w"], batch["near"], batch["far"],
        batch["bg_color"]).compile().as_text()
    assert re.search(r"num_partitions\s*=\s*8", txt[:2000]), \
        "render did not compile as an 8-way partitioned program"
    found = _census(txt)
    assert not any(found.values()), \
        f"ray-DP forward render must be collective-free, found {found}"


def test_sharded_train_step_collectives_are_gradient_psums_only():
    cloud, grid, cfg, params = _scene()
    mesh = make_mesh(8)
    batch = shard_batch(_batch(R=64), mesh)
    tcfg = TrainConfig()
    state = replicate_tree(create_train_state(params, cloud, tcfg), mesh)
    grid_r = replicate_tree(grid, mesh)
    key = jax.random.key(7)

    txt = jax.jit(
        lambda s, g, b, k: train_step(s, g, cfg, tcfg, b, k,
                                      ray_mesh=mesh)).lower(
            state, grid_r, batch, key).compile().as_text()
    found = _census(txt)
    assert found["all-reduce"] > 0, \
        "sharded train step lost its gradient all-reduce"
    others = {c: n for c, n in found.items()
              if n and c not in ("all-reduce",)}
    assert not others, \
        f"train step should be pure DP (psum only), found {others}"
