"""Training state and the jitted training step.

Functional re-design of `MvsPointsVolumetricModel`'s optimizer stack
(/root/reference/models/mvs_points_volumetric_model.py:47-141):
  * two Adam optimizers — shading MLPs at `lr`, per-point tensors at `plr` —
    with the `iter_exponential_decay` schedule
    (helpers/networks.py get_scheduler: factor = lr_decay_exp^(it/decay_iters));
  * per-tensor gradient switches (feat/conf/color/dir/xyz_grad,
    neural_points.py:410-420) become optax masks;
  * `alter_step` alternating stepping (:134-141) becomes a step-parity gate on
    the update.

The whole step — forward, losses, backward, both updates — is ONE jitted
function; under a device mesh the rays axis shards and gradients psum over ICI
(see parallel/).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .aggregator import AggregatorConfig
from .losses import compute_losses
from .point_cloud import NeuralPointCloud
from .renderer import RenderConfig, render_rays, render_rays_perspective
from ..ops.grid import PointGrid


POINT_FIELDS = ("embedding", "conf", "color", "dir", "xyz")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-4
    plr: float = 2e-3
    lr_policy: str = "iter_exponential_decay"
    lr_decay_iters: int = 1000000
    lr_decay_exp: float = 0.1
    niter: int = 100            # lr_policy=lambda: flat until niter...
    niter_decay: int = 100      # ...then linear to 0 over niter_decay
    alter_step: int = 0
    # per-tensor grad switches (reference flags feat_grad etc.)
    feat_grad: int = 1
    conf_grad: int = 1
    color_grad: int = 1
    dir_grad: int = 0
    xyz_grad: int = 0
    # loss config
    color_loss_items: Tuple[str, ...] = (
        "ray_masked_coarse_raycolor", "ray_miss_coarse_raycolor",
        "coarse_raycolor")
    color_loss_weights: Tuple[float, ...] = (1.0, 0.0, 0.0)
    zero_one_loss_items: Tuple[str, ...] = ("conf_coefficient",)
    zero_one_loss_weights: Tuple[float, ...] = (0.0001,)
    depth_loss_items: Tuple[str, ...] = ()
    depth_loss_weights: Tuple[float, ...] = ()
    bg_loss_items: Tuple[str, ...] = ()
    bg_loss_weights: Tuple[float, ...] = ()
    l2_size_loss_items: Tuple[str, ...] = ()
    l2_size_loss_weights: Tuple[float, ...] = ()
    sparse_loss_weight: float = 0.0
    zero_epsilon: float = 1e-3

    def grad_switch(self, field: str) -> bool:
        return bool({
            "embedding": self.feat_grad, "conf": self.conf_grad,
            "color": self.color_grad, "dir": self.dir_grad,
            "xyz": self.xyz_grad}[field])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]          # shading MLP params
    cloud: NeuralPointCloud
    opt_state_net: Any
    opt_state_pts: Any
    step: jnp.ndarray               # () int32


def _schedule(tcfg: TrainConfig, base_lr: float):
    """LR schedules (reference helpers/networks.py:41-66). Implemented:
    iter_exponential_decay (every shipped config), lambda (linear decay
    from niter over niter_decay), step (x0.1 every lr_decay_iters).
    'plateau' is loss-driven torch state with no shipped user — falls
    through to constant; 'cosine_annealing' crashes in the reference
    itself (reads an undefined `self.args`, networks.py:64)."""
    if tcfg.lr_policy == "iter_exponential_decay":
        def fn(count):
            return base_lr * tcfg.lr_decay_exp ** (
                count / tcfg.lr_decay_iters)
        return fn
    if tcfg.lr_policy == "lambda":
        def fn(count):
            frac = 1.0 - jnp.maximum(0.0, count - tcfg.niter) \
                / float(tcfg.niter_decay + 1)
            return base_lr * frac
        return fn
    if tcfg.lr_policy == "step":
        def fn(count):
            return base_lr * 0.1 ** (count // tcfg.lr_decay_iters)
        return fn
    return lambda count: base_lr


def make_optimizers(tcfg: TrainConfig):
    """Returns (net_tx, pts_tx). pts_tx is masked per grad switches."""
    net_tx = optax.adam(_schedule(tcfg, tcfg.lr), b1=0.9, b2=0.999)

    labels = {f: ("train" if tcfg.grad_switch(f) else "freeze")
              for f in POINT_FIELDS}
    pts_tx = optax.multi_transform(
        {"train": optax.adam(_schedule(tcfg, tcfg.plr), b1=0.9, b2=0.999),
         "freeze": optax.set_to_zero()},
        labels)
    return net_tx, pts_tx


def _point_subtree(cloud: NeuralPointCloud) -> Dict[str, jnp.ndarray]:
    return {"embedding": cloud.embedding, "conf": cloud.conf,
            "color": cloud.color, "dir": cloud.dir, "xyz": cloud.xyz}


def _with_points(cloud: NeuralPointCloud, pts: Dict[str, jnp.ndarray]):
    return dataclasses.replace(cloud, **pts)


def create_train_state(params, cloud, tcfg: TrainConfig) -> TrainState:
    net_tx, pts_tx = make_optimizers(tcfg)
    return TrainState(
        params=params,
        cloud=cloud,
        opt_state_net=net_tx.init(params),
        opt_state_pts=pts_tx.init(_point_subtree(cloud)),
        step=jnp.asarray(0, jnp.int32),
    )


def _train_step_impl(state: TrainState, grid: PointGrid, cfg: RenderConfig,
                     tcfg: TrainConfig, batch: Dict[str, jnp.ndarray],
                     key: jax.Array, pspec=None, ray_mesh=None):
    net_tx, pts_tx = make_optimizers(tcfg)

    noise = None
    if ray_mesh is not None:
        # ray-DP (--ray_shards): the render runs inside shard_map (the
        # Pallas kernels cannot be GSPMD-partitioned), so per-ray
        # randomness must be drawn OUT HERE at global shape — sharded like
        # the rays — to keep sharded == unsharded training bit-identical
        # (parallel/sharded.py, renderer.draw_render_noise).
        from ..models.renderer import draw_render_noise
        B, R, _ = batch["raydir"].shape
        use_sem = (bool(cfg.semantic_guidance) and pspec is None
                   and batch.get("pixel_label") is not None)
        noise = draw_render_noise(key, cfg, B, R, grid=grid,
                                  guidance=use_sem,
                                  perspective=pspec is not None,
                                  is_train=True,
                                  dtype=batch["raydir"].dtype)

    def loss_fn(params, pts):
        # frozen fields get stop_gradient BEFORE the forward so XLA never
        # builds their backward transposes (the xyz path alone would add a
        # scatter-heavy gradient through every neighbor gather)
        pts = {k: (v if tcfg.grad_switch(k) else jax.lax.stop_gradient(v))
               for k, v in pts.items()}
        cloud = _with_points(state.cloud, pts)
        if ray_mesh is not None:
            from ..parallel.sharded import render_rays_sharded
            out = render_rays_sharded(
                params, cloud, grid, cfg, ray_mesh,
                campos=batch["campos"], raydir=batch["raydir"],
                camrotc2w=batch["camrotc2w"], near=batch["near"],
                far=batch["far"], bg_color=batch.get("bg_color"),
                pixel_label=(None if pspec is not None
                             else batch.get("pixel_label")),
                noise=noise, pspec=pspec, is_train=True)
        elif pspec is not None:
            # wcoord_query=0: Point-NeRF's per-frame perspective-space query
            # (reference query_point_indices.py via neural_points.py:426).
            # No semantic guidance here — the reference only added it to
            # the world-coords querier.
            out = render_rays_perspective(
                params, cloud, pspec, cfg,
                campos=batch["campos"], raydir=batch["raydir"],
                camrotc2w=batch["camrotc2w"], near=batch["near"],
                far=batch["far"], bg_color=batch.get("bg_color"),
                key=key, is_train=True)
        else:
            out = render_rays(
                params, cloud, grid, cfg,
                campos=batch["campos"], raydir=batch["raydir"],
                camrotc2w=batch["camrotc2w"], near=batch["near"],
                far=batch["far"], bg_color=batch.get("bg_color"),
                pixel_label=batch.get("pixel_label"), key=key, is_train=True)
        if "bg_ray" in batch:
            # --bgmodel plane (reference fill_invalid,
            # neural_points_volumetric_model.py:175-177): the per-ray plane
            # background replaces the constant one through the background
            # transmission — exact for the shipped black-bg plane configs
            # (models/background.py)
            bgc = batch.get("bg_color")
            bgc = jnp.zeros((3,)) if bgc is None else jnp.asarray(bgc)
            out = dict(out, coarse_raycolor=(
                out["coarse_raycolor"]
                + out["coarse_is_background"] * (batch["bg_ray"] - bgc)))
        if "ray_depth_mask" in batch:
            # per-ray valid-depth mask (reference builds it from the full
            # gt depth image + pixel_idx; the dataset batcher here samples
            # per ray already, mvs_points_volumetric_model.py:152)
            out["ray_depth_mask"] = batch["ray_depth_mask"]
        total, losses = compute_losses(
            out, batch["gt_image"],
            color_loss_items=tcfg.color_loss_items,
            color_loss_weights=tcfg.color_loss_weights,
            zero_one_loss_items=tcfg.zero_one_loss_items,
            zero_one_loss_weights=tcfg.zero_one_loss_weights,
            depth_loss_items=tcfg.depth_loss_items,
            depth_loss_weights=tcfg.depth_loss_weights,
            bg_loss_items=tcfg.bg_loss_items,
            bg_loss_weights=tcfg.bg_loss_weights,
            l2_size_loss_items=tcfg.l2_size_loss_items,
            l2_size_loss_weights=tcfg.l2_size_loss_weights,
            gt_depth=batch.get("gt_depth"),
            gt_mask=batch.get("gt_mask"),
            sparse_loss_weight=tcfg.sparse_loss_weight,
            zero_epsilon=tcfg.zero_epsilon)
        if "gvjp_overflow" in out:
            # gather_vjp=raydedup drops gradient rows past gvjp_U distinct
            # ids per tile; the forward-side count rides the losses dict so
            # the training loop's periodic prints expose a lossy config
            # (keep it 0 — see renderer.make_gather_rows_dedup)
            losses = dict(losses, gvjp_overflow=jax.lax.stop_gradient(
                out["gvjp_overflow"]).astype(jnp.float32))
        return total, losses

    pts = _point_subtree(state.cloud)
    (_, losses), (g_net, g_pts) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, pts)

    # alter_step gating (reference :134-141): phase 0 steps the MLPs,
    # phase 1 the point tensors; alter_step == 0 steps both every iter.
    if tcfg.alter_step > 0:
        phase = (state.step // tcfg.alter_step) % 3
        net_scale = (phase == 0).astype(jnp.float32)
        pts_scale = (phase == 1).astype(jnp.float32)
    else:
        net_scale = pts_scale = jnp.asarray(1.0)

    up_net, os_net = net_tx.update(g_net, state.opt_state_net, state.params)
    up_net = jax.tree.map(lambda u: u * net_scale, up_net)
    params = optax.apply_updates(state.params, up_net)

    up_pts, os_pts = pts_tx.update(g_pts, state.opt_state_pts, pts)
    up_pts = jax.tree.map(lambda u: u * pts_scale, up_pts)
    pts = optax.apply_updates(pts, up_pts)

    new_state = TrainState(
        params=params,
        cloud=_with_points(state.cloud, pts),
        opt_state_net=os_net,
        opt_state_pts=os_pts,
        step=state.step + 1,
    )
    return new_state, losses


@partial(jax.jit, static_argnames=("cfg", "tcfg", "pspec", "ray_mesh"),
         donate_argnums=(0,))
def train_step(state: TrainState, grid: PointGrid, cfg: RenderConfig,
               tcfg: TrainConfig, batch: Dict[str, jnp.ndarray],
               key: jax.Array, pspec=None, ray_mesh=None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step.

    batch: campos (B,3), raydir (B,R,3), camrotc2w (B,3,3), gt_image (B,R,3),
    near/far scalars, bg_color (3,), optional pixel_label (B,R).
    pspec: static perspective-frustum GridSpec — routes the forward through
    the wcoord_query=0 querier (grid is then unused and pruned by jit).
    ray_mesh: static Mesh — runs the render forward inside shard_map with
    rays sharded over the mesh ("data" axis; parallel/sharded.py).
    """
    return _train_step_impl(state, grid, cfg, tcfg, batch, key, pspec=pspec,
                            ray_mesh=ray_mesh)


@partial(jax.jit, static_argnames=("cfg", "tcfg", "pspec", "ray_mesh"),
         donate_argnums=(0,))
def train_step_multi(state: TrainState, grid: PointGrid, cfg: RenderConfig,
                     tcfg: TrainConfig, batches: Dict[str, jnp.ndarray],
                     keys: jax.Array, pspec=None, ray_mesh=None):
    """G optimization steps in ONE dispatch (lax.scan over stacked
    batches). ~27 ms of every dispatch is host-side enqueue through the
    remote tunnel that pipelining does not hide (PERFORMANCE.md); at
    66-93 ms/step that is a ~30% tax which batching amortizes G-fold.
    Semantics are EXACTLY G sequential train_step calls (asserted in
    tests/test_train.py).

    batches: every leaf of the per-step batch stacked on a leading G axis;
    keys: (G,) PRNG keys. Returns (state, losses with leading G axis).
    """
    def body(st, xs):
        batch, key = xs
        st, losses = _train_step_impl(st, grid, cfg, tcfg, batch, key,
                                      pspec=pspec, ray_mesh=ray_mesh)
        return st, losses
    return jax.lax.scan(body, state, (batches, keys))
