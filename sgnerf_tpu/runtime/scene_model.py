"""SceneModel: orchestration of point cloud, grid, params, training state,
checkpoints and full-image rendering.

The functional equivalent of the reference's `create_model(opt)` +
`MvsPointsVolumetricModel` object graph (/root/reference/models/
mvs_points_volumetric_model.py, run/train_ft.py bootstrap :588-805):
  * checkpoint resume ({iter}_net_ray_marching.{npz,pth}, resume_iter
    latest|best|N — run/train_ft.py:552-586);
  * point-cloud bootstrap from dataset init points with voxel downsampling
    (construct_vox_points_closest) and per-point attribute initialization;
  * chunked full-frame rendering (test_ft's 48^2-ray chunks, run/test_ft.py);
  * in-process prune/grow with grid rebuild (replaces the grow-save-exit
    restart loop).
"""
from __future__ import annotations

import dataclasses
import glob
import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.aggregator import init_aggregator_params
from ..models.checkpoint_io import (convert_reference_checkpoint, load_native,
                                    load_torch_state_dict, save_native,
                                    export_reference_checkpoint)
from ..models.point_cloud import (NeuralPointCloud, build_grid,
                                  grid_spec_for_cloud, make_point_cloud,
                                  prune as prune_cloud, grow as grow_cloud)
from ..models.renderer import render_rays
from ..models.train import (TrainConfig, TrainState, create_train_state,
                            train_step, train_step_multi, _point_subtree,
                            _with_points)
from ..options.options import configs_from_opt
from ..ops.scatter import construct_vox_points_closest


def _render_chunk_group(params, cloud, grid, cfg, campos, raydirs,
                        rot, near, far, bg, pspec=None, ray_mesh=None):
    """Render (G,B,Rc,3) ray-dir chunks in ONE dispatch: lax.map over the
    G axis, with each body rendering B chunks stacked on the renderer's
    batch axis (campos/rot are (B,...)). B=1 is the classic chunk loop;
    B>1 (--chunk_stack) batches the per-chunk gathers/top_k into single
    ops, amortizing their per-op floors (probe_bstack_render.py A/B).
    pspec (static) routes through the perspective querier (wcoord_query=0).
    ray_mesh (static): --ray_shards — the whole dispatch runs inside
    shard_map with the chunk-ray axis (axis 2) sharded over the mesh: each
    device renders its contiguous ray block with the full single-chip
    program. Mosaic kernels cannot be GSPMD-partitioned (the sharded fused
    render refuses to compile on real multi-chip, probe_raydp_aot.py), and
    inside shard_map the forward is collective-free by construction
    (parallel/sharded.py, tests/test_scaling_proof.py)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("cfg", "pspec", "ray_mesh"))
    def go(params, cloud, grid, cfg, campos, raydirs, rot, near, far, bg,
           pspec, ray_mesh):
        def body(params, cloud, grid, campos, raydirs, rot, near, far, bg):
            def one(rd):
                if pspec is not None:
                    from ..models.renderer import render_rays_perspective
                    out = render_rays_perspective(
                        params, cloud, pspec, cfg, campos=campos, raydir=rd,
                        camrotc2w=rot, near=near, far=far, bg_color=bg,
                        is_train=False)
                else:
                    out = render_rays(params, cloud, grid, cfg,
                                      campos=campos, raydir=rd,
                                      camrotc2w=rot, near=near,
                                      far=far, bg_color=bg, is_train=False)
                return (out["coarse_raycolor"],        # (B, Rc, 3)
                        out["coarse_is_background"],   # (B, Rc, 1) — bgT,
                        #   lets the caller swap the constant background for
                        #   a per-ray one (--bgmodel plane) w/o re-rendering
                        out.get("attr_dedup_overflow", jnp.asarray(0)))
            cols, bgt, over = jax.lax.map(one, raydirs)
            if ray_mesh is not None:
                # per-chunk overflow counts sum across the ray shards so
                # the exact-overflow re-render triggers on any shard
                over = jax.lax.psum(over, "data")
            return cols, bgt, over                     # over: (G,) per-chunk
        if ray_mesh is None:
            return body(params, cloud, grid, campos, raydirs, rot, near,
                        far, bg)
        from jax.sharding import PartitionSpec as P
        from ..parallel.sharded import shard_map
        ray = P(None, None, "data")
        rep = P()
        # check_vma=False: Mosaic out_shape structs carry no vma annotation
        # (see parallel/sharded.py render_rays_sharded)
        return shard_map(
            body, mesh=ray_mesh,
            in_specs=(rep, rep, rep, rep, ray, rep, rep, rep, rep),
            out_specs=(ray, ray, rep), check_vma=False)(
            params, cloud, grid, campos, raydirs, rot, near, far, bg)

    return go(params, cloud, grid, cfg, campos, raydirs, rot, near, far, bg,
              pspec, ray_mesh)


def get_latest_epoch(ckpt_dir: str) -> Optional[int]:
    iters = []
    for f in glob.glob(os.path.join(ckpt_dir, "*_net_ray_marching.*")):
        m = re.match(r"(\d+)_net_ray_marching", os.path.basename(f))
        if m:
            iters.append(int(m.group(1)))
    return max(iters) if iters else None


def nearest_view(campos: np.ndarray, camdir: np.ndarray,
                 xyz: np.ndarray) -> np.ndarray:
    """Assign each point the camera that sees it most head-on
    (reference run/train_ft.py nearest_view)."""
    out = np.zeros(len(xyz), np.int64)
    chunk = 200_000
    for s in range(0, len(xyz), chunk):
        pts = xyz[s:s + chunk]
        diff = pts[:, None, :] - campos[None, :, :]          # (n, V, 3)
        dist = np.linalg.norm(diff, axis=-1) + 1e-6
        cos = np.sum(diff / dist[..., None] * camdir[None], axis=-1)
        score = cos / np.sqrt(dist)
        out[s:s + chunk] = np.argmax(score, axis=-1)
    return out


class SceneModel:
    def __init__(self, opt):
        self.opt = opt
        self.cfg, self.tcfg, self.grid_kwargs = configs_from_opt(opt)
        self.expr_dir = os.path.join(opt.checkpoints_dir, opt.name or "default")
        os.makedirs(self.expr_dir, exist_ok=True)
        self.state: Optional[TrainState] = None
        self.grid = None
        self.spec = None
        self.best_psnr = 0.0
        self.best_iter = 0
        # spatially-sharded execution (--scene_shards N, parallel/spatial.py)
        self.sharded_scene = None
        self.sspec = None
        self.mesh = None
        self._spatial_fns = {}
        self._spatial_tstate = None  # lazy; created on first optimize()
        # ray-DP execution (--ray_shards N, parallel/sharded.py): rays shard,
        # scene/params replicate, grads psum over ICI
        self.ray_mesh = None
        n_ray = int(getattr(opt, "ray_shards", 0) or 0)
        if n_ray == -1:
            n_ray = len(jax.devices())
        if n_ray > 1:
            assert not int(getattr(opt, "scene_shards", 0) or 0), (
                "--ray_shards and --scene_shards are mutually exclusive "
                "(rays-DP replicates the scene; slab sharding splits it)")
            if len(jax.devices()) < n_ray:
                print(f"[ray_shards] {n_ray} shards requested but only "
                      f"{len(jax.devices())} devices; running unsharded")
            else:
                from ..parallel import make_mesh
                self.ray_mesh = make_mesh(n_ray)
                print(f"[ray_shards] rays shard over {n_ray} devices "
                      f"(scene/params replicated, grad psum over ICI)")
        # wcoord_query=0 (the reference default, neural_points.py:426):
        # Point-NeRF's perspective-space querier. The grid is rebuilt per
        # frame in camera frustum coords; a STATIC frustum spec
        # (perspective_spec_from_camera) keeps it one compile. Built lazily
        # from the first item's intrinsics (ensure_pspec).
        self.perspective = int(getattr(opt, "wcoord_query", 1)) == 0
        self.pspec = None
        if self.perspective:
            print("[scene_model] wcoord_query=0: per-frame perspective-space "
                  "querier (reference query_point_indices.py); growing "
                  "probes still use the world grid")
            if int(getattr(opt, "scene_shards", 0) or 0):
                # round-4: slab-sharded perspective rendering AND training
                # (render_rays_spatial_perspective / spatial_train_step
                # with pspec: per-shard frustum grids over the perspective
                # halo); the scene builds lazily once intrinsics arrive
                print("[scene_model] perspective x --scene_shards: "
                      "sharded rendering + training")

    # ------------------------------------------------------------- checkpoints

    def resolve_resume(self) -> Optional[str]:
        it = self.opt.resume_iter
        search_dirs = [self.expr_dir]
        if self.opt.resume_dir:
            search_dirs.insert(0, self.opt.resume_dir)
        for d in search_dirs:
            if it == "latest":
                latest = get_latest_epoch(d)
                if latest is None:
                    continue
                it_num = latest
            elif it == "best":
                it_num = "best"
            else:
                it_num = it
            for ext in (".npz", ".pth"):
                p = os.path.join(d, f"{it_num}_net_ray_marching{ext}")
                if os.path.exists(p):
                    return p
        return None

    def load_checkpoint(self, path: str):
        if path.endswith(".pth"):
            from ..models.checkpoint_io import (unpack_embedding_modes,
                                                load_reference_states)
            sd = load_torch_state_dict(path)
            params, pts = convert_reference_checkpoint(sd)
            pts = unpack_embedding_modes(
                pts, str(self.opt.point_conf_mode),
                str(self.opt.point_dir_mode), str(self.opt.point_color_mode),
                self.opt.point_features_dim)
            states_path = path.replace("_net_ray_marching.pth", "_states.pth")
            if os.path.exists(states_path):
                st = load_reference_states(states_path)
                self.best_psnr = float(st.get("best_PSNR", 0.0) or 0.0)
                self.best_iter = int(st.get("best_iter", 0) or 0)
            # reference edited checkpoints store a dense per-point (N,3,3)
            # Rw2c (neural_points.py:650) — factor into a part table + index
            rw2c, rot_idx = pts["Rw2c"], None
            if rw2c is not None and np.asarray(rw2c).ndim == 3:
                rw2c = np.asarray(rw2c, np.float32)
                _, first, inv = np.unique(
                    np.round(rw2c.reshape(len(rw2c), -1), 6), axis=0,
                    return_index=True, return_inverse=True)
                rw2c, rot_idx = rw2c[first], inv.astype(np.int32)
            cloud = make_point_cloud(
                xyz=pts["xyz"], embedding=pts["embedding"], conf=pts["conf"],
                dir=pts["dir"], color=pts["color"], feats=pts["feats"],
                label=pts["label"], Rw2c=rw2c, rot_idx=rot_idx,
                capacity=self._capacity_for(len(pts["xyz"])))
            # companion semantic embedding, if previously saved
            sem_path = path.replace("_net_ray_marching.pth",
                                    "_semanticEmbedding.pth")
            if os.path.exists(sem_path):
                import torch
                sem = torch.load(sem_path, map_location="cpu",
                                 weights_only=False)
                sem = np.asarray(sem.detach().cpu() if hasattr(sem, "detach")
                                 else sem, np.float32)
                sem = sem[0] if sem.ndim == 3 else sem
                cloud = dataclasses.replace(
                    cloud, sem_embedding=cloud.sem_embedding.at[:len(sem)].set(
                        jnp.asarray(sem)))
        else:
            tree, meta = load_native(path)
            params = tree["params"]
            c = tree["cloud"]
            c.setdefault("rot_idx",
                         np.zeros(len(c["xyz"]), np.int32))  # pre-rot_idx ckpt
            cloud = NeuralPointCloud(
                **{k: jnp.asarray(v) for k, v in c.items()})
            if meta:
                self.best_psnr = meta.get("best_psnr", 0.0)
                self.best_iter = meta.get("best_iter", 0)
        self._finish_setup(params, cloud)
        it = re.match(r"(\d+|best)_", os.path.basename(path))
        step = (self.best_iter if (it and it.group(1) == "best")
                else int(it.group(1)) if it else 0)
        self.state = dataclasses.replace(
            self.state, step=jnp.asarray(step, jnp.int32))
        print(f"loaded checkpoint {path} (step {step}, "
              f"{int(self.state.cloud.n_active)} points)")

    def save_checkpoint(self, it, best: bool = False):
        self._sync_from_spatial()
        tag = "best" if best else str(it)
        st = self.state
        tree = {
            "params": jax.tree.map(np.asarray, st.params),
            "cloud": {f.name: np.asarray(getattr(st.cloud, f.name))
                      for f in dataclasses.fields(st.cloud)},
        }
        meta = {"iter": int(it), "best_psnr": float(self.best_psnr),
                "best_iter": int(self.best_iter)}
        save_native(os.path.join(
            self.expr_dir, f"{tag}_net_ray_marching.npz"), tree, meta)

    def export_reference(self, it):
        """Also write a reference-format .pth for external tooling."""
        self._sync_from_spatial()
        st = self.state
        act = np.asarray(st.cloud.active)
        pts = {
            "xyz": np.asarray(st.cloud.xyz)[act],
            "embedding": np.asarray(st.cloud.embedding)[act],
            "conf": np.asarray(st.cloud.conf)[act],
            "dir": np.asarray(st.cloud.dir)[act],
            "color": np.asarray(st.cloud.color)[act],
            "feats": np.asarray(st.cloud.feats)[act],
            "Rw2c": np.asarray(st.cloud.Rw2c),
        }
        if pts["Rw2c"].ndim == 3:  # expand part table to the reference's
            pts["Rw2c"] = pts["Rw2c"][np.asarray(st.cloud.rot_idx)[act]]
        params = jax.tree.map(np.asarray, st.params)
        export_reference_checkpoint(
            params, pts,
            os.path.join(self.expr_dir, f"{it}_net_ray_marching.pth"))
        # companion BPNet 96-d point embedding, reference
        # saveSemanticEmbedding (neural_points_volumetric_model.py:674-681)
        sem = np.asarray(st.cloud.sem_embedding)[act]
        if np.abs(sem).max() > 0:
            import torch
            torch.save(torch.from_numpy(sem[None].copy()),
                       os.path.join(self.expr_dir,
                                    f"{it}_semanticEmbedding.pth"))
        # companion {iter}_states.pth (reference save_networks other_states,
        # base_model.py:100-102 + run/train_ft.py:922-927) so reference
        # tooling can resume from our exports
        import torch
        torch.save({
            "best_PSNR": float(self.best_psnr),
            "best_iter": int(self.best_iter),
            "epoch_count": 0,
            "total_steps": int(it),
        }, os.path.join(self.expr_dir, f"{it}_states.pth"))

    # ---------------------------------------------------------------- creation

    def _capacity_for(self, n: int) -> int:
        # headroom for growing; rounded for stable shapes
        cap = int(n * 1.3) + 1024
        return (cap + 1023) // 1024 * 1024

    def _finish_setup(self, params, cloud):
        self.spec = grid_spec_for_cloud(cloud, **self.grid_kwargs)
        self.grid = build_grid(cloud, self.spec)
        if params is None or "block1" not in params:
            params = init_aggregator_params(jax.random.key(0), self.cfg.agg)
        self.state = create_train_state(params, cloud, self.tcfg)
        self._setup_spatial(cloud)

    def _setup_spatial(self, cloud):
        """Slab-shard the scene over the device mesh when --scene_shards asks
        for it (inference path only; parallel/spatial.py)."""
        n = int(getattr(self.opt, "scene_shards", 0) or 0)
        if n <= 1:
            return
        if len(jax.devices()) < n:
            print(f"[scene_shards] {n} shards requested but only "
                  f"{len(jax.devices())} devices; rendering replicated")
            return
        if self.perspective and self.pspec is None:
            # the perspective halo width depends on the frustum spec,
            # known only once a frame's intrinsics arrive (ensure_pspec
            # finishes the setup)
            self._pending_spatial_cloud = cloud
            return
        from ..parallel import (make_mesh, build_sharded_scene,
                                shard_scene_put, perspective_halo_voxels)
        self.mesh = make_mesh(n)
        halo = (perspective_halo_voxels(self.spec, self.pspec)
                if self.perspective else None)
        scene, self.sspec = build_sharded_scene(
            cloud, self.spec, n, halo_override=halo,
            build_tables=not self.perspective)
        self.sharded_scene = shard_scene_put(scene, self.mesh)
        self._spatial_fns = {}
        self._spatial_tstate = None  # re-shard resets per-point opt state
        #                              (topology changed, like _rebuild)
        print(f"[scene_shards] scene sharded over {n} devices: "
              f"{self.sspec.cap_pts} pts/shard (of {cloud.capacity})"
              + (f", halo {self.sspec.halo} (perspective)"
                 if self.perspective else
                 f", {self.sspec.max_d_s} cache rows/shard "
                 f"(of {self.grid.nbr_packed.shape[0]})"))

    def setup_from_points(self, xyz: np.ndarray, feats: Optional[np.ndarray],
                          labels: Optional[np.ndarray],
                          dataset=None, mvs_model=None):
        """Bootstrap branch C (run/train_ft.py:650-800): voxel-downsample the
        scene cloud, then per-point embedding/color/dir/conf. With an MVS
        model, features come from FeatureNet + premlp (query_embedding); the
        fallback initializes embeddings randomly (feature_init_method=rand)."""
        opt = self.opt
        if opt.vox_res > 0:
            from .native import vox_downsample_closest
            keep = vox_downsample_closest(xyz, opt.vox_res)
            xyz = xyz[keep]
            feats = feats[keep] if feats is not None else None
            labels = labels[keep] if labels is not None else None
            print(f"after voxelize: {len(xyz)} points")

        n = len(xyz)
        rng = np.random.default_rng(0)
        if mvs_model is not None and dataset is not None:
            embedding, color, dirs, conf = mvs_model.embed_points(
                xyz, dataset, nearest_view)
        else:
            embedding = (rng.uniform(-0.5, 0.5, size=(n, opt.point_features_dim))
                         .astype(np.float32))
            color = (np.asarray(feats, np.float32) / 255.0
                     if feats is not None else np.zeros((n, 3), np.float32))
            conf = np.ones((n, 1), np.float32)
            if dataset is not None:
                campos, camdir = dataset.get_campos_ray()
                cam_ind = nearest_view(campos, camdir, xyz)
                d = campos[cam_ind] - xyz
                dirs = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
            else:
                dirs = np.zeros((n, 3), np.float32)
        if opt.default_conf > 0 and opt.default_conf < 1.0:
            conf = conf * opt.default_conf

        cloud = make_point_cloud(
            xyz, embedding, conf=conf, dir=dirs, color=color, feats=feats,
            label=labels, capacity=self._capacity_for(n))
        self._finish_setup(None, cloud)
        print(f"scene set up with {n} points (capacity {cloud.capacity})")

    # ------------------------------------------------------- perspective query

    def ensure_pspec(self, item: Dict):
        """Build the static frustum GridSpec once from the scene camera
        (wcoord_query=0; reference get_hyperparameters in
        query_point_indices.py derives the same bounds per frame — a fixed
        spec keeps the per-frame grid rebuild one XLA program)."""
        if not self.perspective or self.pspec is not None:
            return
        from ..ops.query_pers import perspective_spec_from_camera
        opt = self.opt
        W, H = int(opt.img_wh[0]), int(opt.img_wh[1])
        n_act = int(self.state.cloud.n_active) if self.state is not None \
            else 1_000_000
        intr = np.asarray(item["intrinsic"], np.float32)[:3, :3]
        max_o = int(opt.max_o) if opt.max_o else 0
        P = int(opt.P) if opt.P else 16
        spec = perspective_spec_from_camera(
            intr, W, H, float(item["near"]), float(item["far"]),
            self.grid_kwargs["vsize"], self.grid_kwargs["vscale"],
            self.grid_kwargs["kernel_size"],
            max_o or 1, P)
        if not max_o:
            # auto cap: every occupied frustum voxel holds >=1 point
            import math
            n_vox = math.prod(spec.vdim)
            max_o = max(1024, min(n_vox, n_act))
            spec = dataclasses.replace(spec, max_o=int(max_o))
        self.pspec = spec
        print(f"[scene_model] perspective frustum grid: vdim={spec.vdim} "
              f"max_o={spec.max_o} P={spec.P}")
        pending = getattr(self, "_pending_spatial_cloud", None)
        if pending is not None:
            # --scene_shards deferred until the frustum spec (and so the
            # perspective halo width) was known
            self._pending_spatial_cloud = None
            self._setup_spatial(pending)

    # ---------------------------------------------------------------- training

    def optimize(self, batch: Dict, key) -> Dict[str, float]:
        if getattr(self, "_pending_spatial_cloud", None) is not None:
            # perspective + --scene_shards: the sharded scene builds once
            # the frustum spec is known; train_ft calls ensure_pspec(item)
            # before the first optimize, so if we are still pending here
            # the caller skipped it
            raise RuntimeError(
                "perspective --scene_shards: call ensure_pspec(item) "
                "before optimize() (the sharded scene builds lazily)")
        if self.sharded_scene is not None:
            return self._optimize_spatial(batch, key)
        if self.ray_mesh is not None:
            from ..parallel import sharded_train_step
            if self.perspective:
                assert self.pspec is not None, \
                    "perspective mode: call ensure_pspec(item) before optimize()"
            self.state, losses = sharded_train_step(
                self.state, self.grid, self.cfg, self.tcfg, batch, key,
                self.ray_mesh, pspec=self.pspec)
            return losses
        if self.perspective:
            assert self.pspec is not None, \
                "perspective mode: call ensure_pspec(item) before optimize()"
        self.state, losses = train_step(
            self.state, self.grid, self.cfg, self.tcfg, batch, key,
            pspec=self.pspec)
        return losses

    def optimize_multi(self, batches, keys):
        """G steps in one dispatch (train_step_multi): batches is a list of
        per-step batch dicts (stacked here), keys (G,). Returns the list of
        per-step loss dicts (device scalars, lazy)."""
        if self.sharded_scene is not None:
            return self._optimize_spatial_multi(batches, keys)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        if self.ray_mesh is not None:
            # per-ray leaves are (G,B,R,...): shard R (axis 2), replicate rest
            from ..parallel import ray_sharding, replicated
            from ..parallel.sharded import _RAY_KEYS
            rs = ray_sharding(self.ray_mesh, ray_axis=2)
            rep = replicated(self.ray_mesh)
            stacked = {k: (v if v is None else
                           jax.device_put(v, rs if k in _RAY_KEYS else rep))
                       for k, v in stacked.items()}
            self.state = jax.device_put(self.state, rep)
            self.grid = jax.device_put(self.grid, rep)
        self.state, losses = train_step_multi(
            self.state, self.grid, self.cfg, self.tcfg, stacked, keys,
            pspec=self.pspec, ray_mesh=self.ray_mesh)
        G = len(batches)
        return [jax.tree.map(lambda a: a[i], losses) for i in range(G)]

    def _optimize_spatial_multi(self, batches, keys):
        """G sharded-scene steps in one dispatch (spatial_train_step_multi:
        lax.scan over the shard_map step — removes the old
        steps_per_dispatch/scene_shards incompatibility)."""
        from ..parallel.spatial import (create_spatial_train_state,
                                        spatial_train_step_multi)
        if self._spatial_tstate is None:
            st = create_spatial_train_state(
                self.state.params, self.sharded_scene, self.tcfg)
            self._spatial_tstate = dataclasses.replace(
                st, step=jnp.asarray(self.state.step, jnp.int32))
        missing = [b for b in batches if b.get("bg_color") is None]
        assert not missing or len(missing) == len(batches)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        self._spatial_tstate, losses = spatial_train_step_multi(
            self._spatial_tstate, self.sspec, self.cfg, self.tcfg, stacked,
            keys, self.mesh,
            pspec=self.pspec if self.perspective else None)
        G = len(batches)
        return [jax.tree.map(lambda a: a[i], losses) for i in range(G)]

    def _optimize_spatial(self, batch: Dict, key) -> Dict[str, float]:
        """Training step over the slab-sharded scene (parallel/spatial.py).
        MLP params + per-point attributes train in place on the shards;
        save/test/prune/grow sync back via _sync_from_spatial."""
        from ..parallel.spatial import (create_spatial_train_state,
                                        spatial_train_step)
        if self._spatial_tstate is None:
            st = create_spatial_train_state(
                self.state.params, self.sharded_scene, self.tcfg)
            self._spatial_tstate = dataclasses.replace(
                st, step=jnp.asarray(self.state.step, jnp.int32))
        self._spatial_tstate, losses = spatial_train_step(
            self._spatial_tstate, self.sspec, self.cfg, self.tcfg, batch,
            key, self.mesh,
            pspec=self.pspec if self.perspective else None)
        return losses

    def _sync_from_spatial(self):
        """Fold trained shard attributes + params back into the replicated
        state (owner rows win; halo copies are identical by construction)
        and refresh the render-path scene."""
        st = self._spatial_tstate
        if st is None:
            return
        gids = np.asarray(st.scene.gid)
        cap = self.state.cloud.capacity
        fields = {}
        for f in ("embedding", "conf", "color", "dir", "xyz"):
            glob = np.asarray(getattr(self.state.cloud, f)).copy()
            stacked = np.asarray(getattr(st.scene.cloud, f))
            for i in range(gids.shape[0]):
                valid = gids[i] < cap
                glob[gids[i][valid]] = stacked[i][valid]
            fields[f] = jnp.asarray(glob)
        cloud = dataclasses.replace(self.state.cloud, **fields)
        self.state = dataclasses.replace(
            self.state, params=st.params, cloud=cloud, step=st.step)
        self.sharded_scene = st.scene  # render with the trained attributes

    def push_semantics_to_shards(self):
        """Propagate refreshed BPNet outputs (label / label_prob /
        sem_embedding, set on the replicated cloud by SemanticDriver) into
        every shard's local rows (halo copies included) via the
        local->global id maps."""
        if self.sharded_scene is None:
            return
        from ..parallel.spatial import shard_scene_put
        gids = np.asarray(self.sharded_scene.gid)
        cap = self.state.cloud.capacity
        updates = {}
        for f in ("label", "label_prob", "sem_embedding"):
            glob = np.asarray(getattr(self.state.cloud, f))
            stacked = np.asarray(
                getattr(self.sharded_scene.cloud, f)).copy()
            for i in range(gids.shape[0]):
                valid = gids[i] < cap
                stacked[i][valid] = glob[gids[i][valid]]
            updates[f] = jnp.asarray(stacked)
        new_cloud = dataclasses.replace(self.sharded_scene.cloud, **updates)
        self.sharded_scene = shard_scene_put(
            dataclasses.replace(self.sharded_scene, cloud=new_cloud),
            self.mesh)
        if self._spatial_tstate is not None:
            st_cloud = dataclasses.replace(
                self._spatial_tstate.scene.cloud, **{
                    k: self.sharded_scene.cloud.__getattribute__(k)
                    for k in updates})
            self._spatial_tstate = dataclasses.replace(
                self._spatial_tstate, scene=dataclasses.replace(
                    self._spatial_tstate.scene, cloud=st_cloud))

    def prune_points(self, thresh: float):
        self._sync_from_spatial()
        cloud = prune_cloud(self.state.cloud, thresh)
        print(f"prune: {int(self.state.cloud.n_active)} -> "
              f"{int(cloud.n_active)} points")
        self._rebuild(cloud)

    def grow_points(self, new_xyz, new_embedding, new_conf, new_color, new_dir):
        self._sync_from_spatial()
        need = int(self.state.cloud.n_active) + len(new_xyz)
        cloud = self.state.cloud
        if need > cloud.capacity:
            # host-side re-allocation at larger capacity
            act = np.asarray(cloud.active)
            cloud = make_point_cloud(
                np.concatenate([np.asarray(cloud.xyz)[act], new_xyz]),
                np.concatenate([np.asarray(cloud.embedding)[act], new_embedding]),
                conf=np.concatenate([np.asarray(cloud.conf)[act], new_conf]),
                dir=np.concatenate([np.asarray(cloud.dir)[act], new_dir]),
                color=np.concatenate([np.asarray(cloud.color)[act], new_color]),
                capacity=self._capacity_for(need))
        else:
            # pass host arrays straight through: grow() pads on the host
            # before ONE device upload (a jnp.asarray here would round-trip
            # device->host->device through the tunnel)
            cloud = grow_cloud(cloud, new_xyz, new_embedding, new_conf,
                               new_color, new_dir)
        print(f"grow: +{len(new_xyz)} -> {int(cloud.n_active)} points")
        self._rebuild(cloud)

    def _rebuild(self, cloud):
        """Swap the cloud, rebuild the grid, keep MLP params + step, reset
        point-optimizer state (topology changed)."""
        params = self.state.params
        step = self.state.step
        self._refit_spec(cloud)
        # free the OLD grid before building the new one: at 4.2M points the
        # neighborhood cache is ~2.5 GiB and holding both through the build
        # transients OOMs a 16 GB chip (probe_grow_42m.py caught it)
        self.grid = None
        self.grid = build_grid(cloud, self.spec)
        st = create_train_state(params, cloud, self.tcfg)
        self.state = dataclasses.replace(st, step=step,
                                         opt_state_net=self.state.opt_state_net)
        self._setup_spatial(cloud)

    # --------------------------------------------------------------- rendering

    def _refit_spec(self, cloud):
        """After grow/prune, re-check auto-sized grid caps against the new
        cloud; recompute the spec only when the caps no longer fit (a spec
        change recompiles every consumer, so the auto buckets in
        auto_grid_caps give growth headroom that usually keeps it stable)."""
        if self.opt.max_o and self.opt.P:
            return  # user-pinned caps: reference truncation semantics
        from ..ops.grid import auto_grid_caps
        xyz = np.asarray(cloud.xyz)[np.asarray(cloud.active)]
        need_o, need_p = auto_grid_caps(
            xyz, self.spec.min_corner, self.spec.vsize, self.spec.vdim)
        over_o = (not self.opt.max_o) and need_o > self.spec.max_o
        over_p = (not self.opt.P) and need_p > self.spec.P
        if over_o or over_p:
            old = (self.spec.max_o, self.spec.P)
            self.spec = grid_spec_for_cloud(cloud, **self.grid_kwargs)
            print(f"[grid] auto caps re-fit after topology change: "
                  f"(max_o,P) {old} -> ({self.spec.max_o}, {self.spec.P}) "
                  f"(recompiles consumers)", flush=True)

    def render_image(self, item: Dict, chunk_rays: int = 9216,
                     key=None, chunks_per_dispatch: int = 4,
                     bg_image=None) -> np.ndarray:
        """Chunked full-frame render; returns (H', W', 3) over the filtered
        pixel window (test_ft.py:167-204 chunk loop, static chunk shapes).

        `chunks_per_dispatch` chunks render inside ONE jitted dispatch
        (lax.map): ~27 ms of each dispatch is host-side enqueue through the
        remote tunnel that pipelining does NOT hide (PERFORMANCE.md), so
        batching dispatches amortizes it G-fold."""
        raydir = np.asarray(item["raydir"], np.float32)
        R = len(raydir)
        if self.perspective:
            # must run before the sharded check: the perspective sharded
            # scene is built lazily once the frustum spec is known
            self.ensure_pspec(item)
        if self.sharded_scene is not None:
            if bg_image is not None:
                raise NotImplementedError(
                    "--bgmodel plane does not compose with --scene_shards "
                    "(per-ray background swap needs the bgT output of the "
                    "spatial renderer; render unsharded for plane-bg evals)")
            return self._render_image_spatial(item, raydir, chunk_rays)
        G = max(1, int(chunks_per_dispatch))
        # --chunk_stack B: render B chunks per lax.map body on the batch
        # axis (single batched gathers); G stays the per-dispatch total
        B = max(1, int(getattr(self.opt, "chunk_stack", 1) or 1))
        B = min(B, G)
        G = G // B
        group = chunk_rays * G * B
        pad = (-R) % group
        raydir_p = np.concatenate(
            [raydir, np.zeros((pad, 3), np.float32)]) if pad else raydir
        cols = []
        st = self.state
        ray_put = None
        if self.ray_mesh is not None:
            from ..parallel import ray_sharding, replicated
            rep = replicated(self.ray_mesh)
            # idempotent: no-op copies after the first frame
            st = jax.device_put(st, rep)
            self.state = st
            self.grid = jax.device_put(self.grid, rep)
            rs = ray_sharding(self.ray_mesh, ray_axis=2)
            ray_put = lambda rd: jax.device_put(rd, rs)  # noqa: E731
            loc = B * (chunk_rays // self.ray_mesh.size)
            if (self.cfg.attr_dedup > 0 and loc % self.cfg.attr_tile != 0
                    and not getattr(self, "_warned_dedup_shard", False)):
                # the dedup gate tests PER-SHARD rows inside shard_map;
                # surface the silent fallback (review finding, round 5)
                print(f"[render] attr_dedup inactive under --ray_shards: "
                      f"per-shard rows {loc} not a multiple of --attr_tile "
                      f"{self.cfg.attr_tile}; using the plain gather "
                      f"(exact, slower) — pick chunk/attr_tile so "
                      f"(chunk_stack*chunk/ray_shards) % attr_tile == 0")
                self._warned_dedup_shard = True
        campos = jnp.broadcast_to(jnp.asarray(item["campos"]), (B, 3))
        rot = jnp.broadcast_to(jnp.asarray(item["camrotc2w"]), (B, 3, 3))
        near = jnp.asarray(item["near"])
        far = jnp.asarray(item["far"])
        bg = jnp.asarray(item["bg_color"])
        overs = []
        groups = []
        bgts = []
        for s in range(0, len(raydir_p), group):
            rds = jnp.asarray(
                raydir_p[s:s + group].reshape(G, B, chunk_rays, 3))
            if ray_put is not None:
                rds = ray_put(rds)
            c, bgt, over = _render_chunk_group(
                st.params, st.cloud, self.grid, self.cfg, campos, rds,
                rot, near, far, bg, pspec=self.pspec,
                ray_mesh=self.ray_mesh)
            cols.append(c)
            bgts.append(bgt)
            overs.append(over)
            groups.append(rds)
            # results stay on-device: dispatches pipeline, so device compute
            # of group i overlaps the enqueue of group i+1
        if self.cfg.attr_dedup > 0:
            # exactness contract: a tile with more than --attr_dedup
            # distinct ids degrades its rows to "no neighbor" inside the
            # dedup'd gather — instead of shipping a warned-but-wrong
            # image, re-render any overflowed dispatch group through the
            # plain gather (exact under ALL inputs; one extra dispatch for
            # a rare case, VERDICT-r3 item 5)
            n_over = 0
            cfg_plain = None
            for i, over in enumerate(overs):
                gi = int(jnp.sum(over))
                if gi == 0:
                    continue
                n_over += gi
                if cfg_plain is None:
                    cfg_plain = dataclasses.replace(self.cfg, attr_dedup=0)
                c, bgt, _ = _render_chunk_group(
                    st.params, st.cloud, self.grid, cfg_plain, campos,
                    groups[i], rot, near, far, bg, pspec=self.pspec,
                    ray_mesh=self.ray_mesh)
                cols[i] = c
                bgts[i] = bgt
            if n_over > 0 and not getattr(self, "_warned_attr_over", False):
                print(f"[render] attr-dedup overflow: {n_over} neighbor "
                      f"rows exceeded --attr_dedup {self.cfg.attr_dedup} "
                      "distinct ids per tile; the affected chunk groups "
                      "were re-rendered exactly through the plain gather "
                      "(raise --attr_dedup to avoid the extra dispatches)",
                      flush=True)
                self._warned_attr_over = True
        col = np.concatenate([np.asarray(c).reshape(-1, 3)
                              for c in cols])[:R]
        if bg_image is not None:
            # --bgmodel plane: swap the constant background for the
            # per-ray plane colors via the background transmission —
            # exact for the reference's black-bg plane configs
            # (models/background.py docstring; reference
            # neural_points_volumetric_model.py:175-177)
            bgt = np.concatenate([np.asarray(b).reshape(-1, 1)
                                  for b in bgts])[:R]
            col = col + bgt * (np.asarray(bg_image, np.float32).reshape(
                -1, 3) - np.asarray(item["bg_color"], np.float32))
        return col

    def _render_image_spatial(self, item, raydir, chunk_rays):
        """Chunked full-frame render over the slab-sharded scene."""
        from ..parallel import render_rays_spatial
        import functools

        def make_go(cfg):
            sspec, mesh, pspec = self.sspec, self.mesh, self.pspec
            perspective = self.perspective

            @jax.jit
            def go(params, scene, campos, rd, rot, near, far, bg):
                if perspective:
                    from ..parallel import render_rays_spatial_perspective
                    out = render_rays_spatial_perspective(
                        params, scene, sspec, pspec, cfg, mesh,
                        campos=campos, raydir=rd, camrotc2w=rot,
                        near=near, far=far, bg_color=bg)
                else:
                    out = render_rays_spatial(
                        params, scene, sspec, cfg, mesh, campos=campos,
                        raydir=rd, camrotc2w=rot, near=near, far=far,
                        bg_color=bg)
                return (out["coarse_raycolor"][0],
                        out.get("attr_dedup_overflow", jnp.asarray(0)))
            return go

        if chunk_rays not in self._spatial_fns:
            self._spatial_fns[chunk_rays] = make_go(self.cfg)
        go = self._spatial_fns[chunk_rays]

        R = len(raydir)
        pad = (-R) % chunk_rays
        raydir_p = np.concatenate(
            [raydir, np.zeros((pad, 3), np.float32)]) if pad else raydir
        campos = jnp.asarray(item["campos"][None])
        rot = jnp.asarray(item["camrotc2w"][None])
        near = float(item["near"])
        far = float(item["far"])
        bg = jnp.asarray(item["bg_color"])
        params = (self._spatial_tstate.params
                  if self._spatial_tstate is not None else self.state.params)
        scene = (self._spatial_tstate.scene
                 if self._spatial_tstate is not None else self.sharded_scene)
        outs = [go(params, scene, campos,
                   jnp.asarray(raydir_p[s:s + chunk_rays][None]), rot,
                   near, far, bg)
                for s in range(0, len(raydir_p), chunk_rays)]
        cols = [c for c, _ in outs]
        if self.cfg.attr_dedup > 0:
            # same exactness contract as the non-spatial path: re-render
            # overflowed chunks through the plain gather
            n_over = 0
            go_plain = None
            for i, (_, over) in enumerate(outs):
                oi = int(over)
                if oi == 0:
                    continue
                n_over += oi
                if go_plain is None:
                    go_plain = self._spatial_fns.setdefault(
                        ("plain", chunk_rays),
                        make_go(dataclasses.replace(self.cfg, attr_dedup=0)))
                s = i * chunk_rays
                cols[i], _ = go_plain(
                    params, scene, campos,
                    jnp.asarray(raydir_p[s:s + chunk_rays][None]), rot,
                    near, far, bg)
            if n_over > 0 and not getattr(self, "_warned_attr_over", False):
                print(f"[render] attr-dedup overflow: {n_over} neighbor "
                      f"rows exceeded --attr_dedup {self.cfg.attr_dedup}; "
                      "overflowed chunks re-rendered exactly via the plain "
                      "gather", flush=True)
                self._warned_attr_over = True
        return np.concatenate([np.asarray(c) for c in cols])[:R]
