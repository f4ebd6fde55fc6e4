"""Per-scene fine-tuning driver (reference: /root/reference/run/train_ft.py).

Flow (reference main() :588-1087, re-designed for in-process operation):
  1. parse TrainOptions, create dataset + SceneModel;
  2. bootstrap: resume from checkpoint if present, else load scene init
     points (load_init_points / load_init_depth_points), voxel-downsample,
     initialize per-point attributes, set points;
  3. train loop: per-iteration random-ray batches through the jitted train
     step; periodic prune (prune_iter), grow (prob_freq — IN-PROCESS, no
     save+exit()+bash-restart), save (save_iter_freq), test (test_freq);
  4. final save + full test.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.runtime.jax_setup import setup as _jax_setup  # noqa: E402
_jax_setup()

import jax  # noqa: E402

from sgnerf_tpu.options import TrainOptions  # noqa: E402
from sgnerf_tpu.data import create_dataset  # noqa: E402
from sgnerf_tpu.runtime import SceneModel  # noqa: E402
from sgnerf_tpu.utils.visualizer import Visualizer  # noqa: E402
from sgnerf_tpu.utils.metrics import psnr  # noqa: E402


def make_batch(item):
    import jax.numpy as jnp
    b = {
        "campos": jnp.asarray(item["campos"][None]),
        "raydir": jnp.asarray(item["raydir"][None]),
        "camrotc2w": jnp.asarray(item["camrotc2w"][None]),
        "near": jnp.asarray(item["near"]),
        "far": jnp.asarray(item["far"]),
        "bg_color": jnp.asarray(item["bg_color"]),
        "gt_image": jnp.asarray(item["gt_image"][None]),
    }
    if "pixel_label" in item:
        b["pixel_label"] = jnp.asarray(item["pixel_label"][None])
    if "bg_ray" in item:
        # --bgmodel plane: per-ray background replacing the constant one
        # through the background transmission (models/train.py loss_fn)
        b["bg_ray"] = jnp.asarray(item["bg_ray"][None])
    if "gt_depth" in item:
        b["gt_depth"] = jnp.asarray(item["gt_depth"][None])
        b["gt_mask"] = jnp.asarray(item["gt_mask"][None])
        # reference ray_depth_mask = depth_gt > 0 at the sampled pixels
        # (mvs_points_volumetric_model.py:152 + compute_losses :566-568)
        b["ray_depth_mask"] = jnp.asarray(
            (item["gt_depth"] > 0).astype(np.float32)[None])
    return b


class ItemPrefetcher:
    """Background-thread item loader so host IO (jpeg decode, pixel
    sampling) overlaps device compute — the reference relies on torch
    DataLoader workers for this (data/__init__.py:68-72)."""

    def __init__(self, dataset, rng, depth: int = 4, n_threads: int = 2):
        import queue
        import threading
        self.q = queue.Queue(maxsize=depth)
        self.dataset = dataset
        self.rng = rng
        self.stop = False

        def worker(seed):
            r = np.random.default_rng(seed)
            while not self.stop:
                idx = int(r.integers(0, len(self.dataset)))
                item = self.dataset.get_item(idx, rng=r)
                self.q.put(item)

        self.threads = [
            threading.Thread(target=worker, args=(1000 + t,), daemon=True)
            for t in range(max(1, n_threads))]
        for t in self.threads:
            t.start()

    def next(self):
        return self.q.get()

    def close(self):
        self.stop = True
        while not self.q.empty():
            self.q.get_nowait()


def run_test(model, dataset, visualizer, total_steps, num_images=None,
             step_stride=1):
    """Render test frames, save images, return mean PSNR
    (reference run/test_ft.py:132-268)."""
    ids = list(range(len(dataset)))[::step_stride]
    if num_images:
        ids = ids[:num_images]
    psnrs = []
    subdir = f"test_{total_steps}"
    plane_bg = str(getattr(model.opt, "bgmodel", "no")).endswith("plane")
    for i in ids:
        item = dataset.get_item(i, full_img=True)
        bg_image = None
        if plane_bg and item.get("plane_pnt") is not None \
                and hasattr(dataset, "get_init_item"):
            from sgnerf_tpu.models.background import plane_bg_ray
            active = np.asarray(model.state.cloud.active)
            bg_image = plane_bg_ray(
                item, dataset.get_init_item(0),
                np.asarray(model.state.cloud.xyz)[active])
        t0 = time.time()
        col = model.render_image(item, bg_image=bg_image)
        # reshape using the pixel window the dataset sampled
        npx = item["pixel_idx"]
        W = int(npx[:, 0].max() - npx[:, 0].min() + 1)
        H = len(col) // W
        img = col[:H * W].reshape(H, W, 3)
        gt = item["gt_image"][:H * W].reshape(H, W, 3)
        p = psnr(img, gt)
        psnrs.append(p)
        print(f"test img {i} psnr: {p:.3f}  time used: {time.time()-t0:.3f} s",
              flush=True)
        visualizer.display_current_results(
            {"coarse_raycolor": img, "gt_image": gt}, i, subdir=subdir)
    mean_psnr = float(np.mean(psnrs)) if psnrs else 0.0
    print(f"test mean psnr over {len(psnrs)} imgs: {mean_psnr:.3f}")
    return mean_psnr


def main():
    opt = TrainOptions().parse()
    opt.split = "train"
    TrainOptions().save(opt)
    visualizer = Visualizer(opt)
    dataset = create_dataset(opt)

    model = SceneModel(opt)
    resume = model.resolve_resume()
    if resume is not None:
        model.load_checkpoint(resume)
    elif opt.load_points < 1:
        # bootstrap branch B: MVSNet depths -> cross-view filter -> embed
        # (reference gen_points_filter_embeddings, run/train_ft.py:101-170)
        from sgnerf_tpu.runtime.mvs_bootstrap import (
            gen_points_filter_embeddings)
        from sgnerf_tpu.models.point_cloud import make_point_cloud
        xyz, emb, color, dirs, conf = gen_points_filter_embeddings(
            dataset, opt, key=jax.random.key(11))
        print(f"MVS bootstrap produced {len(xyz)} points")
        cloud = make_point_cloud(xyz, emb, conf=conf, dir=dirs, color=color,
                                 capacity=model._capacity_for(len(xyz)))
        model._finish_setup(None, cloud)
    elif opt.load_points == 2:
        # bootstrap branch: GT depth unprojection only (run/train_ft.py:668)
        xyz = dataset.load_init_depth_points(vox_res=100)
        model.setup_from_points(xyz, None, None, dataset=dataset)
    else:
        xyz, feats, labels = dataset.load_init_points()
        model.setup_from_points(xyz, feats, labels, dataset=dataset)

    semantic = None
    if opt.predict_semantic:
        from sgnerf_tpu.runtime.semantic import SemanticDriver
        semantic = SemanticDriver(opt, key=jax.random.key(7))

    test_opt_ds = None
    total_steps = int(model.state.step)
    maximum_step = opt.maximum_step or 100000
    key = jax.random.key(0)
    rng = np.random.default_rng(1)

    print(f"training from step {total_steps} to {maximum_step}")
    t_start = time.time()
    # the prefetcher now coexists with semantics: the BPNet refresh runs on
    # its own background thread (runtime/semantic.py) and only reads the
    # item's paths/intrinsics, which prefetched items carry
    prefetcher = (ItemPrefetcher(dataset, rng, n_threads=opt.n_threads)
                  if opt.n_threads > 0 else None)

    # group size for multi-step dispatch (train_step_multi): fixed host
    # enqueue cost amortizes G-fold; forced to 1 by per-step host work
    # (profiling) and around scheduled-event boundaries. Semantics are
    # compatible: the BPNet refresh runs on a background thread between
    # dispatch groups (runtime/semantic.py)
    G_max = max(1, int(getattr(opt, "steps_per_dispatch", 1)))
    if opt.profile_dir:
        G_max = 1

    def _next_event(step):
        nxt = maximum_step
        for freq in (opt.print_freq, opt.save_iter_freq, opt.save_point_freq,
                     opt.prune_iter, opt.prob_freq, opt.test_freq):
            if freq and freq > 0:
                nxt = min(nxt, (step // freq + 1) * freq)
        return nxt

    # --bgmodel *plane: precompute a full-frame plane background per frame
    # (reference run/train_ft.py:559-586 create_all_bg); each batch then
    # indexes its sampled pixels (reference :210-218)
    bg_all = None
    if str(getattr(opt, "bgmodel", "no")).endswith("plane"):
        from sgnerf_tpu.models.background import create_all_bg
        active = np.asarray(model.state.cloud.active)
        bg_all = create_all_bg(dataset,
                               np.asarray(model.state.cloud.xyz)[active])
        if bg_all is not None:
            print(f"[bgmodel] plane backgrounds for {len(bg_all)} frames")

    def _get_item():
        if prefetcher is not None:
            item = prefetcher.next()
        else:
            item = dataset.get_item(int(rng.integers(0, len(dataset))),
                                    rng=rng)
        if bg_all is not None:
            bg = bg_all[int(item["id"])]
            px = item["pixel_idx"].astype(np.int64)
            item["bg_ray"] = bg[px[:, 1], px[:, 0]]
        return item

    while total_steps < maximum_step:
        G = min(G_max, _next_event(total_steps) - total_steps) \
            if G_max > 1 else 1
        if G > 1:
            items = [_get_item() for _ in range(G)]
            if model.perspective:
                model.ensure_pspec(items[0])
            if semantic is not None:
                semantic.maybe_refresh(model, dataset, items[0], steps=G)
                for it in items:
                    pl = semantic.pixel_labels_for(it)
                    if pl is not None:
                        it["pixel_label"] = pl
            key, *ks = jax.random.split(key, G + 1)
            loss_list = model.optimize_multi(
                [make_batch(it) for it in items], jax.numpy.stack(ks))
            total_steps += G
            for l in loss_list:
                visualizer.accumulate_losses(l)
        else:
            item = _get_item()
            if model.perspective:
                model.ensure_pspec(item)
            if semantic is not None:
                semantic.maybe_refresh(model, dataset, item)
                pl = semantic.pixel_labels_for(item)
                if pl is not None:
                    item["pixel_label"] = pl
            if opt.profile_dir and total_steps == opt.profile_start:
                jax.profiler.start_trace(opt.profile_dir)
            batch = make_batch(item)
            key, k = jax.random.split(key)
            losses = model.optimize(batch, k)
            # host-side step mirror: int(model.state.step) would block on
            # the async dispatch every iteration, serializing the fixed
            # dispatch latency into the step time
            total_steps += 1
            if opt.profile_dir and \
                    total_steps == opt.profile_start + opt.profile_steps:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {opt.profile_dir}")
            visualizer.accumulate_losses(losses)
        if total_steps % opt.print_freq == 0:
            visualizer.print_losses(total_steps)
            visualizer.reset()

        if opt.prune_iter > 0 and total_steps % opt.prune_iter == 0 \
                and total_steps <= opt.prune_max_iter:
            model.prune_points(opt.prune_thresh)

        if opt.prob_freq > 0 and total_steps % opt.prob_freq == 0:
            from sgnerf_tpu.runtime.growing import probe_and_grow
            key, k = jax.random.split(key)
            probe_and_grow(model, dataset, opt, k)

        if total_steps % opt.save_iter_freq == 0:
            if semantic is not None:
                semantic.flush(model)
            model.save_checkpoint(total_steps)

        if opt.save_point_freq > 0 and total_steps % opt.save_point_freq == 0:
            act = np.asarray(model.state.cloud.active)
            visualizer.save_neural_points(
                total_steps, np.asarray(model.state.cloud.xyz)[act],
                colors=np.asarray(model.state.cloud.color)[act])

        if opt.test_freq > 0 and total_steps % opt.test_freq == 0:
            if test_opt_ds is None:
                import copy
                topt = copy.copy(opt)
                topt.split = "test"
                topt.random_sample = "no_crop"
                test_opt_ds = create_dataset(topt)
            mean_psnr = run_test(model, test_opt_ds, visualizer, total_steps,
                                 num_images=opt.test_num,
                                 step_stride=opt.test_num_step)
            if mean_psnr > model.best_psnr:
                model.best_psnr = mean_psnr
                model.best_iter = total_steps
                model.save_checkpoint(total_steps, best=True)

    if prefetcher is not None:
        prefetcher.close()
    if semantic is not None:
        semantic.flush(model)
    print(f"training done in {time.time()-t_start:.1f}s; saving final")
    model.save_checkpoint(total_steps)
    model.export_reference(total_steps)
    import copy
    topt = copy.copy(opt)
    topt.split = "test"
    topt.random_sample = "no_crop"
    final_ds = create_dataset(topt)
    run_test(model, final_ds, visualizer, total_steps,
             num_images=opt.test_num, step_stride=1)


if __name__ == "__main__":
    main()
