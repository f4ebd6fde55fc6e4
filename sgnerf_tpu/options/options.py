"""Command-line flag surface, preserving the reference's names and defaults.

Mirrors /root/reference/options/{base,train,test,edit}_options.py plus the
flags injected by model/dataset classes via modify_commandline_options
(base_options.py:117-136), flattened into one table so dev_scripts run
unmodified. Unknown flags are tolerated (warned) for forward-compat.

`configs_from_opt` translates a parsed namespace into the static dataclass
configs the jitted code paths consume.
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

# (name, type, default, nargs) — defaults lifted from the reference files.
_F = [
    # base options
    ("name", str, None, None), ("data_root", str, None, None),
    ("n_threads", int, 1, None), ("batch_size", int, 1, None),
    ("render_only", int, 0, None), ("serial_batches", int, 0, None),
    ("gpu_ids", str, "0", None), ("checkpoints_dir", str, "./checkpoints", None),
    ("show_tensorboard", int, 0, None), ("resume_dir", str, "", None),
    ("resume_iter", str, "latest", None), ("debug", bool, False, "store_true"),
    ("vid", int, 0, None), ("resample_pnts", int, -1, None),
    ("inall_img", int, 1, None), ("test_train", int, 0, None),
    ("model", str, "mvs_points_volumetric", None),
    ("dataset_name", str, None, None), ("max_dataset_size", int, 2**31, None),
    ("mode", int, 0, None), ("verbose", bool, False, "store_true"),
    ("timestamp", bool, False, "store_true"),
    # train options
    ("plr", float, 0.0005, None), ("lr", float, 0.001, None),
    ("lr_policy", str, "lambda", None), ("lr_decay_iters", int, 50, None),
    ("lr_decay_exp", float, 0.1, None),
    ("train_and_test", int, 0, None), ("test_num", int, 1, None),
    ("test_num_step", int, 1, None), ("test_freq", int, 500, None),
    ("maximum_step", int, None, None), ("niter", int, 100, None),
    ("niter_decay", int, 100, None),
    ("save_iter_freq", int, 100000, None),
    ("save_point_freq", int, 100000, None),
    ("print_freq", int, 100, None),
    ("prune_thresh", float, 0.1, None), ("prune_iter", int, -1, None),
    ("prune_max_iter", int, 9999999, None), ("alpha_range", int, 0, None),
    ("prob_freq", int, 0, None), ("prob_num_step", int, 100, None),
    ("prob_mode", int, 0, None), ("prob_top", int, 1, None),
    ("prob_mul", float, 1.0, None), ("prob_thresh", float, 0.8, None),
    ("prob_kernel_size", float, None, "+"), ("prob_tiers", int, (250000,), "+"),
    ("far_thresh", float, -1.0, None), ("comb_file", str, None, None),
    ("save_label_iter", int, 100000, None),
    ("save_predict_label", int, 0, None),
    ("test_printId", int, 0, None), ("test_list", int, None, "+"),
    ("train_step", int, 50, None), ("train_load_num", int, 0, None),
    ("alter_step", int, 0, None), ("feedforward", int, 0, None),
    ("no_loss", int, 0, None),
    # edit options
    ("neural_points_names", str, None, "+"), ("render_name", str, None, None),
    ("parts_index_names", str, None, "+"),
    ("Transformation_names", str, None, "+"),
    ("render_stride", int, 30, None), ("render_radius", float, 4.0, None),
    # rendering model flags
    ("out_channels", int, None, None),
    ("which_ray_generation", str, "cube", None),
    ("domain_size", int, 1, None),
    ("which_render_func", str, "microfacet", None),
    ("which_blend_func", str, "alpha", None),
    ("which_tonemap_func", str, "gamma", None),
    ("num_pos_freqs", int, -1, None), ("num_viewdir_freqs", int, -1, None),
    ("num_feature_freqs", int, -1, None),
    ("random_sample", str, "none", None),
    ("random_sample_size", int, 1024, None),
    ("color_loss_items", str, None, "+"),
    ("color_loss_weights", float, (1.0,), "+"),
    ("test_color_loss_items", str, None, "+"),
    ("depth_loss_items", str, (), "+"), ("depth_loss_weights", float, (1.0,), "+"),
    ("bg_loss_items", str, (), "+"), ("bg_loss_weights", float, (1.0,), "+"),
    ("zero_one_loss_items", str, (), "+"),
    ("zero_one_loss_weights", float, (1.0,), "+"),
    ("l2_size_loss_items", str, (), "+"),
    ("l2_size_loss_weights", float, (0.0,), "+"),
    ("zero_epsilon", float, 1e-3, None),
    ("sparse_loss_weight", float, 0.0, None),
    ("compute_depth", int, 0, None),
    ("bgmodel", str, "No", None),
    ("visual_items", str, None, "*"),
    ("visual_items_additional", str, (), "+"),
    ("add_shading_dist", int, 0, None),
    ("raydist_mode_unit", int, 0, None),
    # neural points flags
    ("load_points", int, 1, None), ("num_point", int, 8192, None),
    ("construct_res", int, 0, None), ("grid_res", int, 0, None),
    ("cloud_path", str, "", None), ("shpnt_jitter", str, "passfunc", None),
    ("point_noise", str, "", None), ("num_each_depth", int, 1, None),
    ("vscale", int, (2, 2, 2), "+"), ("vsize", float, (0.005, 0.005, 0.005), "+"),
    ("wcoord_query", int, 0, None), ("ranges", float,
     (-100.0, -100.0, -100.0, 100.0, 100.0, 100.0), "+"),
    ("z_depth_dim", int, 400, None), ("max_o", int, None, None),
    ("SR", int, 24, None), ("K", int, 32, None), ("P", int, 16, None),
    ("NN", int, 0, None), ("gpu_maxthr", int, 1024, None),
    ("kernel_size", int, (7, 7, 7), "+"), ("query_size", int, (0, 0, 0), "+"),
    ("radius_limit_scale", float, 5.0, None),
    ("depth_limit_scale", float, 1.3, None),
    ("xyz_grad", int, 0, None), ("feat_grad", int, 1, None),
    ("conf_grad", int, 1, None), ("color_grad", int, 1, None),
    ("dir_grad", int, 0, None), ("bp_embedding_grad", int, 0, None),
    ("feature_init_method", str, "rand", None),
    ("point_features_dim", int, 64, None),
    ("point_conf_mode", str, "0", None), ("point_color_mode", str, "0", None),
    ("point_dir_mode", str, "0", None), ("default_conf", float, -1.0, None),
    ("embedding_size", int, -1, None),
    ("semantic_guidance", int, 0, None),
    # aggregator flags
    ("which_agg_model", str, "viewmlp", None),
    ("agg_distance_kernel", str, "quadric", None),
    ("sh_degree", int, 4, None), ("sh_dist_func", str, "sh_quadric", None),
    ("sh_act", str, "sigmoid", None),
    ("agg_axis_weight", float, None, "+"), ("agg_dist_pers", int, 1, None),
    ("apply_pnt_mask", int, 1, None), ("modulator_concat", int, 0, None),
    ("agg_intrp_order", int, 0, None),
    ("shading_feature_mlp_layer0", int, 0, None),
    ("shading_feature_mlp_layer1", int, 2, None),
    ("shading_feature_mlp_layer2", int, 0, None),
    ("shading_feature_mlp_layer2_bpnet", int, 0, None),
    ("shading_feature_mlp_layer3", int, 0, None),
    ("shading_feature_mlp_layer4", int, 1, None),
    ("shading_feature_mlp_linear", int, 0, None),
    ("shading_feature_num", int, 256, None),
    ("point_hyper_dim", int, 256, None),
    ("shading_alpha_mlp_layer", int, 1, None),
    ("shading_color_mlp_layer", int, 1, None),
    ("shading_color_channel_num", int, 3, None),
    ("num_feat_freqs", int, 0, None), ("num_hyperfeat_freqs", int, 0, None),
    ("dist_xyz_freq", int, 2, None), ("dist_xyz_deno", float, 0.0, None),
    ("weight_xyz_freq", int, 2, None), ("weight_feat_dim", int, 8, None),
    ("agg_weight_norm", int, 1, None), ("view_ori", int, 0, None),
    ("agg_feat_xyz_mode", str, "None", None),
    ("agg_alpha_xyz_mode", str, "None", None),
    ("agg_color_xyz_mode", str, "None", None),
    ("act_type", str, "ReLU", None), ("act_super", int, 1, None),
    # Accepted-for-parity reference flags with no effect here: `prob` is an
    # internal probe toggle the reference flips programmatically
    # (train_ft.py:439/538; our growing probes pass prob to render_rays
    # directly); `pad` only affects the manual_depth_view=-1 learned-depth
    # branch no shipped config uses (mvs_points_model.py:288);
    # `far_plane_shift` likewise (filter_utils.py:272); `neural_point_dir`
    # is declared but never consumed by the reference
    ("prob", int, 0, None), ("pad", int, 24, None),
    ("far_plane_shift", float, None, None),
    ("neural_point_dir", str, None, None),
    # TPU-only perf knobs (no reference counterpart): bf16 attribute gather
    # (+41% render, PERFORMANCE.md) and bf16 shading-MLP matmuls
    ("gather_dtype", str, "float32", None),
    # bf16-table rounding: "stochastic" = unbiased quantization (train-time
    # only; recovers the ~0.5 dB nearest rounding costs when training
    # through a bf16 gather — ops/quant.py)
    ("gather_round", str, "nearest", None),
    # attribute-gather transpose in training: "scatter" = XLA's native
    # scatter-add; "sorted" = sort cotangent rows by point id + segment_sum
    # (kills duplicate-index collisions; A/B via dev_scripts/
    # probe_train_scatter.py); "f32" = scatter with f32 accumulation;
    # "spread" = f32 + collision spreading over copies of the table;
    # "raydedup" = aggregate each ray's duplicate rows (f32, MXU) before a
    # smaller scatter (gvjp_U distinct-id slots per ray)
    ("gather_vjp", str, "scatter", None),
    ("gvjp_U", int, 128, None),
    ("gvjp_batch_U", int, 0, None),
    # eval renders: per-tile dedup'd attribute gather (distinct-id slots
    # per attr_tile-ray tile; 0 = plain gather, -1 = auto: 512 on TPU —
    # raster chunks hold <=491 distinct ids per 64-ray tile at 4.2M and
    # the two-level gather is 2.2x faster, probe_attr4). Overflowing tiles
    # degrade those neighbors and render_image prints a warning.
    ("attr_dedup", int, -1, None),
    ("attr_tile", int, 64, None),
    ("compute_dtype", str, "float32", None),
    # fused Pallas aggregator kernel (PE->block1->alpha->K-reduce in VMEM,
    # ops/fused_agg.py; +11% render): auto = on for TPU backends, off on
    # CPU (interpret-mode compiles are slow); pallas/none force it
    ("fused_mlp", str, "auto", None),
    # gate the in-kernel color head separately (A/B lever; "off" keeps the
    # fused block1+alpha kernel but runs the color branch in XLA)
    ("fused_color", str, "auto", None),
    # backward of the fused kernel: xla recompute (default) or the fused
    # pallas backward kernel; "auto" = xla until the kernel is TPU-measured
    ("fused_bwd", str, "auto", None),
    # eval renders: run the volume march inside the fused kernel too
    # (per-ray output, reduced output dict); "auto" = off until TPU-measured
    ("fused_march", str, "auto", None),
    # render B chunks per lax.map body on the renderer's batch axis
    # (single batched gathers amortize per-gather-op floors); 1 = classic
    # chunk loop. Must divide chunks_per_dispatch (clamped otherwise).
    ("chunk_stack", int, 1, None),
    # KNN select: exact (XLA top_k) | approx (lax.approx_max_k) | fused
    # (Pallas select over the gathered cache rows, ops/fused_knn.py) |
    # auto (fused on TPU with a bf16 cache, exact otherwise)
    ("knn_mode", str, "auto", None),
    # two-level sample compaction (0=off): coarse supervoxel pre-test cuts
    # the dominant per-sample occupancy-gather rows (ops/grid.py GridSpec)
    ("coarse_factor", int, -1, None), ("seg_len", int, 4, None),
    ("seg_cap", int, 32, None),  # coarse_factor -1 = auto: F=4/L=4/C=24
    #                              (TPU A/B +7% render) when the
    #                              conservativeness bound holds; 0 = off
    # JAX profiler trace (xprof): capture steps [profile_start,
    # profile_start+profile_steps) of training into profile_dir
    ("profile_dir", str, "", None), ("profile_start", int, 10, None),
    ("profile_steps", int, 10, None),
    ("cache_dtype", str, "float32", None),
    ("bpnet_dtype", str, "float32", None),
    # batch G training steps into one jitted dispatch (lax.scan) to
    # amortize the fixed host-side enqueue cost (PERFORMANCE.md); exact
    # same math as G sequential steps
    ("steps_per_dispatch", int, 1, None),
    # spatially-sharded scene rendering (parallel/spatial.py): decompose the
    # point cloud + grid + neighborhood cache into N X-axis voxel slabs over
    # N devices (scene memory ~1/N per chip). 0 = replicated. Inference only.
    ("scene_shards", int, 0, None),
    # ray-DP over the device mesh (parallel/sharded.py): shard the rays axis
    # of every train/render batch over N chips, replicate scene + params
    # (GSPMD psums the gradients over ICI). The TPU equivalent of the
    # reference's nn.DataParallel (neural_points_volumetric_model.py:238-245).
    # -1 = all devices; 0/1 = off. Mutually exclusive with --scene_shards.
    ("ray_shards", int, 0, None),
    # DTU (MVSNet-preprocessed) loader
    ("dtu_cam_scale", float, 4.0, None), ("dtu_light_idx", int, 3, None),
    # BPNet flags
    ("predict_semantic", int, 0, None), ("layers_2d", int, 34, None),
    ("bpnet_refresh_every", int, 1, None),
    ("bpnet_aug", int, 0, None),  # train-time aug: 2D blur + 3D elastic
    #                               (reference aug branch; default off like
    #                               the reference's effective config)
    ("classes", int, 20, None), ("arch_3d", str, "MinkUNet18A", None),
    ("bpnetweight", str, "../bpnetInitmodel/bpnet_5cm.pth.tar", None),
    ("bpnet_lr", float, 0.01, None), ("bpnet_momentum", float, 0.9, None),
    ("bpnet_weight_decay", float, 0.0001, None),
    # MVS flags
    ("pre_d_est", str, None, None), ("depth_vid", str, "0", None),
    ("manual_depth_view", int, 0, None), ("manual_std_depth", float, 0.0, None),
    ("depth_conf_thresh", float, None, None), ("geo_cnsst_num", int, 2, None),
    ("depth_occ", int, 0, None), ("depth_grid", int, 128, None),
    ("dprob_thresh", float, 0.8, None), ("num_neighbor", int, 1, None),
    ("mvs_lr", float, 5e-4, None), ("mvs_point_sampler", str,
     "gau_single_sampler", None),
    ("appr_feature_str0", str, ("imgfeat_0_0123", "dir_0", "point_conf"), "+"),
    ("appr_feature_str1", str, ("imgfeat_0_0123", "dir_0", "point_conf"), "+"),
    ("appr_feature_str2", str, ("imgfeat_0_0123", "dir_0", "point_conf"), "+"),
    ("appr_feature_str3", str, ("imgfeat_0_0123", "dir_0", "point_conf"), "+"),
    ("inverse", int, 0, None), ("ref_vid", int, 0, None),
    # dtu_test_inf flags (reference dev_scripts/dtu_test_inf/*.sh): uniform
    # depth-hypothesis spacing in MVSNet inference; source-view combination
    # policy for the DTU per-scene bootstrap
    ("uni_depth", int, 0, None), ("full_comb", int, 0, None),
    # dataset flags
    ("scan", str, "scan1", None), ("init_view_num", int, 3, None),
    ("edge_filter", int, 3, None), ("shape_id", int, 0, None),
    ("trgt_id", int, 0, None), ("num_nn", int, 1, None),
    ("near_plane", float, 0.5, None), ("far_plane", float, 5.0, None),
    ("bg_color", str, "white", None), ("inverse_gamma_image", int, -1, None),
    ("pin_data_in_memory", int, -1, None),
    ("normview", int, 0, None), ("id_range", int, (0, 385, 1), 3),
    ("id_list", int, None, "+"), ("split", str, "train", None),
    ("vox_res", int, 0, None), ("dir_norm", int, 0, None),
    ("train_load_num2", int, 0, None),
    ("img_wh", int, (640, 480), 2), ("testskip", int, 8, None),
    ("half_res", bool, False, "store_true"),
    ("novel_cam_trajectory", str, "0", None),
    ("loss_embedding_l2_weight", float, -1, None),
    ("loss_kld_weight", float, -1, None),
]


class BaseOptions:
    is_train = False

    def __init__(self):
        self.parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        seen = set()
        for name, ty, default, nargs in _F:
            if name in seen:
                continue
            seen.add(name)
            kw = {}
            if nargs == "store_true":
                kw["action"] = "store_true"
            else:
                kw["type"] = ty
                if nargs:
                    kw["nargs"] = nargs
            kw["default"] = default
            self.parser.add_argument(f"--{name}", **kw)

    def parse(self, args=None):
        opt, unknown = self.parser.parse_known_args(args)
        if unknown:
            print(f"[options] ignoring unknown flags: {unknown}")
        opt.is_train = self.is_train
        if opt.query_size and opt.query_size[0] == 0:
            opt.query_size = opt.kernel_size
        self.opt = opt
        return opt

    def save(self, opt):
        """Dump opt.txt like the reference (base_options.py:138-160)."""
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name or "default")
        os.makedirs(expr_dir, exist_ok=True)
        with open(os.path.join(expr_dir, "opt.txt"), "w") as f:
            f.write("------------ Options -------------\n")
            for k, v in sorted(vars(opt).items()):
                f.write(f"{k}: {v}\n")
            f.write("-------------- End ----------------\n")


class TrainOptions(BaseOptions):
    is_train = True


class TestOptions(BaseOptions):
    is_train = False


class EditOptions(BaseOptions):
    is_train = False


def configs_from_opt(opt):
    """opt namespace -> (RenderConfig, TrainConfig, grid kwargs)."""
    from ..models.aggregator import AggregatorConfig
    from ..models.renderer import RenderConfig
    from ..models.train import TrainConfig

    if opt.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError("--compute_dtype must be float32 or bfloat16, "
                         f"got {opt.compute_dtype!r}")
    if opt.gather_dtype not in ("float32", "bfloat16", "int8"):
        # int8: per-channel affine-quantized TRAINING forward gather
        # (renderer.gather_rows_int8); eval renders fall back to bf16
        raise ValueError("--gather_dtype must be float32/bfloat16/int8, "
                         f"got {opt.gather_dtype!r}")
    gr = getattr(opt, "gather_round", "nearest")
    if gr not in ("nearest", "stochastic"):
        raise ValueError(
            f"--gather_round must be nearest or stochastic, got {gr!r}")
    gv = getattr(opt, "gather_vjp", "scatter")
    if opt.gather_dtype == "int8" and gv != "scatter":
        raise ValueError(
            "--gather_dtype int8 carries its own transpose; it composes "
            f"only with --gather_vjp scatter (got {gv!r})")
    if gv not in ("scatter", "sorted", "f32", "spread", "raydedup",
                  "batchdedup"):
        raise ValueError("--gather_vjp must be scatter/sorted/f32/spread/"
                         f"raydedup/batchdedup, got {gv!r}")
    def _resolve_attr_dedup(ad: int) -> int:
        if ad >= 0:
            return ad
        if ad != -1:
            raise ValueError(
                f"--attr_dedup must be -1 (auto) or >= 0, got {ad}")
        import jax
        # auto: the dedup'd two-level gather pays on big tables/raster
        # chunks (probe_attr4: 39 vs 85 ms at 4.2M); CPU tests keep the
        # plain gather (the einsum path is slow in interpret-scale runs).
        # NOTE: auto consults jax.default_backend() at CONFIG-BUILD time —
        # select the backend (jax.config.update("jax_platforms", ...))
        # BEFORE calling configs_from_opt, or pass an explicit value.
        return 512 if jax.default_backend() != "cpu" else 0

    fused = getattr(opt, "fused_mlp", "auto")
    if fused not in ("auto", "pallas", "none"):
        raise ValueError(f"--fused_mlp must be auto/pallas/none, got {fused!r}")
    if fused == "auto":
        import jax
        # "axon" is the remote-TPU platform name; only plain CPU opts out
        fused = "none" if jax.default_backend() == "cpu" else "pallas"
    fc = getattr(opt, "fused_color", "auto")
    if fc not in ("auto", "on", "off"):
        raise ValueError(f"--fused_color must be auto/on/off, got {fc!r}")
    fb = getattr(opt, "fused_bwd", "auto")
    if fb not in ("auto", "pallas", "xla"):
        raise ValueError(f"--fused_bwd must be auto/pallas/xla, got {fb!r}")
    fm = getattr(opt, "fused_march", "auto")
    if fm not in ("auto", "on", "off"):
        raise ValueError(f"--fused_march must be auto/on/off, got {fm!r}")
    knn = getattr(opt, "knn_mode", "auto")
    if knn not in ("auto", "exact", "approx", "fused"):
        raise ValueError(
            f"--knn_mode must be auto/exact/approx/fused, got {knn!r}")
    if knn == "auto":
        import jax
        knn = ("fused" if jax.default_backend() != "cpu"
               and opt.cache_dtype == "bfloat16" else "exact")
    wam = getattr(opt, "which_agg_model", "viewmlp")
    if wam not in ("viewmlp", "viewmlp_yuze"):
        raise ValueError(
            f"--which_agg_model must be viewmlp or viewmlp_yuze, got {wam!r}")
    agg_variant = "yuze" if wam == "viewmlp_yuze" else "default"
    for xyz_flag in ("agg_feat_xyz_mode", "agg_alpha_xyz_mode",
                     "agg_color_xyz_mode"):
        if str(getattr(opt, xyz_flag, "None")) != "None":
            # no reference config sets these (every dev_script passes
            # None), and the reference's own decode crashes for most
            # combinations (per-neighbor pts concatenated into per-ray
            # inputs: point_aggregators.py:720-746 with pts=pts_pnt) —
            # reject explicitly instead of silently ignoring the flag
            raise NotImplementedError(
                f"--{xyz_flag} != None is not supported (unused by every "
                "reference config; the reference decode itself is "
                "inconsistent there)")
    # NOTE agg_intrp_order: the flag default is 0 (flag-surface contract
    # with the reference) but only 1/2 are decodable — the reference's own
    # order-0 decode branch is missing (point_aggregators.py:715/:745
    # if==1/elif==2 -> UnboundLocalError at forward). aggregate() raises
    # the clear error at the same point (first forward), not at config
    # build, so default-flag parses keep working.
    agg = AggregatorConfig(
        point_features_dim=opt.point_features_dim,
        shading_feature_num=opt.shading_feature_num,
        shading_feature_mlp_layer1=opt.shading_feature_mlp_layer1,
        shading_feature_mlp_layer2=opt.shading_feature_mlp_layer2,
        shading_feature_mlp_layer2_bpnet=opt.shading_feature_mlp_layer2_bpnet,
        shading_feature_mlp_layer3=opt.shading_feature_mlp_layer3,
        # layer4/linear are live only in the yuze variant (the reference's
        # main aggregator keeps them commented out; the defaults layer4=1 /
        # linear=0 mirror the reference flag defaults, so they must not leak
        # into the default viewmlp architecture)
        shading_feature_mlp_layer4=(opt.shading_feature_mlp_layer4
                                    if agg_variant == "yuze" else 0),
        shading_feature_mlp_linear=(opt.shading_feature_mlp_linear
                                    if agg_variant == "yuze" else 0),
        agg_variant=agg_variant,
        shading_alpha_mlp_layer=opt.shading_alpha_mlp_layer,
        shading_color_mlp_layer=opt.shading_color_mlp_layer,
        shading_color_channel_num=opt.shading_color_channel_num,
        num_feat_freqs=opt.num_feat_freqs,
        dist_xyz_freq=opt.dist_xyz_freq,
        dist_xyz_deno=opt.dist_xyz_deno,
        num_viewdir_freqs=opt.num_viewdir_freqs,
        agg_dist_pers=opt.agg_dist_pers,
        agg_distance_kernel=opt.agg_distance_kernel,
        agg_intrp_order=opt.agg_intrp_order,
        agg_weight_norm=opt.agg_weight_norm,
        act_type=opt.act_type,
        act_super=opt.act_super,
        predict_semantic=opt.predict_semantic,
        point_color_mode=str(opt.point_color_mode),
        point_dir_mode=str(opt.point_dir_mode),
        axis_weight=(tuple(opt.agg_axis_weight)
                     if opt.agg_axis_weight is not None else None),
        compute_dtype=opt.compute_dtype,
        fused_mlp=fused,
        fused_color=(fc == "on"),  # TPU A/B: in-kernel color is -1.3%
        # auto: the fused Pallas backward measured +7.6% per train step on
        # TPU vs the XLA-recompute backward (probe_train_fused, 79.1 vs
        # 85.1 ms/step; TM 64/96/default within noise) — on wherever the
        # fused forward runs; exact-gradient parity tested on CPU
        fused_bwd=("xla" if fb == "xla"
                   else "pallas" if fb == "pallas"
                   else ("pallas" if fused == "pallas" else "xla")),
        fused_march=(fm == "on"),
    )
    cfg = RenderConfig(
        agg=agg,
        z_depth_dim=opt.z_depth_dim,
        SR=opt.SR, K=opt.K,
        vsize=tuple(opt.vsize),
        radius_limit_scale=opt.radius_limit_scale,
        which_ray_generation=opt.which_ray_generation,
        which_render_func=opt.which_render_func,
        which_blend_func=opt.which_blend_func,
        which_tonemap_func=opt.which_tonemap_func,
        raydist_mode_unit=opt.raydist_mode_unit,
        semantic_guidance=opt.semantic_guidance,
        predict_semantic=opt.predict_semantic,
        gather_dtype=opt.gather_dtype,
        gather_round=getattr(opt, "gather_round", "nearest"),
        gather_vjp=gv,
        gvjp_U=int(getattr(opt, "gvjp_U", 128)),
        gvjp_batch_U=int(getattr(opt, "gvjp_batch_U", 0)),
        attr_dedup=_resolve_attr_dedup(int(getattr(opt, "attr_dedup", -1))),
        attr_tile=int(getattr(opt, "attr_tile", 64)),
        domain_size=float(opt.domain_size),
        shpnt_jitter=opt.shpnt_jitter,
        knn_mode=knn,
        # the reference emits depth when compute_depth OR any depth loss is
        # requested (neural_points_volumetric_model.py:211)
        compute_depth=int(bool(opt.compute_depth)
                          or bool(opt.depth_loss_items)),
    )

    def _broadcast_w(items, weights):
        # 1 weight for N items broadcasts (base_rendering_model.py:238-268)
        items, weights = tuple(items or ()), tuple(weights or ())
        if items and len(weights) == 1 and len(items) > 1:
            weights = weights * len(items)
        return items, weights[:len(items)]

    depth_items, depth_w = _broadcast_w(opt.depth_loss_items,
                                        opt.depth_loss_weights)
    bg_items, bg_w = _broadcast_w(opt.bg_loss_items, opt.bg_loss_weights)
    l2_items, l2_w = _broadcast_w(opt.l2_size_loss_items,
                                  opt.l2_size_loss_weights)
    tcfg = TrainConfig(
        lr=opt.lr, plr=opt.plr, lr_policy=opt.lr_policy,
        lr_decay_iters=opt.lr_decay_iters, lr_decay_exp=opt.lr_decay_exp,
        niter=opt.niter, niter_decay=opt.niter_decay,
        alter_step=opt.alter_step,
        feat_grad=opt.feat_grad, conf_grad=opt.conf_grad,
        color_grad=opt.color_grad, dir_grad=opt.dir_grad,
        xyz_grad=opt.xyz_grad,
        color_loss_items=tuple(opt.color_loss_items or ()),
        color_loss_weights=tuple(opt.color_loss_weights or ()),
        zero_one_loss_items=tuple(opt.zero_one_loss_items or ()),
        zero_one_loss_weights=tuple(opt.zero_one_loss_weights or ()),
        depth_loss_items=depth_items, depth_loss_weights=depth_w,
        bg_loss_items=bg_items, bg_loss_weights=bg_w,
        l2_size_loss_items=l2_items, l2_size_loss_weights=l2_w,
        sparse_loss_weight=opt.sparse_loss_weight,
        zero_epsilon=opt.zero_epsilon,
    )
    grid_kwargs = dict(
        vsize=list(opt.vsize), vscale=list(opt.vscale),
        kernel_size=list(opt.kernel_size),
        # the reference dilates occupancy by QUERY_SIZE and walks neighbor
        # shells by KERNEL_SIZE (query_point_indices_worldcoords.py:797 vs
        # :898); they differ in the ete configs (kernel 5^3, query 3^3)
        dilate_size=(list(opt.query_size)
                     if tuple(opt.query_size) != tuple(opt.kernel_size)
                     else None),
        # None/0 auto-sizes from the actual occupancy (ops/grid.py
        # auto_grid_caps) so 0% of in-range points are unreachable
        max_o=opt.max_o, P=opt.P,
        ranges=(list(opt.ranges) if opt.ranges[0] > -99.0 else None),
        coarse_factor=opt.coarse_factor, seg_len=opt.seg_len,
        seg_cap=opt.seg_cap, cache_dtype=opt.cache_dtype,
    )
    if int(opt.coarse_factor) < 0:
        # auto: two-level coarse occupancy compaction, measured +6.6-7.7%
        # on TPU renders at F=4 L=4 C=24 (dev_scripts/probe_coarse_ab.py).
        # Enabled only when conservative — never misses a flat-path hit —
        # which requires (L-1)/2 * sample_step < F * scaled_vsize
        # (ops/query.py _two_level_hits)
        step = (float(opt.far_plane) - float(opt.near_plane)) \
            / max(int(opt.z_depth_dim), 1)
        vs = float(max(opt.vsize)) * float(max(opt.vscale))
        if step > 0 and 1.5 * step < 4.0 * vs:
            grid_kwargs.update(coarse_factor=4, seg_len=4, seg_cap=24)
        else:
            grid_kwargs.update(coarse_factor=0)
    return cfg, tcfg, grid_kwargs
