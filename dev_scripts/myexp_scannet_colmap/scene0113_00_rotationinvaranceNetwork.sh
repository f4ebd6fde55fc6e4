#!/bin/bash
# scene0113_00 rotation-invariance-experiment config, mirroring the
# reference's dev_scripts/myexp_scannet_colmap/
# scene0113_00_rotationinvaranceNetwork.sh. Its headline flags are
# shading_feature_mlp_layer3=0 / layer4=1 — but in the reference's SHIPPED
# aggregator block4 is commented out (point_aggregators.py:370-382,677-712),
# so with which_agg_model=viewmlp the flag is inert there and here alike.
# The experiment's actual block4 lives in the (unreferenced)
# point_aggregators_yuze.py module; to run it for real, add
# `--which_agg_model viewmlp_yuze` (implemented with weight-level parity,
# tests/test_aggregator_parity.py).

nrCheckpoint="../checkpoints"
nrDataRoot="../data_src"
name="33-scene0113-30+semantic_guidance_edit"

cd "$(dirname "$0")/../.."

python run/train_ft.py \
  --name "$name" \
  --data_root "${nrDataRoot}/scannet/scans/" \
  --scan "scene0113_00" \
  --dataset_name scannet_ft \
  --checkpoints_dir "${nrCheckpoint}/scannet/" \
  --resume_iter best \
  --load_points 1 --feat_grad 1 --conf_grad 1 --dir_grad 09 --color_grad 1 \
  --vox_res 900 \
  --prune_thresh 0.1 --prune_iter 100000 \
  --feedforward 0 \
  --depth_occ 0 --manual_depth_view 1 --init_view_num 3 \
  --pre_d_est "${nrCheckpoint}/MVSNet/model_000014.ckpt" \
  --depth_conf_thresh 0.8 --geo_cnsst_num 0 --edge_filter 10 \
  --appr_feature_str0 imgfeat_0_0123 dir_0 point_conf \
  --point_conf_mode 1 --point_dir_mode 1 --point_color_mode 1 \
  --default_conf -1 \
  --agg_feat_xyz_mode None --agg_alpha_xyz_mode None --agg_color_xyz_mode None \
  --feature_init_method rand --agg_axis_weight 1. 1. 1. \
  --agg_dist_pers 20 --radius_limit_scale 4 --depth_limit_scale 0 \
  --vscale 2 2 2 --kernel_size 3 3 3 --query_size 3 3 3 \
  --vsize 0.008 0.008 0.008 --wcoord_query 1 \
  --z_depth_dim 400 --max_o 610000 \
  --ranges -10.0 -10.0 -10.0 10.0 10.0 10.0 \
  --SR 24 --K 8 --P 32 --NN 2 \
  --act_type LeakyReLU \
  --agg_intrp_order 2 --agg_distance_kernel linear \
  --point_features_dim 32 --shpnt_jitter passfunc \
  --which_agg_model viewmlp --apply_pnt_mask 1 \
  --shading_feature_mlp_layer0 1 --shading_feature_mlp_layer1 2 \
  --shading_feature_mlp_layer2 0 \
  --shading_feature_mlp_layer3 0 \
  --shading_feature_mlp_layer4 1 \
  --shading_alpha_mlp_layer 1 --shading_color_mlp_layer 4 \
  --shading_feature_num 256 --dist_xyz_freq 5 --num_feat_freqs 3 \
  --dist_xyz_deno 0 \
  --raydist_mode_unit 1 \
  --near_plane 0.1 --far_plane 8.0 \
  --which_ray_generation near_far_linear \
  --dir_norm 0 \
  --which_tonemap_func off --which_render_func radiance \
  --which_blend_func alpha --out_channels 4 \
  --num_pos_freqs 10 --num_viewdir_freqs 4 \
  --random_sample random --random_sample_size 32 --batch_size 1 \
  --plr 0.002 --lr 0.0005 \
  --lr_policy iter_exponential_decay --lr_decay_iters 1000000 \
  --lr_decay_exp 0.1 \
  --gpu_ids 0 \
  --save_iter_freq 5000 --save_point_freq 10000 --maximum_step 500000 \
  --niter 10000 --niter_decay 10000 --n_threads 2 \
  --train_and_test 0 --test_num 25 --test_freq 500000 --print_freq 100 \
  --test_num_step 50 \
  --prob_freq 500001 --prob_num_step 100 \
  --prob_kernel_size 3 3 3 1 1 1 --prob_tiers 40000 120000 \
  --prob_thresh 0.7 --prob_mul 0.4 \
  --zero_one_loss_items conf_coefficient --zero_one_loss_weights 0.0001 \
  --sparse_loss_weight 0 \
  --color_loss_weights 1.0 0.0 0.0 \
  --color_loss_items ray_masked_coarse_raycolor ray_miss_coarse_raycolor coarse_raycolor \
  --test_color_loss_items coarse_raycolor ray_miss_coarse_raycolor ray_masked_coarse_raycolor \
  --visual_items coarse_raycolor gt_image \
  --bg_color white \
  --split train \
  --train_step 5 \
  --img_wh 640 480
