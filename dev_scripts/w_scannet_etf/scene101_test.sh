#!/bin/bash
# Evaluation of the w_scannet_etf scene101 run (reference
# dev_scripts/w_scannet_etf/scene101.sh and scene101_test.sh — in the reference this family's
# scene101 scripts are both evaluation configs): full test-split render.

nrCheckpoint="../checkpoints"
nrDataRoot="../data_src"
name='scene101'

cd "$(dirname "$0")/../.."

python run/test_ft.py \
  --name "$name" \
  --data_root "${nrDataRoot}/scannet/scans/" \
  --scan "scene0101_04" \
  --dataset_name scannet_ft \
  --model mvs_points_volumetric \
  --checkpoints_dir "${nrCheckpoint}/scannet/" \
  --resume_dir "${nrCheckpoint}/init/dtu_dgt_d012_img0123_conf_agg2_32_dirclr20" \
  --resume_iter 200000 \
  --normview 0 \
  --point_conf_mode 1 --point_dir_mode 1 --point_color_mode 1 \
  --agg_feat_xyz_mode None --agg_alpha_xyz_mode None --agg_color_xyz_mode None \
  --feature_init_method rand --agg_axis_weight 1. 1. 1. \
  --agg_dist_pers 20 --radius_limit_scale 4 --depth_limit_scale 0 \
  --vscale 2 2 2 --kernel_size 3 3 3 --query_size 3 3 3 \
  --vsize 0.008 0.008 0.008 --wcoord_query 1 \
  --z_depth_dim 400 --max_o 2000000 \
  --ranges -10.0 -10.0 -10.0 10.0 10.0 10.0 \
  --SR 24 --K 8 --P 30 --NN 2 \
  --act_type LeakyReLU \
  --agg_intrp_order 2 --agg_distance_kernel linear \
  --weight_xyz_freq 2 --weight_feat_dim 8 \
  --point_features_dim 32 --shpnt_jitter passfunc \
  --which_agg_model viewmlp --apply_pnt_mask 1 \
  --shading_feature_mlp_layer0 1 --shading_feature_mlp_layer1 2 \
  --shading_feature_mlp_layer2 0 --shading_feature_mlp_layer3 2 \
  --shading_alpha_mlp_layer 1 --shading_color_mlp_layer 4 \
  --shading_feature_num 256 --dist_xyz_freq 5 --num_feat_freqs 3 \
  --dist_xyz_deno 0 \
  --raydist_mode_unit 1 \
  --near_plane 0.1 --far_plane 8.0 \
  --which_ray_generation near_far_linear \
  --domain_size 1 --dir_norm 0 \
  --which_tonemap_func off --which_render_func radiance \
  --which_blend_func alpha --out_channels 4 \
  --num_pos_freqs 10 --num_viewdir_freqs 4 \
  --random_sample random --random_sample_size 56 --batch_size 1 \
  --gpu_ids 0 \
  --n_threads 2 --pin_data_in_memory 1 \
  --test_num_step 1 \
  --color_loss_weights 1.0 0.0 0.0 \
  --color_loss_items ray_masked_coarse_raycolor ray_miss_coarse_raycolor coarse_raycolor \
  --test_color_loss_items coarse_raycolor ray_miss_coarse_raycolor ray_masked_coarse_raycolor \
  --visual_items coarse_raycolor gt_image \
  --bg_color white \
  --split train \
  --img_wh 640 480
