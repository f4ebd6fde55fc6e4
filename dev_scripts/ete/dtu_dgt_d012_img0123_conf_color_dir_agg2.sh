#!/bin/bash
# Feed-forward DTU training, "conf/color/dir in features AND branches"
# variant (point_*_mode 01), mirroring the reference's
# dev_scripts/ete/dtu_dgt_d012_img0123_conf_color_dir_agg2.sh. This is the
# config whose checkpoint seeds the w_scannet_etf and dtu_test_inf runs.
# NOTE: the reference leaves wcoord_query=0 (per-frame perspective-space
# querier) here; our joint feed-forward step queries over the world-space
# grid (the perspective path exists for per-scene rendering:
# models/renderer.py render_rays_perspective), so wcoord_query is set to 1.

nrCheckpoint="../checkpoints"
nrDataRoot="../data_src"
name='dtu_dgt_d012_img0123_conf_color_dir_agg2'

cd "$(dirname "$0")/../.."

python run/train.py \
  --name "$name" \
  --data_root "${nrDataRoot}/dtu" \
  --dataset_name dtu \
  --model mvs_points_volumetric \
  --checkpoints_dir "${nrCheckpoint}/init" \
  --resume_dir "${nrCheckpoint}/init/${name}" \
  --resume_iter latest \
  --load_points 0 --feedforward 1 --vox_res 0 \
  --ref_vid 0 --bgmodel no --depth_occ 0 \
  --depth_vid 012 --trgt_id 3 \
  --manual_depth_view 0 --init_view_num 3 \
  --pre_d_est "${nrCheckpoint}/MVSNet/model_000015.ckpt" \
  --manual_std_depth 0.0 --depth_conf_thresh 0.1 --geo_cnsst_num 0 \
  --appr_feature_str0 imgfeat_0_0123 dir_0 point_conf \
  --appr_feature_str1 imgfeat_1_0123 dir_1 point_conf \
  --appr_feature_str2 imgfeat_2_0123 dir_2 point_conf \
  --appr_feature_str3 dir_3 point_conf \
  --point_conf_mode 01 --point_dir_mode 01 --point_color_mode 01 \
  --agg_feat_xyz_mode None --agg_alpha_xyz_mode None --agg_color_xyz_mode None \
  --feature_init_method rand --agg_axis_weight 1. 1. 1. \
  --agg_dist_pers 20 --radius_limit_scale 0 --depth_limit_scale 0 \
  --vscale 2 2 1 --kernel_size 3 3 3 --query_size 3 3 3 \
  --vsize 0.002 0.002 0.002 --wcoord_query 1 \
  --z_depth_dim 400 --max_o 400000 \
  --SR 40 --K 8 --P 20 --NN 2 \
  --act_type LeakyReLU \
  --agg_intrp_order 2 --agg_distance_kernel linear \
  --weight_xyz_freq 2 --weight_feat_dim 8 \
  --point_features_dim 32 --shpnt_jitter uniform \
  --which_agg_model viewmlp --apply_pnt_mask 1 \
  --shading_feature_mlp_layer0 1 --shading_feature_mlp_layer1 2 \
  --shading_feature_mlp_layer2 0 --shading_feature_mlp_layer3 2 \
  --shading_alpha_mlp_layer 1 --shading_color_mlp_layer 4 \
  --shading_feature_num 256 --dist_xyz_freq 5 --num_feat_freqs 3 \
  --dist_xyz_deno 0 \
  --raydist_mode_unit 1 \
  --near_plane 2.0 --far_plane 6.0 \
  --which_ray_generation near_far_linear \
  --domain_size 1 --dir_norm 0 \
  --which_tonemap_func off --which_render_func radiance \
  --which_blend_func alpha --out_channels 4 \
  --num_pos_freqs 10 --num_viewdir_freqs 4 \
  --random_sample random --random_sample_size 70 --batch_size 1 \
  --lr 0.0005 \
  --lr_policy iter_exponential_decay --lr_decay_iters 500000 \
  --gpu_ids 0 \
  --save_iter_freq 30184 --save_point_freq 30184 --maximum_step 250000 \
  --niter 10000 --niter_decay 10000 --n_threads 2 \
  --pin_data_in_memory 1 \
  --train_and_test 0 --test_freq 30184 --print_freq 40 \
  --test_num_step 15 \
  --zero_epsilon 1e-3 \
  --color_loss_weights 0.0 1.0 \
  --color_loss_items ray_masked_coarse_raycolor ray_depth_masked_coarse_raycolor \
  --test_color_loss_items coarse_raycolor ray_masked_coarse_raycolor ray_depth_masked_coarse_raycolor \
  --visual_items coarse_raycolor ray_masked_coarse_raycolor ray_depth_masked_coarse_raycolor gt_image gt_image_ray_masked ray_depth_masked_gt_image \
  --bg_color black \
  --split train \
  --ranges -1.0 -1.0 2.0 1.0 1.0 6.0
