#!/bin/bash
# Shared body for the dtu_test_inf family (reference
# dev_scripts/dtu_test_inf/inftest_scan{1,8,21,103,114}.sh): per-scene DTU
# inference-test — bootstrap the point cloud from pretrained-MVSNet depth
# (load_points=0, manual_depth_view=1, cross-view geometric-consistency
# filtering), warm-start the shading MLPs from the ete feed-forward
# checkpoint, run zero training steps (maximum_step=0) and render the test
# split. Callers set: name, scan, geo_cnsst_num, depth_conf_thresh.
#
# NOTE the reference selects dataset_name='dtu_ft', a module its repo does
# not ship; here dtu_ft is implemented (sgnerf_tpu/data/dtu_ft_dataset.py,
# MVSNet-preprocessed layout).

nrCheckpoint="../checkpoints"
nrDataRoot="../data_src"

cd "$(dirname "$0")/../.."

python run/train_ft.py \
  --name "$name" \
  --data_root "${nrDataRoot}/dtu" \
  --scan "$scan" \
  --dataset_name dtu_ft \
  --model mvs_points_volumetric \
  --checkpoints_dir "${nrCheckpoint}/dtu/" \
  --resume_dir "${nrCheckpoint}/init/dtu_dgt_d012_img0123_conf_color_dir_agg2" \
  --resume_iter best \
  --load_points 0 --feat_grad 1 --conf_grad 1 --dir_grad 1 --color_grad 1 \
  --vox_res 800 --normview 2 --full_comb 2 \
  --default_conf 1 \
  --prune_thresh 0.1 --prune_iter 10000 \
  --feedforward 0 --ref_vid 0 --bgmodel plane \
  --depth_occ 1 --depth_vid 0 --trgt_id 3 \
  --manual_depth_view 1 --init_view_num 3 \
  --pre_d_est "${nrCheckpoint}/MVSNet/model_000015.ckpt" \
  --manual_std_depth 0.0 \
  --depth_conf_thresh "$depth_conf_thresh" \
  --uni_depth 1 \
  --geo_cnsst_num "$geo_cnsst_num" \
  --appr_feature_str0 imgfeat_0_0123 dir_0 point_conf \
  --point_conf_mode 01 --point_dir_mode 01 --point_color_mode 01 \
  --agg_feat_xyz_mode None --agg_alpha_xyz_mode None --agg_color_xyz_mode None \
  --feature_init_method rand --agg_axis_weight 1. 1. 1. \
  --agg_dist_pers 20 --radius_limit_scale 0 --depth_limit_scale 0 \
  --vscale 2 2 1 --kernel_size 3 3 3 \
  --SR 40 --K 8 --P 20 --NN 2 \
  --act_type LeakyReLU \
  --agg_intrp_order 1 --agg_distance_kernel linear \
  --weight_xyz_freq 2 --weight_feat_dim 8 \
  --point_features_dim 63 --shpnt_jitter uniform \
  --which_agg_model viewmlp --apply_pnt_mask 1 \
  --shading_feature_mlp_layer1 2 --shading_feature_mlp_layer2 0 \
  --shading_feature_mlp_layer3 2 \
  --shading_alpha_mlp_layer 1 --shading_color_mlp_layer 4 \
  --shading_feature_num 256 --dist_xyz_freq 5 --num_feat_freqs 3 \
  --dist_xyz_deno 0 \
  --raydist_mode_unit 1 \
  --near_plane 2.0 --far_plane 4.725 \
  --which_ray_generation near_far_linear \
  --domain_size 1 --dir_norm 0 \
  --which_tonemap_func off --which_render_func radiance \
  --which_blend_func alpha --out_channels 4 \
  --num_pos_freqs 10 --num_viewdir_freqs 4 \
  --random_sample random --random_sample_size 48 --batch_size 1 \
  --plr 0.002 --lr 0.001 \
  --lr_policy iter_exponential_decay --lr_decay_iters 30000 \
  --lr_decay_exp 0.1 \
  --gpu_ids 0 \
  --save_iter_freq 10000 --save_point_freq 308000 --maximum_step 0 \
  --niter 10000 --niter_decay 10000 --n_threads 2 \
  --pin_data_in_memory 1 \
  --train_and_test 0 --test_num 10 --test_freq 1000 --print_freq 40 \
  --test_num_step 1 \
  --prob_freq 2000 --prob_num_step 1 \
  --zero_epsilon 1e-3 \
  --zero_one_loss_items conf_coefficient --zero_one_loss_weights 0.0001 \
  --sparse_loss_weight 0 \
  --color_loss_weights 1.0 0.0 0.0 \
  --color_loss_items ray_masked_coarse_raycolor ray_miss_coarse_raycolor ray_depth_masked_coarse_raycolor \
  --test_color_loss_items ray_depth_masked_coarse_raycolor \
  --visual_items ray_depth_masked_coarse_raycolor ray_depth_masked_gt_image \
  --bg_color black \
  --split train \
  --ranges -1.0 -1.0 2.0 1.0 1.0 6.0
