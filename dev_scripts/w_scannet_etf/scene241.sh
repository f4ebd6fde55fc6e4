#!/bin/bash
# Plain Point-NeRF ScanNet fine-tuning (no semantic branch), mirroring the
# reference's dev_scripts/w_scannet_etf/scene241.sh flag for flag: depth-
# unprojected bootstrap (load_points=2), all point attributes trainable,
# warm-start from the ete feed-forward DTU checkpoint. NOTE: no outer
# restart loop — point growing is in-process here.

nrCheckpoint="../checkpoints"
nrDataRoot="../data_src"
name='scene241'

cd "$(dirname "$0")/../.."

python run/train_ft.py \
  --name "$name" \
  --data_root "${nrDataRoot}/scannet/scans/" \
  --scan "scene0241_01" \
  --dataset_name scannet_ft \
  --model mvs_points_volumetric \
  --checkpoints_dir "${nrCheckpoint}/scannet/" \
  --resume_dir "${nrCheckpoint}/init/dtu_dgt_d012_img0123_conf_agg2_32_dirclr20" \
  --resume_iter best \
  --load_points 2 --feat_grad 1 --conf_grad 1 --dir_grad 1 --color_grad 1 \
  --vox_res 900 --normview 0 \
  --prune_thresh -1 --prune_iter -1 \
  --feedforward 0 --ref_vid 0 --bgmodel no \
  --depth_occ 0 --depth_vid 0 --trgt_id 0 \
  --manual_depth_view 1 --init_view_num 3 \
  --pre_d_est "${nrCheckpoint}/MVSNet/model_000014.ckpt" \
  --manual_std_depth 0.0 --depth_conf_thresh 0.8 --geo_cnsst_num 0 \
  --edge_filter 10 \
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
  --SR 24 --K 8 --P 26 --NN 2 \
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
  --random_sample random --random_sample_size 28 --batch_size 1 \
  --plr 0.002 --lr 0.0005 \
  --lr_policy iter_exponential_decay --lr_decay_iters 1000000 \
  --lr_decay_exp 0.1 \
  --gpu_ids 0 \
  --save_iter_freq 10000 --save_point_freq 10000 --maximum_step 200000 \
  --niter 10000 --niter_decay 10000 --n_threads 2 \
  --pin_data_in_memory 1 \
  --train_and_test 0 --test_num 10 --test_freq 100 --print_freq 40 \
  --test_num_step 50 \
  --prob_freq 10000 --prob_num_step 100 \
  --prob_kernel_size 3 3 3 1 1 1 --prob_tiers 40000 120000 \
  --prob_mode 0 --prob_thresh 0.7 --prob_mul 0.4 \
  --zero_epsilon 1e-3 \
  --zero_one_loss_items conf_coefficient --zero_one_loss_weights 0.0001 \
  --sparse_loss_weight 0 \
  --color_loss_weights 1.0 0.0 0.0 \
  --color_loss_items ray_masked_coarse_raycolor ray_miss_coarse_raycolor coarse_raycolor \
  --test_color_loss_items coarse_raycolor ray_miss_coarse_raycolor ray_masked_coarse_raycolor \
  --visual_items coarse_raycolor gt_image \
  --bg_color white \
  --split train \
  --img_wh 640 480
