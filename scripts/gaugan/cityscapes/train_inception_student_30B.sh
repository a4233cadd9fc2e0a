#!/usr/bin/env bash
# KA-distill the GauGAN student at the 3e10-MAC budget
python distill.py --dataroot database/cityscapes-origin \
  --distiller spade --dataset_mode cityscapes \
  --log_dir logs/gaugan/cityscapes/inception/student/30B \
  --restore_teacher_G_path logs/gaugan/cityscapes/inception/teacher/checkpoints/best_net_G.msgpack \
  --restore_pretrained_G_path logs/gaugan/cityscapes/inception/teacher/checkpoints/best_net_G.msgpack \
  --restore_D_path logs/gaugan/cityscapes/inception/teacher/checkpoints/best_net_D.msgpack \
  --input_nc 35 --contain_dontcare_label \
  --preprocess scale_width --load_size 512 --crop_size 512 --aspect_ratio 2 \
  --teacher_ngf 64 --student_ngf 48 \
  --teacher_norm_G spadesyncbatch3x3 --student_norm_G spadesyncbatch3x3 \
  --netD multi_scale --init_type xavier \
  --real_stat_path real_stat/cityscapes_A.npz \
  --drn_path drn-d-105_ms_cityscapes.pth \
  --cityscapes_path database/cityscapes-origin \
  --table_path datasets/table.txt \
  --batch_size 16 \
  --nepochs 100 --nepochs_decay 100 \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --lambda_distill 0.5 \
  --prune_cin_lb 16 \
  --target_flops 3e10 \
  --distill_G_loss_type ka \
  --vgg_path vgg19.pth
