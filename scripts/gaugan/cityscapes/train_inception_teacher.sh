#!/usr/bin/env bash
# GauGAN cityscapes teacher (reference scripts/gaugan/cityscapes)
python train.py --dataroot database/cityscapes-origin \
  --model spade --dataset_mode cityscapes \
  --log_dir logs/gaugan/cityscapes/inception/teacher \
  --real_stat_path real_stat/cityscapes_A.npz \
  --drn_path drn-d-105_ms_cityscapes.pth \
  --cityscapes_path database/cityscapes-origin \
  --table_path datasets/table.txt \
  --input_nc 35 --contain_dontcare_label \
  --preprocess scale_width --load_size 512 --crop_size 512 --aspect_ratio 2 \
  --ngf 64 --batch_size 16 \
  --init_type xavier \
  --nepochs 100 --nepochs_decay 100 \
  --norm_G spadesyncbatch3x3 --netD multi_scale \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --vgg_path vgg19.pth
