#!/usr/bin/env bash
# CycleGAN teacher for zebra2horse — the same dual-direction horse2zebra run
# (reference scripts/cycle_gan/zebra2horse/train_inception_teacher.sh logs to
# the horse2zebra dir on purpose: one teacher serves both directions)
python train.py --dataroot database/horse2zebra \
  --model cycle_gan \
  --log_dir logs/cycle_gan/horse2zebra/inception/teacher \
  --real_stat_A_path real_stat/horse2zebra_A.npz \
  --real_stat_B_path real_stat/horse2zebra_B.npz \
  --batch_size 32 \
  --nepochs 500 --nepochs_decay 500 \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 \
  --kernel_sizes 1 3 5
