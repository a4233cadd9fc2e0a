#!/usr/bin/env bash
# Evaluate the distilled student: shrink-latency benchmark + MACs/params + FID
python profile.py --dataroot database/horse2zebra \
  --dataset_mode unaligned \
  --gan_mode lsgan \
  --log_dir logs/cycle_gan/horse2zebra/inception/student/2p6B/eval \
  --restore_teacher_G_path logs/cycle_gan/horse2zebra/inception/teacher/checkpoints/best_A_net_G_A.msgpack \
  --pretrained_student_G_path logs/cycle_gan/horse2zebra/inception/student/2p6B/checkpoints/best_net_G.msgpack \
  --real_stat_path real_stat/horse2zebra_B.npz \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops 2.6e9
# KID (reference runs metric/kid_score.py here)
python tools/kid_score.py --real database/horse2zebra/valB \
  --fake logs/cycle_gan/horse2zebra/inception/student/2p6B/eval/eval/latest/Sfake || true
