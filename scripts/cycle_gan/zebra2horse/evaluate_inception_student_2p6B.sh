#!/usr/bin/env bash
# Evaluate the distilled zebra2horse student: shrink-latency benchmark +
# MACs/params + FID + image dumps, then KID over the dumps
python profile.py --dataroot database/horse2zebra \
  --dataset_mode unaligned \
  --distiller inception \
  --gan_mode lsgan \
  --direction BtoA \
  --log_dir logs/cycle_gan/zebra2horse/inception/student/2p6B/eval \
  --restore_teacher_G_path logs/cycle_gan/horse2zebra/inception/teacher/checkpoints/best_B_net_G_B.msgpack \
  --pretrained_student_G_path logs/cycle_gan/zebra2horse/inception/student/2p6B/checkpoints/best_net_G.msgpack \
  --real_stat_path real_stat/horse2zebra_A.npz \
  --norm syncbatch \
  --norm_affine --norm_affine_D \
  --eval_batch_size 2 \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops 2.6e9
# KID (reference runs metric/kid_score.py here)
python tools/kid_score.py --real database/horse2zebra/valA \
  --fake logs/cycle_gan/zebra2horse/inception/student/2p6B/eval/eval/latest/Sfake || true
