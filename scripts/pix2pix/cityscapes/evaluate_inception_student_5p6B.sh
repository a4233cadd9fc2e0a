#!/usr/bin/env bash
# Evaluate the distilled pix2pix-cityscapes student: shrink-latency benchmark
# + MACs/params + FID + mIoU + image dumps, then KID over the dumps
python profile.py --dataroot database/cityscapes \
  --distiller inception \
  --direction BtoA \
  --log_dir logs/pix2pix/cityscapes/inception/student/5p6B/eval \
  --restore_teacher_G_path logs/pix2pix/cityscapes/inception/teacher/checkpoints/best_net_G.msgpack \
  --pretrained_student_G_path logs/pix2pix/cityscapes/inception/student/5p6B/checkpoints/best_net_G.msgpack \
  --real_stat_path real_stat/cityscapes_A.npz \
  --drn_path drn-d-105_ms_cityscapes.pth \
  --cityscapes_path database/cityscapes-origin \
  --table_path datasets/table.txt \
  --norm batch --norm_affine --norm_affine_D --norm_track_running_stats \
  --eval_batch_size 2 \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops 5.6e9
python tools/kid_score.py \
  --real logs/pix2pix/cityscapes/inception/student/5p6B/eval/eval/latest/real \
  --fake logs/pix2pix/cityscapes/inception/student/5p6B/eval/eval/latest/Sfake || true
