#!/usr/bin/env bash
# Evaluate the distilled map2sat student: shrink-latency benchmark +
# MACs/params + FID + image dumps, then KID over the dumps
python profile.py --dataroot database/maps \
  --distiller inception \
  --direction BtoA \
  --log_dir logs/pix2pix/map2sat/inception/student/4p6B/eval \
  --restore_teacher_G_path logs/pix2pix/map2sat/inception/teacher/checkpoints/best_net_G.msgpack \
  --pretrained_student_G_path logs/pix2pix/map2sat/inception/student/4p6B/checkpoints/best_net_G.msgpack \
  --real_stat_path real_stat/maps_A.npz \
  --norm batch --norm_affine --norm_affine_D --norm_track_running_stats \
  --eval_batch_size 2 \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops 4.6e9
python tools/kid_score.py \
  --real logs/pix2pix/map2sat/inception/student/4p6B/eval/eval/latest/real \
  --fake logs/pix2pix/map2sat/inception/student/4p6B/eval/eval/latest/Sfake || true
