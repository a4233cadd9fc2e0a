#!/usr/bin/env bash
# Export the student for deployment (reference exports ONNX; here StableHLO/TFLite)
python export.py --dataroot database/horse2zebra \
  --dataset_mode unaligned \
  --log_dir logs/cycle_gan/horse2zebra/inception/student/2p6B \
  --restore_teacher_G_path logs/cycle_gan/horse2zebra/inception/teacher/checkpoints/best_A_net_G_A.msgpack \
  --pretrained_student_G_path logs/cycle_gan/horse2zebra/inception/student/2p6B/checkpoints/best_net_G.msgpack \
  --export_format stablehlo
