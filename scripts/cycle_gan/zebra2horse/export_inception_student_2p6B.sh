#!/usr/bin/env bash
# Export the zebra2horse student for deployment (reference exports ONNX;
# here StableHLO/TFLite)
python export.py --dataroot database/horse2zebra \
  --dataset_mode unaligned \
  --direction BtoA \
  --log_dir logs/cycle_gan/zebra2horse/inception/student/2p6B \
  --restore_teacher_G_path logs/cycle_gan/horse2zebra/inception/teacher/checkpoints/best_B_net_G_B.msgpack \
  --pretrained_student_G_path logs/cycle_gan/zebra2horse/inception/student/2p6B/checkpoints/best_net_G.msgpack \
  --export_format stablehlo
