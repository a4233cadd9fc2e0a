#!/usr/bin/env bash
# Export the map2sat student for deployment (reference exports ONNX;
# here StableHLO/TFLite)
python export.py --dataroot database/maps \
  --direction BtoA \
  --log_dir logs/pix2pix/map2sat/inception/student/4p6B \
  --restore_teacher_G_path logs/pix2pix/map2sat/inception/teacher/checkpoints/best_net_G.msgpack \
  --pretrained_student_G_path logs/pix2pix/map2sat/inception/student/4p6B/checkpoints/best_net_G.msgpack \
  --norm batch --norm_affine --norm_track_running_stats \
  --export_format stablehlo
