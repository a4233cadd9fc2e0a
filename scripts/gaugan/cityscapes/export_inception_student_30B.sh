#!/usr/bin/env bash
# Export the GauGAN student (30B) for deployment (reference exports ONNX;
# here StableHLO/TFLite — input is the one-hot semantic map + edges)
python export.py --dataroot database/cityscapes-origin \
  --distiller spade --dataset_mode cityscapes \
  --log_dir logs/gaugan/cityscapes/inception/student/30B \
  --restore_teacher_G_path logs/gaugan/cityscapes/inception/teacher/checkpoints/best_net_G.msgpack \
  --pretrained_student_G_path logs/gaugan/cityscapes/inception/student/30B/checkpoints/best_net_G.msgpack \
  --input_nc 35 --contain_dontcare_label \
  --preprocess scale_width --load_size 512 --crop_size 512 --aspect_ratio 2 \
  --export_format stablehlo
