#!/usr/bin/env bash
# Evaluate the distilled GauGAN student (30B): shrink-latency benchmark +
# MACs/params + FID + mIoU + image dumps, then KID over the dumps
python profile.py --dataroot database/cityscapes-origin \
  --distiller spade --dataset_mode cityscapes \
  --log_dir logs/gaugan/cityscapes/inception/student/30B/eval \
  --restore_teacher_G_path logs/gaugan/cityscapes/inception/teacher/checkpoints/best_net_G.msgpack \
  --pretrained_student_G_path logs/gaugan/cityscapes/inception/student/30B/checkpoints/best_net_G.msgpack \
  --real_stat_path real_stat/cityscapes_A.npz \
  --drn_path drn-d-105_ms_cityscapes.pth \
  --cityscapes_path database/cityscapes-origin \
  --table_path datasets/table.txt \
  --input_nc 35 --contain_dontcare_label \
  --preprocess scale_width --load_size 512 --crop_size 512 --aspect_ratio 2 \
  --teacher_ngf 64 --student_ngf 48 \
  --teacher_norm_G spadesyncbatch3x3 --student_norm_G spadesyncbatch3x3 \
  --eval_batch_size 2 \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops 3e10
python tools/kid_score.py \
  --real logs/gaugan/cityscapes/inception/student/30B/eval/eval/latest/real \
  --fake logs/gaugan/cityscapes/inception/student/30B/eval/eval/latest/Sfake || true
