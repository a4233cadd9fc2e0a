#!/usr/bin/env bash
# pix2pix-cityscapes (BtoA) quality loop with a LIVE mIoU judge — the
# reference's cityscapes metric pathway (metric/mIoU_score.py:209-247,
# best-mIoU checkpointing trainer.py:141-155) exercised end to end:
#
#   synth cityscapes -> aligned label|photo pairs + mIoU table
#   -> train a reduced DRNSeg judge on the photos->trainIds task
#      (tools/train_synth_drn.py; a random-weight judge would make mIoU
#      meaningless — a trained one makes trajectories real, the same way
#      the random-projection FID judge does for distances)
#   -> teacher train (label render -> photo) with FID + mIoU eval
#   -> shrink + KA distill with FID + mIoU eval
#   -> profile verb (final sweep incl. mIoU) -> export
#
# Usage: bash tools/run_miou_quality_loop.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${QL_PYTHON:-python}

WORK=${1:-/tmp/miou_quality}
CS=$WORK/synth_cityscapes          # cityscapes-format tree (labels live here)
DATA=$WORK/p2p_cityscapes          # aligned dataroot ('cityscapes' in name
                                   # arms the reference mIoU guard)
JUDGE=$WORK/judges/pt_inception_random.pth
DRN=$WORK/drn_synth.msgpack
EPOCHS=${QL_EPOCHS:-15}
DECAY=${QL_DECAY:-15}
DEPOCHS=${QL_DEPOCHS:-20}
DDECAY=${QL_DDECAY:-20}
BATCH=${QL_BATCH:-16}
DBATCH=${QL_DBATCH:-32}
SIZE=${QL_SIZE:-256}
NTRAIN=${QL_NTRAIN:-300}
NVAL=${QL_NVAL:-32}
CLASSES=${QL_CLASSES:-8}
NGF=${QL_NGF:-64}
FLOPS=${QL_FLOPS:-5.6e9}
CDT=${QL_CDT:-bfloat16}
DRN_STEPS=${QL_DRN_STEPS:-400}
COMMON="--dataset_mode aligned --direction BtoA \
  --crop_size $SIZE --load_size $SIZE \
  --gan_mode hinge \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --drn_path $DRN --table_path $DATA/table.txt --cityscapes_path $CS"

mkdir -p "$WORK"

[ -d "$CS/gtFine/train" ] || $PY tools/make_synth_cityscapes.py \
  --out "$CS" --n "$NTRAIN" --n_val "$NVAL" \
  --height 128 --width 256 --classes "$CLASSES"
[ -f "$DATA/table.txt" ] || $PY tools/make_p2p_cityscapes.py \
  --data "$CS" --out "$DATA" --size "$SIZE" --classes "$CLASSES"
[ -f "$DRN" ] || $PY tools/train_synth_drn.py \
  --data "$CS" --out "$DRN" --classes "$CLASSES" --steps "$DRN_STEPS" \
  | tee "$WORK/drn_train.log"
[ -f "$JUDGE" ] || $PY tools/make_fixtures.py judges --out "$WORK/judges"

# real FID statistics over the val photos (the BtoA target side)
[ -f "$WORK/real_stat.npz" ] || $PY get_real_stat.py \
  --dataroot "$DATA" --dataset_mode single --phase valA \
  --output_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --crop_size "$SIZE" --load_size "$SIZE"

# teacher: label render -> photo, FID + mIoU evaluated per save_epoch_freq,
# best checkpoint tracked on the combined is_best flag (reference
# trainer.py:141-155 semantics)
[ -f "$WORK/teacher/checkpoints/latest_net_G.msgpack" ] || \
$PY train.py --dataroot "$DATA" \
  --model pix2pix $COMMON \
  --log_dir "$WORK/teacher" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --batch_size "$BATCH" \
  --ngf "$NGF" \
  --nepochs "$EPOCHS" --nepochs_decay "$DECAY" \
  --save_epoch_freq 5 \
  --compute_dtype "$CDT"

TCKPT="$WORK/teacher/checkpoints/best_net_G.msgpack"
[ -f "$TCKPT" ] || TCKPT="$WORK/teacher/checkpoints/latest_net_G.msgpack"

[ -f "$WORK/student/checkpoints/latest_net_G.msgpack" ] || \
$PY distill.py --dataroot "$DATA" \
  --distiller inception $COMMON \
  --log_dir "$WORK/student" \
  --restore_teacher_G_path "$TCKPT" \
  --restore_pretrained_G_path "$TCKPT" \
  --restore_D_path "${TCKPT/net_G/net_D}" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --nepochs "$DEPOCHS" --nepochs_decay "$DDECAY" \
  --teacher_ngf "$NGF" --student_ngf 32 --ndf 128 \
  --batch_size "$DBATCH" \
  --eval_batch_size 16 \
  --save_epoch_freq 5 \
  --lambda_distill 0.5 \
  --lambda_recon 100 \
  --prune_cin_lb 16 \
  --target_flops "$FLOPS" \
  --distill_G_loss_type ka \
  --compute_dtype "$CDT"

SCKPT="$WORK/student/checkpoints/best_net_G.msgpack"
[ -f "$SCKPT" ] || SCKPT="$WORK/student/checkpoints/latest_net_G.msgpack"

[ -d "$WORK/eval/eval/latest" ] || \
$PY profile.py --dataroot "$DATA" \
  --dataset_mode aligned $COMMON \
  --log_dir "$WORK/eval" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --teacher_ngf "$NGF" --student_ngf 32 \
  --prune_cin_lb 16 --target_flops "$FLOPS" \
  --eval_batch_size 16 \
  --times 10

$PY export.py --dataroot "$DATA" \
  --dataset_mode aligned \
  --crop_size "$SIZE" --load_size "$SIZE" \
  --log_dir "$WORK/student" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --export_format stablehlo

echo "MIOU QUALITY LOOP COMPLETE: $WORK"
echo "trajectories: grep mIoU $WORK/teacher/log.txt $WORK/student/log.txt"
