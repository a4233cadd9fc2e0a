#!/usr/bin/env bash
# End-to-end quality loop on the attached chip (VERDICT r1 item 3).
#
# The environment is zero-egress, so the reference's horse2zebra download is
# unavailable; this runs the FULL pipeline — teacher train -> real stats ->
# shrink -> KA distill -> evaluate -> export — on the procedural "stripes"
# unaligned task (tools/make_synth_dataset.py), with the judge-layout
# random-weight InceptionV3 (tools/make_fixtures.py judges).  FID against a
# random-projection judge is still a proper distance between image
# distributions, so the trajectories (teacher FID falling during training,
# student FID approaching the teacher's during distillation) are meaningful
# evidence that the optimization loop works end to end; the absolute values
# are not comparable to pt_inception numbers.
#
# Usage: bash tools/run_quality_loop.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${QL_PYTHON:-python}

WORK=${1:-/tmp/quality_loop}
DATA=$WORK/stripes
JUDGE=$WORK/judges/pt_inception_random.pth
EPOCHS=${QL_EPOCHS:-30}
DECAY=${QL_DECAY:-30}
DEPOCHS=${QL_DEPOCHS:-40}
DDECAY=${QL_DDECAY:-40}
BATCH=${QL_BATCH:-16}
DBATCH=${QL_DBATCH:-32}
SIZE=${QL_SIZE:-256}
NTRAIN=${QL_NTRAIN:-400}
NVAL=${QL_NVAL:-64}
NGF=${QL_NGF:-64}
SNGF=${QL_SNGF:-20}
FLOPS=${QL_FLOPS:-2.6e9}
CDT=${QL_CDT:-bfloat16}
# QL_DEVICE_DATA=1: train/distill from the HBM-resident image bank
# (data/device_data.py) — zero steady-state host->device traffic; the
# right mode when host->device bandwidth is scarce (tunneled harness)
DEVDATA=${QL_DEVICE_DATA:-0}
COMMON="--crop_size $SIZE --load_size $((SIZE * 286 / 256))"
TRAIN_EXTRA=""
[ "$DEVDATA" = "1" ] && TRAIN_EXTRA="--on_device_data 1"

mkdir -p "$WORK"

[ -d "$DATA/trainA" ] || $PY tools/make_synth_dataset.py --out "$DATA" --n "$NTRAIN" --n_val "$NVAL" --size "$SIZE"
[ -f "$JUDGE" ] || $PY tools/make_fixtures.py judges --out "$WORK/judges"

for dom in A B; do
  [ -f "$WORK/real_stat_$dom.npz" ] || $PY get_real_stat.py \
    --dataroot "$DATA" --dataset_mode single --phase train$dom \
    --output_path "$WORK/real_stat_$dom.npz" \
    --inception_path "$JUDGE" $COMMON
done

$PY train.py --dataroot "$DATA" \
  --model cycle_gan \
  --log_dir "$WORK/teacher" \
  --real_stat_A_path "$WORK/real_stat_A.npz" \
  --real_stat_B_path "$WORK/real_stat_B.npz" \
  --inception_path "$JUDGE" \
  --batch_size "$BATCH" $COMMON \
  --ngf "$NGF" --ndf 64 \
  --nepochs "$EPOCHS" --nepochs_decay "$DECAY" \
  --save_epoch_freq 10 \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 \
  --kernel_sizes 1 3 5 $TRAIN_EXTRA

TCKPT="$WORK/teacher/checkpoints/best_A_net_G_A.msgpack"
[ -f "$TCKPT" ] || TCKPT="$WORK/teacher/checkpoints/latest_net_G_A.msgpack"
# teacher D warm start (reference student recipes pass --restore_D_path);
# guarded: teacher dirs from before per-net D saving lack the file
DCKPT="${TCKPT/net_G_A/net_D_A}"
DREST=""
[ -f "$DCKPT" ] && DREST="--restore_D_path $DCKPT"

$PY distill.py --dataroot "$DATA" \
  --dataset_mode unaligned \
  --distiller inception \
  --gan_mode lsgan \
  --log_dir "$WORK/student2p6B" \
  --restore_teacher_G_path "$TCKPT" \
  --restore_pretrained_G_path "$TCKPT" \
  $DREST \
  --real_stat_path "$WORK/real_stat_B.npz" \
  --inception_path "$JUDGE" \
  --nepochs "$DEPOCHS" --nepochs_decay "$DDECAY" \
  --teacher_ngf "$NGF" --student_ngf "$SNGF" --ndf 64 \
  --batch_size "$DBATCH" $COMMON \
  --eval_batch_size 32 \
  --save_epoch_freq 10 \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 \
  --kernel_sizes 1 3 5 \
  --lambda_distill 1.0 \
  --lambda_recon 5 \
  --prune_cin_lb 16 \
  --target_flops "$FLOPS" \
  --distill_G_loss_type ka \
  --compute_dtype "$CDT" $TRAIN_EXTRA

SCKPT="$WORK/student2p6B/checkpoints/best_net_G.msgpack"
[ -f "$SCKPT" ] || SCKPT="$WORK/student2p6B/checkpoints/latest_net_G.msgpack"

$PY profile.py --dataroot "$DATA" \
  --dataset_mode unaligned \
  --gan_mode lsgan \
  --log_dir "$WORK/eval2p6B" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --real_stat_path "$WORK/real_stat_B.npz" \
  --inception_path "$JUDGE" \
  --norm_affine --norm_affine_D $COMMON \
  --teacher_ngf "$NGF" --student_ngf "$SNGF" \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5 \
  --prune_cin_lb 16 --target_flops "$FLOPS" \
  --times 10

$PY export.py --dataroot "$DATA" \
  --dataset_mode unaligned \
  --log_dir "$WORK/student2p6B" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --export_format stablehlo $COMMON

echo "QUALITY LOOP COMPLETE: $WORK"
