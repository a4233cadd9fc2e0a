#!/usr/bin/env bash
# pix2pix (aligned) end-to-end quality loop — the third model family,
# alongside tools/run_quality_loop.sh (CycleGAN) and
# tools/run_spade_quality_loop.sh (GauGAN).  Paired A|B composites of the
# procedural stripes task; teacher train -> real stats -> shrink ->
# KA distill -> evaluate -> export.
# Usage: bash tools/run_pix2pix_quality_loop.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${QL_PYTHON:-python}

WORK=${1:-/tmp/p2p_quality}
DATA=$WORK/pairs
JUDGE=$WORK/judges/pt_inception_random.pth
EPOCHS=${QL_EPOCHS:-20}
DECAY=${QL_DECAY:-20}
DEPOCHS=${QL_DEPOCHS:-30}
DDECAY=${QL_DDECAY:-30}
BATCH=${QL_BATCH:-16}
DBATCH=${QL_DBATCH:-32}
SIZE=${QL_SIZE:-256}
NTRAIN=${QL_NTRAIN:-400}
NVAL=${QL_NVAL:-64}
NGF=${QL_NGF:-64}
FLOPS=${QL_FLOPS:-5.6e9}
CDT=${QL_CDT:-bfloat16}
COMMON="--dataset_mode aligned --direction AtoB \
  --crop_size $SIZE --load_size $((SIZE * 286 / 256)) \
  --gan_mode hinge \
  --norm_affine --norm_affine_D \
  --channels_reduction_factor 6 --kernel_sizes 1 3 5"

mkdir -p "$WORK"

[ -d "$DATA/train" ] || $PY tools/make_synth_dataset.py --paired \
  --out "$DATA" --n "$NTRAIN" --n_val "$NVAL" --size "$SIZE"
[ -f "$JUDGE" ] || $PY tools/make_fixtures.py judges --out "$WORK/judges"

[ -f "$WORK/real_stat.npz" ] || $PY get_real_stat.py \
  --dataroot "$DATA" --dataset_mode single --phase valB \
  --output_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --crop_size "$SIZE" --load_size "$((SIZE * 286 / 256))"

$PY train.py --dataroot "$DATA" \
  --model pix2pix $COMMON \
  --log_dir "$WORK/teacher" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --batch_size "$BATCH" \
  --ngf "$NGF" \
  --nepochs "$EPOCHS" --nepochs_decay "$DECAY" \
  --save_epoch_freq 10 \
  --compute_dtype "$CDT"

TCKPT="$WORK/teacher/checkpoints/best_net_G.msgpack"
[ -f "$TCKPT" ] || TCKPT="$WORK/teacher/checkpoints/latest_net_G.msgpack"

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
  --eval_batch_size 32 \
  --save_epoch_freq 10 \
  --lambda_distill 0.5 \
  --lambda_recon 100 \
  --prune_cin_lb 16 \
  --target_flops "$FLOPS" \
  --distill_G_loss_type ka \
  --compute_dtype "$CDT"

SCKPT="$WORK/student/checkpoints/best_net_G.msgpack"
[ -f "$SCKPT" ] || SCKPT="$WORK/student/checkpoints/latest_net_G.msgpack"

$PY profile.py --dataroot "$DATA" \
  --dataset_mode aligned $COMMON \
  --log_dir "$WORK/eval" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --teacher_ngf "$NGF" --student_ngf 32 \
  --prune_cin_lb 16 --target_flops "$FLOPS" \
  --times 10

$PY export.py --dataroot "$DATA" \
  --dataset_mode aligned \
  --crop_size "$SIZE" --load_size "$((SIZE * 286 / 256))" \
  --log_dir "$WORK/student" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --export_format stablehlo

echo "PIX2PIX QUALITY LOOP COMPLETE: $WORK"
