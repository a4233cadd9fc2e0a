#!/usr/bin/env bash
# GauGAN (SPADE) end-to-end quality loop on the attached chip — the
# cityscapes counterpart of tools/run_quality_loop.sh.  Zero-egress stand-in:
# procedural cityscapes-format scenes (tools/make_synth_cityscapes.py) and
# the judge-layout random-weight InceptionV3 + VGG19; trajectories are
# meaningful, absolute FID values are judge-relative.
#
# Reference semantics throughout (train_inception_student_5p6B.sh):
#   * 512x256 crops (--remat keeps the step in HBM),
#   * λ_vgg=10 perceptual loss (fake-layout VGG19 weights),
#   * --target_flops drives shrink_spade on-chip (student arch is SEARCHED,
#     not hand-picked); QL_TFRAC sets the budget as a fraction of the
#     teacher's MACs,
#   * warm D (--restore_D_path) + pretrained weight transfer
#     (--restore_pretrained_G_path) from the teacher.
# mIoU is omitted: a random-weight DRN judge would be numerically
# meaningless (unlike FID, whose judge-relative trajectory still orders
# checkpoints).
#
# teacher train -> real stats -> shrink+distill -> evaluate -> export
# Usage: bash tools/run_spade_quality_loop.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${QL_PYTHON:-python}

WORK=${1:-/tmp/spade_quality}
DATA=$WORK/city
JUDGE=$WORK/judges/pt_inception_random.pth
VGG=$WORK/judges/vgg19_random.pth
EPOCHS=${QL_EPOCHS:-20}
DECAY=${QL_DECAY:-20}
DEPOCHS=${QL_DEPOCHS:-30}
DDECAY=${QL_DDECAY:-30}
BATCH=${QL_BATCH:-8}
WIDTH=${QL_WIDTH:-512}
NTRAIN=${QL_NTRAIN:-200}
NVAL=${QL_NVAL:-32}
NGF=${QL_NGF:-32}
TFRAC=${QL_TFRAC:-0.5}
CLASSES=${QL_CLASSES:-8}
CDT=${QL_CDT:-bfloat16}
# bf16 VGG sweep: ~2.6% step win on top of packing at 512x256 (spade_perf);
# validated end-to-end by this loop's FID trajectory.  float32 to disable.
VGGDT=${QL_VGGDT:-bfloat16}
REMAT=${QL_REMAT:-1}
LVGG=${QL_LVGG:-10}
# reference train_inception_student_5p6B.sh:22,24-26 values
LDISTILL=${QL_LDISTILL:-0.5}
CINLB=${QL_CINLB:-16}
# reference recipe block geometry (train_inception_teacher.sh:12-13 and
# train_inception_student_5p6B.sh:21-22) — without these the teacher is
# built at the global defaults (crf 1, kernels 3/5/7): ~6x wider branches,
# which OOMs a 16G chip at 512x256 b16
CRF=${QL_CRF:-6}
KS=${QL_KS:-"1 3 5"}
# reference SPADE default (spade_model.py:33-38); the cityscapes recipes
# do not override it
UPS=${QL_UPS:-more}
# semantic channels = classes + instance edge; aspect 2 -> height = width/2
COMMON="--dataset_mode cityscapes --input_nc $CLASSES \
  --crop_size $WIDTH --load_size $WIDTH --aspect_ratio 2.0 \
  --netG inception_spade --num_upsampling_layers $UPS \
  --channels_reduction_factor $CRF --kernel_sizes $KS \
  --norm_G spadesyncbatch3x3 --gan_mode hinge \
  --lambda_vgg $LVGG --remat $REMAT \
  --vgg_compute_dtype $VGGDT \
  --save_full_state 0"
# save_full_state 0: per-net checkpoints only (the reference's save_networks
# contract); the full 2.6GB resume state per save is prohibitive on this
# host's ~3.5MB/s disk

mkdir -p "$WORK"

[ -d "$DATA/gtFine/train" ] || $PY tools/make_synth_cityscapes.py \
  --out "$DATA" --n "$NTRAIN" --n_val "$NVAL" \
  --height $((WIDTH / 2)) --width "$WIDTH" --classes "$CLASSES"
# both judges must exist: a workdir from an older script revision may have
# the inception judge but not the VGG weights, and a missing --vgg_path
# silently disables the lambda_vgg=10 loss this loop mandates
[ -f "$JUDGE" ] && [ -f "$VGG" ] || $PY tools/make_fixtures.py judges --out "$WORK/judges"

[ -f "$WORK/real_stat.npz" ] || $PY get_real_stat.py \
  --dataroot "$DATA/leftImg8bit/val" --dataset_mode single --phase val \
  --output_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --crop_size "$WIDTH" --load_size "$WIDTH" --aspect_ratio 2.0 \
  --preprocess none

# stages are resumable: each is skipped when its output checkpoint already
# exists (long on-chip runs can die mid-loop; rerun the script to continue)
[ -f "$WORK/teacher/checkpoints/latest_net_G.msgpack" ] || \
$PY train.py --dataroot "$DATA" \
  --model spade $COMMON \
  --log_dir "$WORK/teacher" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --vgg_path "$VGG" \
  --batch_size "$BATCH" \
  --ngf "$NGF" --ndf 64 --num_D 2 \
  --nepochs "$EPOCHS" --nepochs_decay "$DECAY" \
  --save_epoch_freq 10 \
  --compute_dtype "$CDT"

TCKPT="$WORK/teacher/checkpoints/best_net_G.msgpack"
[ -f "$TCKPT" ] || TCKPT="$WORK/teacher/checkpoints/latest_net_G.msgpack"
DCKPT="${TCKPT/net_G/net_D}"
DREST=""
[ -f "$DCKPT" ] && DREST="--restore_D_path $DCKPT"

# FLOPs budget: QL_TFLOPS (absolute, the reference passes 5.6e9) wins;
# otherwise TFRAC x teacher MACs (the procedural teacher's scale varies
# with QL knobs) — shrink_spade_generator runs inside distill.py
TFLOPS=${QL_TFLOPS:-}
[ -n "$TFLOPS" ] || TFLOPS=$($PY - "$TCKPT" "$TFRAC" << 'PYEOF'
import sys
sys.path.insert(0, ".")
from cat_tpu.entry import load_spade_checkpoint
from cat_tpu.compress.spade import profile_spade_generator

cfg, _ = load_spade_checkpoint(sys.argv[1])
h, w = int(cfg.crop_size / cfg.aspect_ratio), cfg.crop_size
print(int(profile_spade_generator(cfg, h, w).macs * float(sys.argv[2])))
PYEOF
)
echo "teacher budget fraction $TFRAC -> target_flops=$TFLOPS"

[ -f "$WORK/student/checkpoints/latest_net_G.msgpack" ] || \
$PY distill.py --dataroot "$DATA" \
  --distiller spade $COMMON \
  --log_dir "$WORK/student" \
  --restore_teacher_G_path "$TCKPT" \
  --restore_pretrained_G_path "$TCKPT" \
  $DREST \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --vgg_path "$VGG" \
  --nepochs "$DEPOCHS" --nepochs_decay "$DDECAY" \
  --teacher_ngf "$NGF" --ndf 64 --num_D 2 \
  --target_flops "$TFLOPS" \
  --prune_cin_lb "$CINLB" \
  --batch_size "$BATCH" \
  --eval_batch_size 8 \
  --save_epoch_freq 10 \
  --distill_G_loss_type ka \
  --lambda_distill "$LDISTILL" \
  --compute_dtype "$CDT"

SCKPT="$WORK/student/checkpoints/best_net_G.msgpack"
[ -f "$SCKPT" ] || SCKPT="$WORK/student/checkpoints/latest_net_G.msgpack"

# profile verb (reference profiler.py through the spade distiller:
# shrink-latency benchmark, MAC/param accounting, latency, FID sweep + dumps)
# resumable like the other stages: the eval image dump is the stage output
[ -d "$WORK/eval/eval/latest" ] || \
$PY profile.py --dataroot "$DATA" \
  --distiller spade $COMMON \
  --log_dir "$WORK/eval" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --real_stat_path "$WORK/real_stat.npz" \
  --inception_path "$JUDGE" \
  --teacher_ngf "$NGF" --ndf 64 --num_D 2 \
  --target_flops "$TFLOPS" \
  --prune_cin_lb "$CINLB" \
  --eval_batch_size 8 \
  --times 10

$PY export.py --dataroot "$DATA" \
  --dataset_mode cityscapes --input_nc "$CLASSES" \
  --crop_size "$WIDTH" --load_size "$WIDTH" --aspect_ratio 2.0 \
  --netG inception_spade --num_upsampling_layers "$UPS" \
  --channels_reduction_factor $CRF --kernel_sizes $KS \
  --norm_G spadesyncbatch3x3 \
  --log_dir "$WORK/student" \
  --restore_teacher_G_path "$TCKPT" \
  --pretrained_student_G_path "$SCKPT" \
  --export_format stablehlo

echo "SPADE QUALITY LOOP COMPLETE: $WORK"
