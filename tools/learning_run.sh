#!/bin/bash
# Trained-model evidence run (VERDICT r4 item 5): a multi-thousand-step
# chip run of the flagship model on the structured synthetic dataset
# (tools/make_synth_dataset.py), through the REAL tools/train.py loop
# with periodic real-protocol val (whole-mode inference -> IoU metric).
#
# Artifacts: work_dirs/learning_run/{scalars.jsonl, vis/}, checkpoint,
# and docs/LEARNING.md (curves + reproduce command + ckpt hash).
# Round N+1 must match or beat the final val mIoU at the same step count.
#
# Reproduce:
#   python tools/make_synth_dataset.py --root work_dirs/synthseg \
#       --train 2000 --val 200 --size 512 --classes 30
#   bash tools/learning_run.sh
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/learning_run.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== learning run $(date -Is) $(git rev-parse --short HEAD) ==="

timeout 14000 python tools/train.py SDTv2_maskformer_DCNpixelDecoder_ade20k \
  --data-root work_dirs/synthseg \
  --work-dir work_dirs/learning_run \
  --log-interval 50 --eval-images 50 --vis-interval 10 \
  --cfg-options model.num_classes=30 model.dtype=bfloat16 \
    data.batch_size=8 data.num_workers=8 data.cache=True \
    "data.test_scale=(512,512)" \
    train.base_lr=0.0006 train.warmup_iters=300 train.total_iters=4000 \
    train.val_interval=500 train.checkpoint_interval=2000 \
    train.max_keep_ckpts=2
echo "(exit $?)"
echo "=== learning run done $(date -Is) ==="
sha256sum work_dirs/learning_run/ckpt_4000/*/* 2>/dev/null | head -5 || true
