#!/bin/bash
# Round-3 chip measurement campaign (VERDICT items 3 + 5).
# Run on the real TPU (axon). Appends everything to work_dirs/chip_campaign.log.
# Usage: bash tools/chip_campaign.sh [quick]
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_campaign.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip campaign $(date -Is) ==="

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k

run() { echo "--- $* ---"; timeout 3600 "$@"; echo "(exit $?)"; }

# 0. sanity: headline bench (205-207 img/s expected pre-round-3)
run python bench.py

# 1. inference MFU protocol
run python tools/benchmark.py "$FLAG" --batch-size 16 --num-iters 100 --mfu

# 2. train benchmarks: B=4 (gt + pred), B=16, reference global batch 48
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_at=pred
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu
# reference recipe: global batch 48 = per-chip 16 x accum 3
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --accum-steps 3 \
    --num-iters 10 --mfu

# 2b. round-4 point-sampled losses: the Mask2Former recipe (K=12544) cuts
# the gt-resolution loss work ~20x per decoder layer — measure the train
# speedup it buys at both batch sizes
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.loss_points=12544

# 3. packed spike residuals: memory + speed delta at B=16
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 \
    --cfg-options train.packed_residuals=True
# remat comparison point
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 \
    --cfg-options model.remat=True

# 4. train component profile (fwd / loss / matcher / bwd / optim split)
B=4 run python tools/profile_train.py
B=16 run python tools/profile_train.py

# 5. inference component profile (pixel-decoder non-sampling attribution)
B=16 run python tools/profile_components.py || true

echo "=== campaign done $(date -Is) ==="
