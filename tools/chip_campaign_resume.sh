#!/bin/bash
# Resume of the round-4 chip campaign: skips steps already captured in
# work_dirs/chip_campaign.log (bench 211.34, inference B=16 MFU, train B=4 base).
# Detach-safe: run under setsid so a driver/session crash doesn't kill it.
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_campaign.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip campaign RESUME $(date -Is) ==="

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k

run() { echo "--- $* ---"; timeout 3600 "$@"; echo "(exit $?)"; }

run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_at=pred
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --accum-steps 3 \
    --num-iters 10 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 \
    --cfg-options train.packed_residuals=True
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 \
    --cfg-options model.remat=True
B=4 run python tools/profile_train.py
B=16 run python tools/profile_train.py
B=16 run python tools/profile_components.py || true

echo "=== campaign done $(date -Is) ==="
