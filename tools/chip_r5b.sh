#!/bin/bash
# Round-5 pass B: measure the shared-transcendental loss commit, retry
# the B=4 crash, then the trained-model evidence run, then the headline
# bench (re-primes the persistent compile cache for the driver window).
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_r5b.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip r5b $(date -Is) $(git rev-parse --short HEAD) ==="

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k
run() { echo "--- $* ---"; timeout 3600 "$@"; echo "(exit $?)"; }

run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_points=12544

bash tools/learning_run.sh

run python bench.py
echo "=== chip r5b done $(date -Is) ==="
