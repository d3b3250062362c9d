#!/bin/bash
# Round-5 pass C: (1) A/B the unrolled loss-layer scans (train.unroll_loss)
# at the loss block and full-step level, (2) B=32 feasibility for the
# packed_residuals/remat disposition (VERDICT r4 weak #3), (3) inference
# fwd per-op trace for the >=240 img/s-or-roofline item, (4) fresh
# bench.py to re-prime the compile cache for the driver window.
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_r5c.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip r5c $(date -Is) $(git rev-parse --short HEAD) ==="

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k
run() { echo "--- $* ---"; timeout 2400 "$@"; echo "(exit $?)"; }

# 1. loss-block A/B (fast compile, pure signal)
run python tools/bench_loss_block.py --batch-size 16 --iters 10
run python tools/bench_loss_block.py --batch-size 16 --iters 10 --unroll \
    --trace work_dirs/trace_lossblock_unroll

# 2. full train step with unrolled loss
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.unroll_loss=True
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.unroll_loss=True
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 10 --mfu \
    --cfg-options train.unroll_loss=True train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 10 --mfu \
    --cfg-options train.unroll_loss=True train.loss_points=12544 \
    train.loss_points_dtype=bfloat16

# 3. B=32: can the memory knobs buy a bigger batch?
run python tools/benchmark.py "$FLAG" --train --batch-size 32 --num-iters 10 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 32 --num-iters 10 --mfu \
    --cfg-options model.remat=True

# 4. inference per-op trace (roofline argument input) + point-loss train
#    trace (what still costs 3.5x dense at B=16)
B=16 MODE=fwd TRACE_DIR=work_dirs/trace_fwd_b16 run python tools/trace_ops.py
B=16 MODE=train LOSS_POINTS=12544 TRACE_DIR=work_dirs/trace_train_b16_pts \
    run python tools/trace_ops.py

# 5. headline bench last: fresh number + warm cache for the driver window
run python bench.py
echo "=== chip r5c done $(date -Is) ==="
