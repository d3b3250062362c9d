#!/bin/bash
# Round-5 chip measurement campaign (VERDICT r4 items 1, 2, 4, 7).
# Measures, in order:
#   1. the reworked point-loss train path (gather-free selection, packed
#      GT taps, bf16 samplers) at B=4 and B=16  [VERDICT #1]
#   2. dense train baseline at B=16 + the factored decoder cross-attn
#      [VERDICT #2]
#   3. per-op device trace of the train step (MFU attribution)
#   4. the config-built component profilers at B=4 and B=16 (the round-4
#      B=16 crash came from bypassing lazy_masks)  [VERDICT #4]
#   5. inference per-op trace + headline bench re-prime  [VERDICT #7 / #3]
# Appends to work_dirs/chip_campaign_r5.log.
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_campaign_r5.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip campaign r5 $(date -Is) ==="
git rev-parse --short HEAD

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k

run() { echo "--- $* ---"; timeout 3600 "$@"; echo "(exit $?)"; }

# 1. point-sampled loss path, both batch sizes (B=4 measured separately
# before this script; re-run here only if SKIP_PT_B4 is unset)
if [ -z "${SKIP_PT_B4:-}" ]; then
  run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
      --cfg-options train.loss_points=12544
fi
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.loss_points=12544

# 2. dense train baseline (now with factored decoder cross-attn)
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu

# 3. per-op trace of the train step: where the 536 ms actually goes
# (T=1 = the flagship train recipe the benchmarks above measure)
B=16 T=1 MODE=train TOP=30 run python tools/trace_ops.py

# 4. component profilers (config-built since 07159ec)
B=4 run python tools/profile_train.py
B=16 run python tools/profile_train.py

# 5. inference: per-op trace then headline bench (also re-primes the
# persistent compile cache for the driver's end-of-round bench run)
B=16 MODE=fwd TOP=30 run python tools/trace_ops.py
run python bench.py

echo "=== campaign r5 done $(date -Is) ==="
