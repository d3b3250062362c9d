#!/bin/bash
# Round-4 fixup campaign: re-measure with the round-4 perf fixes in place
#   * lazy (factored) mask logits (default via config)   — B=16 OOM fix
#   * scatter-free point sampling                        — 13.3 s/iter fix
#   * fixed --accum-steps semantics (batch*accum images)
#   * model.remat actually wired
#   * half-split nibble packing (packed-residuals OOM fix)
set -u
cd "$(dirname "$0")/.."
LOG=work_dirs/chip_campaign.log
mkdir -p work_dirs
exec > >(tee -a "$LOG") 2>&1
echo "=== chip campaign FIXUP $(date -Is) ==="

FLAG=SDTv2_maskformer_DCNpixelDecoder_ade20k

run() { echo "--- $* ---"; timeout 3600 "$@"; echo "(exit $?)"; }

# train with lazy masks (now default): B=4 then the previously-OOM B=16
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu
# reference global batch 48 = microbatch 16 x accum 3 (fixed semantics)
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --accum-steps 3 \
    --num-iters 10 --mfu
# point-sampled Mask2Former recipe with the scatter-free sampler
run python tools/benchmark.py "$FLAG" --train --batch-size 4 --num-iters 30 --mfu \
    --cfg-options train.loss_points=12544
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.loss_points=12544
# packed residuals with the half-split packing
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options train.packed_residuals=True
# remat, now actually wired through build_model
run python tools/benchmark.py "$FLAG" --train --batch-size 16 --num-iters 20 --mfu \
    --cfg-options model.remat=True
# train component profile with the new code
B=4 run python tools/profile_train.py
B=16 run python tools/profile_train.py
# inference sanity: confirm nothing regressed
run python bench.py

echo "=== campaign FIXUP done $(date -Is) ==="
