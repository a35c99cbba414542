#!/bin/bash
# Leg-4 serving campaign: matmul-impl K/V pooling (docs/CAMPAIGN_ATTN_REDESIGN.md).
#
# Measured basis (interleaved A/B, artifacts/logs/ab_poolmm.log):
#   base nomax3+cal+peconv 2.820 ms/iter | pool2+mm 2.344 (-17%) | pool3+mm 2.247 (-20%)
# and the zero-shot pool2 int8 64-episode gate passed 64/64 with the
# softmax-trained ckpt_real518 (no co-training needed).  The relu co-train
# leg is cancelled: relu measured flat (ab_redesign.log).
#
# This script closed-loop-validates the EXACT matmul-impl serving graphs:
#   1. pool2+mm 64-episode gate (the bench-flip gate)
#   2. pool3+mm 64-episode gate (the stretch operating point)
#   3. pool2+mm 500-episode standard sweep (headline validation)
# It deliberately stops there (perturbed 500s and the pool3 500 are a later
# judgment call) so the chip frees up for driver benches.
# Every step is artifact-guarded: re-running resumes the campaign.

set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

echo "[pool-campaign] waiting for the TPU relay..."
until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[pool-campaign] relay down at $(date), retrying in 180 s"
  sleep 180
done
echo "[pool-campaign] relay up at $(date)"

G2=artifacts/results_real_s518_pool2mm_int8cal_dino_standard.npz
if [ ! -f "$G2" ]; then
  echo "[pool-campaign] step 1: pool2+mm 64-episode gate"
  timeout 14400 python -u -m vitvs_tpu.io_bridge.cli --method dino \
    --config configs/real_s518_pool2mm.yaml \
    --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
    --out artifacts --resume artifacts/pool2mm_64.ckpt \
    > "$LOG/sweep_pool2mm_64.log" 2>&1
  tail -3 "$LOG/sweep_pool2mm_64.log"
fi

G3=artifacts/results_real_s518_pool3_int8cal_dino_standard.npz
if [ ! -f "$G3" ]; then
  echo "[pool-campaign] step 2: pool3+mm 64-episode gate"
  timeout 14400 python -u -m vitvs_tpu.io_bridge.cli --method dino \
    --config configs/real_s518_pool3.yaml \
    --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
    --out artifacts --resume artifacts/pool3_64.ckpt \
    > "$LOG/sweep_pool3_64.log" 2>&1
  tail -3 "$LOG/sweep_pool3_64.log"
fi

F2=artifacts/results_real_s518_pool2mm_int8cal_n500_dino_standard.npz
if [ -f "$G2" ] && [ ! -f "$F2" ]; then
  CONV=$(python -c "
import numpy as np
d = np.load('$G2', allow_pickle=True)
print(int(np.sum(np.asarray(d['convergence_flags'], bool))))")
  echo "[pool-campaign] pool2+mm gate: $CONV/64"
  if [ "$CONV" -ge 60 ]; then
    echo "[pool-campaign] step 3: pool2+mm 500-episode standard sweep"
    timeout 21600 python -u -m vitvs_tpu.io_bridge.cli --method dino \
      --config configs/real_s518_pool2mm.yaml \
      --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
      --num-samples 500 --out artifacts --resume artifacts/pool2mm_500.ckpt \
      > "$LOG/sweep_pool2mm_500.log" 2>&1
    tail -3 "$LOG/sweep_pool2mm_500.log"
  fi
fi

echo "[pool-campaign] done at $(date) — bench.py flip is gated on step 1+3 results"
