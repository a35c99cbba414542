#!/bin/bash
# Round-4 validation campaign (VERDICT.md r3 "Next round" items 1-4).
#
# Chip-bound queue, artifact-guarded per step so re-running resumes:
#   1. pool3+mm 500-episode standard sweep  (promotes the -20% operating
#      point; the pool2mm 500 finished separately: 499/500)
#   2. pool2mm perturbed 64-episode gate    (VERDICT item 2)
#   3. pool3   perturbed 64-episode gate
#   4. AKAZE standard 64 revalidation post edge-clamp fix (item 3; the
#      pre-fix artifact is archived as *_preclampfix.npz)
#   5. flagship s518-trained perturbed 500 rerun with the fixed
#      _random_erase (item 3; new name ..._n500_dino_perturbed.npz)
#   6. ORB   perturbed 64  (item 4 — completes the classical 3x2 matrix)
#   7. AKAZE perturbed 64  (item 4)
#
# Between steps the script honors /tmp/campaign_hold (touch it to keep the
# chip free for an interactive bench/ViT-L measurement; rm to resume).

set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

hold() {
  while [ -f /tmp/campaign_hold ]; do
    echo "[r4-campaign] holding (rm /tmp/campaign_hold to resume)"
    sleep 60
  done
}

wait_relay() {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r4-campaign] relay down at $(date), retrying in 180 s"
    sleep 180
  done
}

step() {  # step <artifact> <log> <cli args...>
  local art=$1 log=$2; shift 2
  if [ -f "$art" ]; then return 0; fi
  hold; wait_relay
  echo "[r4-campaign] $(date +%H:%M) -> $log"
  timeout 21600 python -u -m vitvs_tpu.io_bridge.cli "$@" \
    > "$LOG/$log" 2>&1
  tail -2 "$LOG/$log"
  if [ ! -f "$art" ]; then
    echo "[r4-campaign] STEP FAILED: $art missing (see $LOG/$log); aborting"
    exit 1
  fi
}

# 1. pool3+mm 500-episode standard sweep (64-gate passed 64/64 in r3)
step artifacts/results_real_s518_pool3_int8cal_n500_dino_standard.npz \
  sweep_pool3_500.log \
  --method dino --config configs/real_s518_pool3.yaml \
  --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
  --num-samples 500 --out artifacts --resume artifacts/pool3_500.ckpt

# 2. pool2mm perturbed 64-episode gate (erase fix applied)
step artifacts/results_real_s518_pool2mm_int8cal_dino_perturbed.npz \
  sweep_pool2mm_pert64.log \
  --method dino --config configs/real_s518_pool2mm.yaml \
  --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
  --perturbation --out artifacts --resume artifacts/pool2mm_pert64.ckpt

# 3. pool3 perturbed 64-episode gate
step artifacts/results_real_s518_pool3_int8cal_dino_perturbed.npz \
  sweep_pool3_pert64.log \
  --method dino --config configs/real_s518_pool3.yaml \
  --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
  --perturbation --out artifacts --resume artifacts/pool3_pert64.ckpt

# 6. ORB perturbed 64
step artifacts/results_real64_orb_perturbed.npz \
  sweep_orb_pert64.log \
  --method orb --config configs/real64.yaml \
  --perturbation --out artifacts --resume artifacts/orb_pert64.ckpt

# 4. AKAZE standard 64 revalidation (classical/binary.py edge-clamp fix)
if [ ! -f artifacts/results_real64_akaze_standard_preclampfix.npz ] \
   && [ -f artifacts/results_real64_akaze_standard.npz ]; then
  mv artifacts/results_real64_akaze_standard.npz \
     artifacts/results_real64_akaze_standard_preclampfix.npz
fi
step artifacts/results_real64_akaze_standard.npz \
  sweep_akaze64_reval.log \
  --method akaze --config configs/real64.yaml \
  --out artifacts --resume artifacts/akaze64_reval.ckpt

# 7. AKAZE perturbed 64
step artifacts/results_real64_akaze_perturbed.npz \
  sweep_akaze_pert64.log \
  --method akaze --config configs/real64.yaml \
  --perturbation --out artifacts --resume artifacts/akaze_pert64.ckpt

# 7 (last; longest — checkpoints and resumes across rounds). flagship perturbed 500 rerun with the fixed _random_erase
step artifacts/results_real_s518_n500_dino_perturbed.npz \
  sweep_s518_pert500_r4.log \
  --method dino --config configs/real_s518.yaml \
  --checkpoint artifacts/ckpt_real518 \
  --num-samples 500 --perturbation --out artifacts \
  --resume artifacts/s518_pert500_r4.ckpt

echo "[r4-campaign] done at $(date)"
