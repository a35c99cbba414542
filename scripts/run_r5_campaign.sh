#!/bin/bash
# Round-5 validation campaign (VERDICT.md r4 "Next round" items 2-3).
#
# Chip-bound queue, artifact-guarded per step so re-running resumes.
# Ordered longest-lead-time first so the headline-blocking artifact exists
# even if the round ends early:
#   1. flagship s518-trained perturbed 500 rerun with the fixed
#      _random_erase (replaces the pre-fix artifact behind the README 95.4%)
#   2. AKAZE standard 64 revalidation post edge-clamp fix (pre-fix artifact
#      already archived as *_preclampfix.npz in r4)
#   3. AKAZE perturbed 64 (completes the classical 3x2 matrix)
#
# Between steps the script honors /tmp/campaign_hold (touch to keep the
# chip free for an interactive bench/training window; rm to resume).
# Unlike the r4 script, each step VERIFIES its artifact landed and aborts
# the campaign otherwise (a step that fails instantly must not let the
# queue march on silently — r4 advisor finding).

set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

hold() {
  while [ -f /tmp/campaign_hold ]; do
    echo "[r5-campaign] holding (rm /tmp/campaign_hold to resume)"
    sleep 60
  done
}

wait_relay() {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r5-campaign] relay down at $(date), retrying in 180 s"
    sleep 180
  done
}

step() {  # step <artifact> <log> <cli args...>
  local art=$1 log=$2; shift 2
  if [ -f "$art" ]; then return 0; fi
  hold; wait_relay
  echo "[r5-campaign] $(date +%H:%M) -> $log"
  timeout 21600 python -u -m vitvs_tpu.io_bridge.cli "$@" \
    > "$LOG/$log" 2>&1
  tail -2 "$LOG/$log"
  if [ ! -f "$art" ]; then
    echo "[r5-campaign] STEP FAILED: $art missing (see $LOG/$log); aborting"
    exit 1
  fi
}

# 0a/0b. closed-loop gates for the EXACT r5 benched serving graph
# (pool2mm + kv_pool_where=pre + reshape patch embed; pre is algebraically
# identical to the validated post-pool graph up to int8 rounding, so these
# gates confirm the rounding delta is inert end-to-end)
step artifacts/results_real_s518_pool2mmpre_int8cal_dino_standard.npz \
  sweep_pool2mmpre_64.log \
  --method dino --config configs/real_s518_pool2mmpre.yaml \
  --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
  --out artifacts --resume artifacts/pool2mmpre_64.ckpt

step artifacts/results_real_s518_pool2mmpre_int8cal_dino_perturbed.npz \
  sweep_pool2mmpre_pert64.log \
  --method dino --config configs/real_s518_pool2mmpre.yaml \
  --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
  --perturbation --out artifacts --resume artifacts/pool2mmpre_pert64.ckpt

# 1. flagship perturbed 500 rerun with the fixed _random_erase
step artifacts/results_real_s518_n500_dino_perturbed.npz \
  sweep_s518_pert500_r5.log \
  --method dino --config configs/real_s518.yaml \
  --checkpoint artifacts/ckpt_real518 \
  --num-samples 500 --perturbation --out artifacts \
  --resume artifacts/s518_pert500_r4.ckpt

# 2. AKAZE standard 64 revalidation (classical/binary.py edge-clamp fix;
#    the pre-fix artifact was archived by the r4 campaign)
step artifacts/results_real64_akaze_standard.npz \
  sweep_akaze64_reval.log \
  --method akaze --config configs/real64.yaml \
  --out artifacts --resume artifacts/akaze64_reval.ckpt

# 3. AKAZE perturbed 64
step artifacts/results_real64_akaze_perturbed.npz \
  sweep_akaze_pert64.log \
  --method akaze --config configs/real64.yaml \
  --perturbation --out artifacts --resume artifacts/akaze_pert64.ckpt

echo "[r5-campaign] done at $(date)"
