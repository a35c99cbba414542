#!/bin/bash
# Leg-3 serving campaign driver (docs/CAMPAIGN_ATTN_REDESIGN.md).
#
# Designed to survive session/relay deaths: every step is skipped when its
# artifact already exists, so re-running the script resumes the campaign.
# Run it detached:  nohup bash scripts/run_attn_campaign.sh > /tmp/campaign.log 2>&1 &
#
# It stops after the 64-episode gate on purpose — promoting to the
# 500-episode sweeps and flipping bench.py is a judgment call made by a
# human/agent reading the numbers, not by this script.

set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

echo "[campaign] waiting for the TPU relay..."
until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[campaign] relay down at $(date), retrying in 180 s"
  sleep 180
done
echo "[campaign] relay up at $(date)"

# ---- 1. interleaved A/B of the redesigns (random ViT-B weights: Hz only) --
# success marker is a .done sentinel written only on rc=0 — the log itself
# is not a marker (a timed-out run leaves a non-empty log and would be
# skipped forever)
if [ ! -f "$LOG/ab_redesign.done" ]; then
  echo "[campaign] step 1: A/B"
  if timeout 4800 python -u scripts/ab_attn.py \
    --variants "nomax3+cal+peconv,nomax3+cal+peconv+relu,nomax3+cal+peconv+sqrelu,nomax3+cal+peconv+pool2,nomax3+cal+peconv+relu+pool2" \
    > "$LOG/ab_redesign.log" 2>&1; then
    touch "$LOG/ab_redesign.done"
  else
    echo "[campaign] A/B failed (rc=$?) — continuing to training; re-run the script to retry it"
  fi
  tail -8 "$LOG/ab_redesign.log"
fi

# ---- 1b. ZERO-SHOT pool2 gate on the int8 serving graph --------------------
# kv_pool=2 with softmax kept needs no co-training (fidelity diag: vel_rel
# 0.22, inside the range the validated int8 path sits at), and its projected
# ~1.7 ms/iter already clears the 500 Hz north star.  This runs the EXACT
# bench-candidate graph (int8 W8A8 + static cal + nomax3 + conv patch-embed
# + kv_pool 2) closed-loop on the trained softmax checkpoint.
GATE2=artifacts/results_real_s518_pool2_int8cal_dino_standard.npz
if [ ! -f "$GATE2" ]; then
  echo "[campaign] step 1b: zero-shot pool2 int8 64-episode gate"
  timeout 14400 python -u -m vitvs_tpu.io_bridge.cli --method dino \
    --config configs/real_s518_pool2.yaml \
    --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
    --out artifacts --resume artifacts/pool2_64.ckpt \
    > "$LOG/sweep_pool2_64.log" 2>&1
  tail -4 "$LOG/sweep_pool2_64.log"
fi
FULL2=artifacts/results_real_s518_pool2_int8cal_n500_dino_standard.npz
if [ -f "$GATE2" ] && [ ! -f "$FULL2" ]; then
  CONV=$(python -c "
import numpy as np
d = np.load('$GATE2', allow_pickle=True)
print(int(np.sum(np.asarray(d['convergence_flags'], bool))))")
  echo "[campaign] pool2 zero-shot gate: $CONV/64 converged"
  if [ "$CONV" -ge 60 ]; then
    echo "[campaign] step 1c: pool2 500-episode standard sweep"
    timeout 21600 python -u -m vitvs_tpu.io_bridge.cli --method dino \
      --config configs/real_s518_pool2.yaml \
      --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
      --num-samples 500 --out artifacts --resume artifacts/pool2_500.ckpt \
      > "$LOG/sweep_pool2_500.log" 2>&1
    tail -4 "$LOG/sweep_pool2_500.log"
  else
    echo "[campaign] pool2 zero-shot gate below 60/64 — relying on co-training"
  fi
fi
PERT2=artifacts/results_real_s518_pool2_int8cal_n500_dino_perturbed.npz
if [ -f "$FULL2" ] && [ ! -f "$PERT2" ]; then
  CONV=$(python -c "
import numpy as np
d = np.load('$FULL2', allow_pickle=True)
print(int(np.sum(np.asarray(d['convergence_flags'], bool))))")
  echo "[campaign] pool2 500-episode standard: $CONV/500"
  if [ "$CONV" -ge 475 ]; then
    echo "[campaign] step 1d: pool2 500-episode perturbed sweep"
    timeout 21600 python -u -m vitvs_tpu.io_bridge.cli --method dino \
      --config configs/real_s518_pool2.yaml \
      --checkpoint artifacts/ckpt_real518 --int8 --int8-static \
      --num-samples 500 --perturbation \
      --out artifacts --resume artifacts/pool2_500p.ckpt \
      > "$LOG/sweep_pool2_500p.log" 2>&1
    tail -4 "$LOG/sweep_pool2_500p.log"
  fi
fi

# ---- 2. co-train relu+pool2 descriptors @518 -------------------------------
if [ ! -d artifacts/ckpt_relupool518 ]; then
  echo "[campaign] step 2: co-training relu+pool2 @518"
  RESUME=artifacts/ckpt_real518
  STEPS=3000
  if [ -d artifacts/ckpt_relupool518.part ] && [ -f artifacts/ckpt_relupool518.part.json ]; then
    # params-only crash resume for the TRUE remainder (train_servo records
    # covered steps in the sidecar; the lr schedule restarts — acceptable)
    RESUME=artifacts/ckpt_relupool518.part
    STEPS=$(python -c "import json; d=json.load(open('artifacts/ckpt_relupool518.part.json')); print(max(d['steps']-d['done'], 200))")
  fi
  timeout 21600 python -u scripts/train_servo.py \
    --out artifacts/ckpt_relupool518 --resume "$RESUME" \
    --size 518 --steps "$STEPS" --attn-score relu --kv-pool 2 \
    > "$LOG/train_relupool518.log" 2>&1
  tail -4 "$LOG/train_relupool518.log"
fi

# ---- 3. fidelity diag of the co-trained ckpt against its own semantics ----
if [ ! -s artifacts/attn_variant_fid_relupool.json ] && [ -d artifacts/ckpt_relupool518 ]; then
  echo "[campaign] step 3: co-trained fidelity diag"
  timeout 3600 python -u scripts/diag_attn_variant.py \
    --checkpoint artifacts/ckpt_relupool518 --base relu+pool2 \
    --variants softmax --out artifacts/attn_variant_fid_relupool.json \
    > "$LOG/diag_relupool.log" 2>&1
  tail -3 "$LOG/diag_relupool.log"
fi

# ---- 4. 64-episode closed-loop gate (bf16 path) ----------------------------
if [ ! -f artifacts/results_real_s518_relupool_dino_standard.npz ] && [ -d artifacts/ckpt_relupool518 ]; then
  echo "[campaign] step 4: 64-episode gate"
  # num_samples comes from the yaml (64): an explicit --num-samples would
  # suffix the npz name (_n64) and the artifact check above would miss it
  timeout 14400 python -u -m vitvs_tpu.io_bridge.cli --method dino \
    --config configs/real_s518_relupool.yaml \
    --checkpoint artifacts/ckpt_relupool518 \
    --out artifacts --resume artifacts/relupool64.ckpt \
    > "$LOG/sweep_relupool64.log" 2>&1
  tail -4 "$LOG/sweep_relupool64.log"
fi

# ---- 5. auto-promote to the full 500-episode standard sweep -----------------
# (the npz name carries the explicit --num-samples suffix: _n500)
GATE=artifacts/results_real_s518_relupool_dino_standard.npz
FULL=artifacts/results_real_s518_relupool_n500_dino_standard.npz
if [ -f "$GATE" ] && [ ! -f "$FULL" ]; then
  CONV=$(python -c "
import numpy as np
d = np.load('$GATE', allow_pickle=True)
print(int(np.sum(np.asarray(d['convergence_flags'], bool))))")
  echo "[campaign] 64-episode gate: $CONV/64 converged"
  if [ "$CONV" -ge 60 ]; then
    echo "[campaign] step 5: promoting to the 500-episode standard sweep"
    timeout 21600 python -u -m vitvs_tpu.io_bridge.cli --method dino \
      --config configs/real_s518_relupool.yaml \
      --checkpoint artifacts/ckpt_relupool518 --num-samples 500 \
      --out artifacts --resume artifacts/relupool500.ckpt \
      > "$LOG/sweep_relupool500.log" 2>&1
    tail -4 "$LOG/sweep_relupool500.log"
  else
    echo "[campaign] gate below 60/64 — stopping for human review"
  fi
fi

# ---- 6. relupool perturbed sweep (only after a strong 500 standard) --------
FULLP=artifacts/results_real_s518_relupool_n500_dino_perturbed.npz
if [ -f "$FULL" ] && [ ! -f "$FULLP" ]; then
  CONV=$(python -c "
import numpy as np
d = np.load('$FULL', allow_pickle=True)
print(int(np.sum(np.asarray(d['convergence_flags'], bool))))")
  echo "[campaign] relupool 500-episode standard: $CONV/500"
  if [ "$CONV" -ge 475 ]; then
    echo "[campaign] step 6: relupool 500-episode perturbed sweep"
    timeout 21600 python -u -m vitvs_tpu.io_bridge.cli --method dino \
      --config configs/real_s518_relupool.yaml \
      --checkpoint artifacts/ckpt_relupool518 --num-samples 500 \
      --perturbation --out artifacts --resume artifacts/relupool500p.ckpt \
      > "$LOG/sweep_relupool500p.log" 2>&1
    tail -4 "$LOG/sweep_relupool500p.log"
  fi
fi

echo "[campaign] done at $(date) — review the logs; bench.py flip + docs are a human decision"
