#!/bin/bash
# Consolidated remaining round-3 TPU schedule (replaces round3_queue.sh +
# _b after the read-offset drift and a wedged-lease cascade; this file is
# NEVER edited while running). Quiet discipline: >=420 s of true silence
# before every TPU job (the measured lease-recovery recipe).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_queue.log
log() { echo "[queueC $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" >> "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  log "quiet 420s"
  sleep 420
  return $rc
}

past() { [ "$(date +%s)" -gt "$(date -d "$1" +%s)" ]; }

# --- ultra composed chain (VERDICT #3) ---
run ultra_mint 10800 python scripts/mint_checkpoint.py --width 0.25 \
  --iterations 40000 --batch-size 32 --train-encoder --distance-weight 20 \
  --rotate-deg 20 --elastic-px 2.5 --out checkpoints_ultra3
if [ -d checkpoints_ultra3/iter_40000 ]; then
  run ultra_promote1 1200 python scripts/promote_release.py --cpu \
    --run checkpoints_ultra3 --dest checkpoints_ultra3
  run ultra_ft1 7200 python scripts/finetune_adv.py --release checkpoints_ultra3 \
    --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_ultra3_ft1
fi
if [ -d checkpoints_ultra3_ft1/iter_6000 ]; then
  run ultra_promote2 1200 python scripts/promote_release.py --cpu \
    --run checkpoints_ultra3_ft1 --dest checkpoints_ultra3_ft1
  run ultra_ft2 7200 python scripts/finetune_adv.py --release checkpoints_ultra3_ft1 \
    --iterations 6000 --lr 1e-5 --adv-weight 1.0 --ema-decay 0.999 \
    --out checkpoints_ultra3_ft2
fi

# --- short, load-bearing jobs ---
run nogt_ft2 7200 python scripts/finetune_adv.py --release checkpoints_nogt \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_nogt_ft
run flagship_quant 3600 python scripts/calibrate_quant.py --eval
run profile 3600 python scripts/exp_flagship_profile.py --batch 512
run halo_conv 3600 python scripts/exp_halo_conv.py --batch 256
run phdec_promote 1200 python scripts/promote_release.py --cpu \
  --run checkpoints_phdec --dest checkpoints_phdec
run phdec_quant 3600 python scripts/calibrate_quant.py \
  --ckpt checkpoints_phdec --eval

# --- long tail, each behind a round-clock guard ---
if past "2026-08-21 03:10"; then log "deadline: skip oracle2"; else
  run oracle2 9000 python scripts/mint_checkpoint.py --iterations 30000 \
    --batch-size 32 --train-encoder --distance-weight 20 --bank golden-all \
    --out checkpoints_oracle
fi
if past "2026-08-21 03:50"; then log "deadline: skip domains"; log "QUEUE COMPLETE"; exit 0; fi
run rbc_mint 10800 python scripts/mint_domain_checkpoint.py --domain red_blood_cell \
  --iterations 24000 --rotate-deg 20 --elastic-px 2.5 --out checkpoints_rbc3
run rbc_ft 7200 python scripts/mint_domain_checkpoint.py --domain red_blood_cell \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --rotate-deg 20 --elastic-px 2.5 \
  --init-from checkpoints_rbc3 --out checkpoints_rbc3_ft
if past "2026-08-21 04:30"; then log "deadline: skip bead"; log "QUEUE COMPLETE"; exit 0; fi
run bead_mint 10800 python scripts/mint_domain_checkpoint.py --domain polystyrene \
  --iterations 24000 --rotate-deg 20 --elastic-px 2.5 --out checkpoints_bead3

log "QUEUE COMPLETE"
