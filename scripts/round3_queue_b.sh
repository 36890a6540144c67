#!/bin/bash
# Follow-up queue: jobs the main round3_queue.sh skipped when its bash
# read-offset drifted past them (mid-script edits — lesson recorded in
# CLAUDE.md). Waits for the main queue to finish, then runs the two
# skipped jobs if the round clock allows.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_queue.log
log() { echo "[queueB $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

while ! grep -q "QUEUE COMPLETE" "$LOG" 2>/dev/null; do sleep 60; done
log "main queue complete; settling 420s"
sleep 420

DEADLINE=$(date -d '2026-08-21 04:40' +%s)

if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  log "START nogt_ft2"
  timeout 7200 python scripts/finetune_adv.py --release checkpoints_nogt \
    --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_nogt_ft \
    >> /tmp/r3_nogt_ft2.log 2>&1
  log "END nogt_ft2 rc=$?"
  sleep 420
fi

if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  log "START flagship_quant"
  timeout 3600 python scripts/calibrate_quant.py --eval \
    >> /tmp/r3_flagship_quant.log 2>&1
  log "END flagship_quant rc=$?"
fi
log "QUEUE-B COMPLETE"
