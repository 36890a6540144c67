#!/bin/bash
# Round-3 TPU job queue (single-chip axon: jobs strictly sequential, with
# settle gaps between TPU process exits — CLAUDE.md transport discipline).
# Priorities follow VERDICT.md "Next round": #2 PSNR push (EMA fine-tune,
# oracle ceiling), #3 ultra + experimental-domain re-mints with the composed
# recipe, #4 trustworthy profile, #5 phdec int8 metrics.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_queue.log
log() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
gap() { log "settle gap 180s"; sleep 180; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" >> "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  log "END $name rc=$rc (log /tmp/r3_${name}.log)"
  gap
  return $rc
}

# 0. wait for the in-flight no-GT+adv mint to finish writing its metrics
while [ ! -f checkpoints_nogt_adv/golden_metrics.json ]; do sleep 60; done
log "nogt_adv mint metrics present; waiting for process exit + settle"
sleep 300

# 1. EMA over a third adversarial fine-tune round of the flagship
#    (VERDICT #2 lever: ride the GAN oscillation; round-3-raw regressed)
run ema_ft 7200 python scripts/finetune_adv.py --release checkpoints \
  --iterations 6000 --lr 1e-5 --adv-weight 1.0 --ema-decay 0.999 \
  --out checkpoints_augadv3ema

# 1b. The OTHER no-GT+adv composition route (VERDICT missing #1): the
#     from-scratch composed mint measured raw 19.8 dB held-out (adv from
#     scratch costs ~5 dB vs plain no-GT's 24.5); the validated recovery
#     route is adv as a FINE-TUNE on the no-GT base (supervised stays 0 —
#     finetune_adv inherits the release config's loss weights)
run nogt_promote 1200 python scripts/promote_release.py --cpu \
  --run checkpoints_nogt --dest checkpoints_nogt
run nogt_ft 7200 python scripts/finetune_adv.py --release checkpoints_nogt \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_nogt_ft

# Longer settle: 180s gaps re-wedged the lease at every job boundary
# (measured in this queue's own log); a >6-min TRUE quiet window lets the
# first probe succeed (CLAUDE.md transport facts). Redefined here so the
# already-running bash picks it up when it reads this line.
gap() { log "settle gap 420s"; sleep 420; }

# 2. Oracle ceiling mint: train on ALL 100 golden digits, no held-out
#    discipline (VERDICT #2: bound the architecture's achievable ceiling)
run oracle 10800 python scripts/mint_checkpoint.py --iterations 40000 \
  --batch-size 32 --train-encoder --distance-weight 20 --bank golden-all \
  --out checkpoints_oracle

# 2b. nogt_ft retry: the first attempt surrendered to a wedged lease
#     (probe log /tmp/r3_nogt_ft.log); by now the oracle mint has cycled
#     the transport
run nogt_ft2 7200 python scripts/finetune_adv.py --release checkpoints_nogt \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_nogt_ft

# 3b. Re-calibrate int8 scales for the round-3 EMA flagship promoted into
#     checkpoints/ (the profile below must see the new weights + scales)
run flagship_quant 3600 python scripts/calibrate_quant.py --eval

# 3. Ultra tier composed re-mint (VERDICT #3): augment mint at width 0.25,
#    then two adversarial fine-tune rounds, then promote + recalibrate
run ultra_mint 10800 python scripts/mint_checkpoint.py --width 0.25 \
  --iterations 40000 --batch-size 32 --train-encoder --distance-weight 20 \
  --rotate-deg 20 --elastic-px 2.5 --out checkpoints_ultra3
run ultra_promote1 1200 python scripts/promote_release.py --cpu \
  --run checkpoints_ultra3 --dest checkpoints_ultra3
run ultra_ft1 7200 python scripts/finetune_adv.py --release checkpoints_ultra3 \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --out checkpoints_ultra3_ft1
run ultra_promote2 1200 python scripts/promote_release.py --cpu \
  --run checkpoints_ultra3_ft1 --dest checkpoints_ultra3_ft1
run ultra_ft2 7200 python scripts/finetune_adv.py --release checkpoints_ultra3_ft1 \
  --iterations 6000 --lr 1e-5 --adv-weight 1.0 --out checkpoints_ultra3_ft2
log "ultra chain done; promotion to checkpoints/ultra is a manual gate step"

# 4. Trustworthy flagship per-op profile (VERDICT #4; rewritten method) —
#    short + load-bearing, so it runs before the long domain mints
run profile 3600 python scripts/exp_flagship_profile.py --batch 512

# 4b. Halo-exchanged row-block Mosaic conv (the un-attempted round-2
#     route, VERDICT #4): measure vs XLA + the whole-image fused tail
run halo_conv 3600 python scripts/exp_halo_conv.py --batch 256

# 5. decoder_ph int8 golden metrics (VERDICT #5 done-criterion)
run phdec_promote 1200 python scripts/promote_release.py --cpu \
  --run checkpoints_phdec --dest checkpoints_phdec
run phdec_quant 3600 python scripts/calibrate_quant.py \
  --ckpt checkpoints_phdec --eval

# 5b. Oracle retry (the 00:10 attempt hung claiming the chip and was
#     killed): 30k iters to fit the remaining window; skip if too late
if [ "$(date +%s)" -gt 1787281800 ]; then log "deadline: skipping oracle retry"; else
run oracle2 9000 python scripts/mint_checkpoint.py --iterations 30000 \
  --batch-size 32 --train-encoder --distance-weight 20 --bank golden-all \
  --out checkpoints_oracle
fi

# 6. Experimental domains composed re-mint (rbc first - the weaker release):
#    augment mint (24k cosine, the validated domain recipe) + one 6k adv
#    fine-tune via --init-from. These are the longest jobs; bead may be cut
#    by round end - acceptable (rbc is the weaker shipped release).
if [ "$(date +%s)" -gt 1787284200 ]; then log "deadline: skipping domain mints (leave the chip for the round-end bench)"; log "QUEUE COMPLETE"; exit 0; fi
run rbc_mint 10800 python scripts/mint_domain_checkpoint.py --domain red_blood_cell \
  --iterations 24000 --rotate-deg 20 --elastic-px 2.5 --out checkpoints_rbc3
run rbc_ft 7200 python scripts/mint_domain_checkpoint.py --domain red_blood_cell \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --rotate-deg 20 --elastic-px 2.5 \
  --init-from checkpoints_rbc3 --out checkpoints_rbc3_ft
if [ "$(date +%s)" -gt 1787286600 ]; then log "deadline: skipping bead (leave the chip for the round-end bench)"; log "QUEUE COMPLETE"; exit 0; fi
run bead_mint 10800 python scripts/mint_domain_checkpoint.py --domain polystyrene \
  --iterations 24000 --rotate-deg 20 --elastic-px 2.5 --out checkpoints_bead3
run bead_ft 7200 python scripts/mint_domain_checkpoint.py --domain polystyrene \
  --iterations 6000 --lr 2e-5 --adv-weight 1.0 --rotate-deg 20 --elastic-px 2.5 \
  --init-from checkpoints_bead3 --out checkpoints_bead3_ft

log "QUEUE COMPLETE"
