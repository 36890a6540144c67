#!/bin/bash
# Round-4 TPU job runner: picks the lexically-first scripts/r4_jobs/*.job,
# runs it, moves it to done/, then keeps the transport quiet for 420 s
# (the measured lease-recovery discipline, CLAUDE.md). Jobs are added and
# removed by creating/deleting .job FILES — this script is never edited
# while running (bash read-offset drift, measured round 3).
#
# Controls (all files under scripts/r4_jobs/):
#   deadline   — "YYYY-MM-DD HH:MM"; TPU jobs are skipped after it
#                (jobs named *_cpu_* are exempt and always run).
#   STOP       — stop after the current job.
set -u
cd "$(dirname "$0")/.."
QDIR=scripts/r4_jobs
DONE=$QDIR/done
LOG=/tmp/r4_queue.log
mkdir -p "$DONE"
log() { echo "[r4 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
log "runner started pid $$"
while true; do
  if [ -f "$QDIR/STOP" ]; then log "STOP file — exiting"; break; fi
  job=$(ls "$QDIR"/*.job 2>/dev/null | sort | head -1)
  if [ -z "${job:-}" ]; then sleep 30; continue; fi
  name=$(basename "$job" .job)
  deadline=$(cat "$QDIR/deadline" 2>/dev/null || echo "2099-01-01 00:00")
  case "$name" in
    *_cpu_*) : ;;
    *) if [ "$(date +%s)" -gt "$(date -d "$deadline" +%s)" ]; then
         log "deadline $deadline passed — skipping $name"
         mv "$job" "$DONE/${name}.skipped"; continue
       fi ;;
  esac
  log "START $name"
  bash "$job" >> "/tmp/r4_${name}.log" 2>&1
  rc=$?
  log "END $name rc=$rc"
  mv "$job" "$DONE/${name}.rc${rc}"
  case "$name" in
    *_cpu_*) sleep 15 ;;
    *) log "quiet 420s"; sleep 420 ;;
  esac
done
log "runner exit"
