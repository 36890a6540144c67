"""Run a TPU training job under a stall watchdog with auto-resume retry.

Round-3 post-mortem (CLAUDE.md): a TPU process can hang forever CLAIMING the
chip — if a mint logs no "step" line within ~10 min of "probe ok" it is hung,
and the only recovery is kill-by-PID + a long quiet window + resume from the
newest iter_* snapshot. This wrapper automates that recipe so queued mints
survive transport wedges unattended:

- phase-aware stall thresholds on the child's output stream:
  * startup (before the wait_for_tpu "probe ok" marker): no stall kill —
    wait_for_tpu's escalating quiet windows are legitimately silent for up
    to ~15 min; the job-level `timeout` is the only bound here.
  * after "probe ok" / during training: 900 s without a new line ⇒ hung.
  * after "training done" (golden evals; slow XLA compiles): 3000 s.
- on stall: SIGTERM (SIGKILL of a chip-claiming process wedges the lease for
  ~70 min, measured round 3 — TERM first, with patience), 180 s grace, then
  SIGKILL; 420 s of full transport quiet; retry with the resume flag
  appended (scripts/{mint_checkpoint,mint_domain_checkpoint,finetune_adv}.py
  all support --resume-from-newest-iter_*).

Usage:
    python scripts/tpu_watchdog.py [--retries 2] [--resume-arg --resume] \
        -- python scripts/mint_checkpoint.py ...
"""

import argparse
import os
import signal
import subprocess
import sys
import threading
import time

STALL_TRAIN_S = 900.0
STALL_EVAL_S = 3000.0
GRACE_TERM_S = 180.0
QUIET_BETWEEN_S = 420.0


class Monitor:
    def __init__(self):
        self.last_line_t = time.monotonic()
        self.probe_ok = False
        self.evaluating = False
        self.lock = threading.Lock()

    def feed(self, line: str) -> None:
        with self.lock:
            self.last_line_t = time.monotonic()
            if "probe ok" in line:
                self.probe_ok = True
            if "training done" in line or "GOLDEN_EVAL" in line or "DOMAIN_EVAL" in line:
                self.evaluating = True

    def stalled(self) -> bool:
        with self.lock:
            if not self.probe_ok:
                return False
            limit = STALL_EVAL_S if self.evaluating else STALL_TRAIN_S
            return time.monotonic() - self.last_line_t > limit


def _pump(stream, mon: Monitor) -> None:
    for raw in iter(stream.readline, b""):
        sys.stdout.buffer.write(raw)
        sys.stdout.buffer.flush()
        try:
            mon.feed(raw.decode("utf-8", "replace"))
        except Exception:  # noqa: BLE001 — never let logging kill the pump
            pass
    stream.close()


def run_once(cmd) -> int:
    """Returns the child's rc, or -1 if the watchdog had to kill it."""
    mon = Monitor()
    child = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=False,
    )

    def forward(signum, _frame):
        child.terminate()

    old = signal.signal(signal.SIGTERM, forward)
    t = threading.Thread(target=_pump, args=(child.stdout, mon), daemon=True)
    t.start()
    killed = False
    try:
        while True:
            rc = child.poll()
            if rc is not None:
                t.join(timeout=10)
                return -1 if killed else rc
            if mon.stalled() and not killed:
                print(
                    f"[watchdog] no output for "
                    f"{time.monotonic() - mon.last_line_t:.0f}s after probe-ok "
                    f"— SIGTERM pid {child.pid}",
                    flush=True,
                )
                killed = True
                child.terminate()
                try:
                    child.wait(timeout=GRACE_TERM_S)
                except subprocess.TimeoutExpired:
                    print("[watchdog] SIGTERM ignored — SIGKILL", flush=True)
                    child.kill()
            time.sleep(15)
    finally:
        signal.signal(signal.SIGTERM, old)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--resume-arg", type=str, default="--resume",
                    help="flag appended to the command on retries "
                         "('' = retry verbatim)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    attempt = 0
    while True:
        run_cmd = list(cmd)
        if attempt > 0 and args.resume_arg and args.resume_arg not in run_cmd:
            run_cmd.append(args.resume_arg)
        print(f"[watchdog] attempt {attempt + 1}: {' '.join(run_cmd)}", flush=True)
        t0 = time.time()
        rc = run_once(run_cmd)
        print(f"[watchdog] attempt {attempt + 1} rc={rc} after {time.time()-t0:.0f}s",
              flush=True)
        if rc == 0:
            return 0
        attempt += 1
        if attempt > args.retries:
            return rc if rc > 0 else 1
        print(f"[watchdog] quiet {QUIET_BETWEEN_S:.0f}s before retry", flush=True)
        time.sleep(QUIET_BETWEEN_S)


if __name__ == "__main__":
    sys.exit(main())
