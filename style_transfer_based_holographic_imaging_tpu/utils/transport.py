"""Remote-TPU (axon) transport health checks.

The development harness reaches its TPU through a host-managed loopback
relay (``AXON_LOOPBACK_RELAY``); when the relay process is down the axon
client blocks forever inside ``jax.devices()`` retrying the dial, and when
the chip lease is wedged a timed-out probe is itself an unclean disconnect
that re-wedges it (measured: probes at 2-4 min intervals kept a wedged lease
stuck ~30 min, one probe after a 6-min quiet period recovered it). This
module gives long-running entry points (bench.py, mint scripts) a safe
prologue: cheap port checks while the relay is down, at most one subprocess
probe per quiet window once it is up.

Does nothing (returns immediately) when the configured backend is not the
remote axon transport.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

__all__ = ["tpu_transport_ready", "wait_for_tpu"]

_RELAY_PORT = 8082          # first port of the relay's listen set
_PROBE_TIMEOUT_S = 240      # one compile + tiny matmul fits well within this
_QUIET_AFTER_FAILED_PROBE_S = 360   # measured minimum for lease recovery
_SETTLE_AFTER_PROBE_S = 60  # the probe subprocess is itself a TPU process
                            # exit; launching the caller's process right after
                            # is the measured wedge trigger ("leave ~1 min
                            # between TPU process exits and the next launch")

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "print(float(jax.device_get(jnp.sum(x @ x))))"
)


def _is_axon() -> bool:
    return os.environ.get("JAX_PLATFORMS", "") == "axon"


def _relay_port_open(timeout: float = 3.0) -> bool:
    try:
        with socket.create_connection(("127.0.0.1", _RELAY_PORT), timeout=timeout):
            return True
    except OSError:
        return False


def _probe_once() -> bool:
    """One end-to-end device probe in a throwaway subprocess (a hung axon
    client cannot be cancelled in-process; a subprocess can be killed)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=_PROBE_TIMEOUT_S,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def tpu_transport_ready() -> bool:
    """Non-blocking: True if this process can expect jax.devices() to work."""
    if not _is_axon():
        return True
    return _relay_port_open()


def wait_for_tpu(max_wait_s: float = 900.0, *, log=None) -> bool:
    """Block until the remote TPU transport answers a probe (or give up).

    Returns True when a probe matmul succeeded (or the backend is local).
    While the relay port is closed this polls cheaply every 30 s; once the
    port is open it runs at most one probe per ``_QUIET_AFTER_FAILED_PROBE_S``
    window so a wedged lease is not kept wedged by the probes themselves.
    """
    if log is None:
        log = lambda m: print(m, file=sys.stderr)  # noqa: E731
    if not _is_axon():
        return True
    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        if _relay_port_open():
            if first:
                log("tpu transport: relay up, probing")
            if _probe_once():
                # The probe's process exit must settle before the caller
                # claims the chip, or the claim itself wedges the lease.
                log(
                    f"tpu transport: probe ok; settling {_SETTLE_AFTER_PROBE_S}s "
                    "before claiming the chip"
                )
                time.sleep(_SETTLE_AFTER_PROBE_S)
                return True
            log(
                "tpu transport: probe failed; quiet cool-down "
                f"{_QUIET_AFTER_FAILED_PROBE_S}s"
            )
            if time.monotonic() + _QUIET_AFTER_FAILED_PROBE_S > deadline:
                return False
            time.sleep(_QUIET_AFTER_FAILED_PROBE_S)
        else:
            if first:
                log("tpu transport: relay port closed, waiting")
            if time.monotonic() + 30.0 > deadline:
                return False
            time.sleep(30.0)
        first = False
