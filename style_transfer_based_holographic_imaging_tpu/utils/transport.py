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

__all__ = ["tpu_transport_ready", "wait_for_tpu", "stale_tpu_pids", "sweep_stale_tpu"]

_RELAY_PORT = 8082          # first port of the relay's listen set
_PROBE_TIMEOUT_S = 240      # one compile + tiny matmul fits well within this
_QUIET_AFTER_FAILED_PROBE_S = 360   # measured minimum for lease recovery
_QUIET_MAX_S = 900                  # escalation cap (15 min quiet windows)
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


def _ancestor_pids() -> set:
    """This process and its ancestors (never sweep ourselves or our parents)."""
    pids, pid = set(), os.getpid()
    while pid > 1:
        pids.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    return pids


def _line_pids(line: str) -> set:
    pids = set()
    for part in line.split("pid=")[1:]:
        num = part.split(",")[0].split(")")[0]
        if num.isdigit():
            pids.add(int(num))
    return pids


_LOOPBACK_ADDRS = {"127.0.0.1", "::1", "::ffff:127.0.0.1"}
_WILDCARD_ADDRS = {"0.0.0.0", "*", "::", "[::]"}


def _split_addr(col: str) -> tuple:
    """('addr', port:int|None) from an ss address column like
    ``127.0.0.1:8082`` / ``[::1]:8082`` / ``*:8082``."""
    addr, _, port = col.rpartition(":")
    addr = addr.strip("[]")
    return addr, (int(port) if port.isdigit() else None)


def _relay_listen_ports() -> tuple:
    """(relay_pids, relay_ports, relay_addrs): the process(es) LISTENing on
    the relay's first port, EVERY port that process listens on — the relay
    serves a whole port set (measured: 8082, 8083, 8087, 8092-8107, ...) and
    a TPU client may be connected to any of them — and the set of addresses a
    client's PEER endpoint may legitimately show for those ports (the relay's
    concrete listen addresses; wildcard listens count as loopback, which is
    where the axon client dials)."""
    try:
        r = subprocess.run(
            ["ss", "-tnlp"], capture_output=True, text=True, timeout=10
        )
    except (OSError, subprocess.TimeoutExpired):
        return set(), set(), set()
    rows = []
    for line in r.stdout.splitlines():
        cols = line.split("users:")[0].split()
        if len(cols) < 4 or ":" not in cols[3]:
            continue
        addr, port = _split_addr(cols[3])
        if port is not None:
            rows.append((addr, port, _line_pids(line)))
    relay_pids = set()
    for _addr, port, pids in rows:
        if port == _RELAY_PORT:
            relay_pids |= pids
    relay_ports = {
        port for _addr, port, pids in rows if pids & relay_pids
    } or {_RELAY_PORT}
    relay_addrs = set()
    for addr, _port, pids in rows:
        if pids & relay_pids:
            relay_addrs |= (
                _LOOPBACK_ADDRS if addr in _WILDCARD_ADDRS else {addr}
            )
    return relay_pids, relay_ports, relay_addrs or set(_LOOPBACK_ADDRS)


def stale_tpu_pids() -> list:
    """PIDs of OTHER processes holding a CLIENT connection to the relay.

    Identified by socket ownership (``ss -tnp``), never by command-line
    pattern. A second TPU process is the most common wedge cause (only one
    chip lease exists); after a crash the stale holder blocks every probe.

    Only sockets whose PEER endpoint is one of the relay's listen ports AT
    one of the relay's listen addresses count: matching the port alone would
    also sweep unrelated processes with outbound connections to port
    8082/8092-8107 on some OTHER host. The relay's own accept-side sockets
    have those ports as their LOCAL address, and killing the host-managed
    relay would destroy ALL TPU access for the session (it must never be
    restarted — CLAUDE.md). The relay's pids are additionally excluded
    outright.
    """
    relay_pids, relay_ports, relay_addrs = _relay_listen_ports()
    try:
        r = subprocess.run(
            ["ss", "-tnp"], capture_output=True, text=True, timeout=10
        )
    except (OSError, subprocess.TimeoutExpired):
        return []
    pids = set()
    for line in r.stdout.splitlines():
        cols = line.split("users:")[0].split()
        # State Recv-Q Send-Q Local:Port Peer:Port -> peer is the 5th column
        if len(cols) < 5 or ":" not in cols[4]:
            continue
        peer_addr, peer_port = _split_addr(cols[4])
        if peer_port not in relay_ports or peer_addr not in relay_addrs:
            continue
        pids.update(_line_pids(line))
    return sorted(pids - _ancestor_pids() - relay_pids)


def sweep_stale_tpu(log=None) -> int:
    """SIGKILL other relay-connected processes (stale lease holders).

    Returns the number of processes killed. Only call this when probes are
    failing AND no legitimate TPU job of yours should be running — a live
    training run also holds a relay connection.
    """
    if log is None:
        log = lambda m: print(m, file=sys.stderr)  # noqa: E731
    import signal

    killed = 0
    for pid in stale_tpu_pids():
        try:
            os.kill(pid, signal.SIGKILL)
            log(f"tpu transport: killed stale relay-connected pid {pid}")
            killed += 1
        except OSError:
            pass
    return killed


def tpu_transport_ready() -> bool:
    """Non-blocking: True if this process can expect jax.devices() to work."""
    if not _is_axon():
        return True
    return _relay_port_open()


def wait_for_tpu(
    max_wait_s: float = 900.0, *, log=None, sweep_after_failures: int = 0
) -> bool:
    """Block until the remote TPU transport answers a probe (or give up).

    Returns True when a probe matmul succeeded (or the backend is local).
    While the relay port is closed this polls cheaply every 30 s; once the
    port is open it runs at most one probe per quiet window so a wedged lease
    is not kept wedged by the probes themselves. Quiet windows ESCALATE
    (6 -> 9 -> 12 -> 15 min, capped) — the 2026-08-19 outage needed more than
    three 6-min windows, so fixed-width windows can give up just before the
    lease recovers. If the deadline lands mid-window, one last probe runs
    before surrendering.

    ``sweep_after_failures``: if > 0, after that many consecutive failed
    probes kill OTHER processes holding relay connections (stale lease
    holders from a crashed run). Leave 0 whenever a legitimate background
    TPU job (a mint) may be running.
    """
    if log is None:
        log = lambda m: print(m, file=sys.stderr)  # noqa: E731
    if not _is_axon():
        return True
    deadline = time.monotonic() + max_wait_s
    first = True
    failures = 0

    def _ok() -> bool:
        # The probe's process exit must settle before the caller claims the
        # chip, or the claim itself wedges the lease.
        log(
            f"tpu transport: probe ok; settling {_SETTLE_AFTER_PROBE_S}s "
            "before claiming the chip"
        )
        time.sleep(_SETTLE_AFTER_PROBE_S)
        return True

    while True:
        if _relay_port_open():
            if first:
                log("tpu transport: relay up, probing")
            if _probe_once():
                return _ok()
            failures += 1
            if sweep_after_failures and failures == sweep_after_failures:
                n = sweep_stale_tpu(log=log)
                log(f"tpu transport: swept {n} stale relay connection(s)")
            quiet = min(
                _QUIET_AFTER_FAILED_PROBE_S * (1 + 0.5 * (failures - 1)),
                _QUIET_MAX_S,
            )
            log(f"tpu transport: probe {failures} failed; quiet cool-down {quiet:.0f}s")
            if time.monotonic() + quiet > deadline:
                # Last chance: one final probe after whatever quiet time
                # remains (minimum half a window — a too-short quiet period
                # is known to keep the lease wedged).
                remaining = deadline - time.monotonic()
                if remaining < _QUIET_AFTER_FAILED_PROBE_S / 2:
                    return False
                time.sleep(remaining)
                log("tpu transport: final probe before surrendering")
                return _probe_once() and _ok()
            time.sleep(quiet)
        else:
            if first:
                log("tpu transport: relay port closed, waiting")
            if time.monotonic() + 30.0 > deadline:
                return False
            time.sleep(30.0)
        first = False
