"""Transport health-check prologue (utils/transport.py)."""

import socket

from style_transfer_based_holographic_imaging_tpu.utils import transport


def test_non_axon_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert transport.tpu_transport_ready()
    assert transport.wait_for_tpu(0.0)


def test_port_check(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    monkeypatch.setattr(transport, "_RELAY_PORT", port)
    assert transport._relay_port_open()
    srv.close()
    assert not transport._relay_port_open(timeout=0.5)


def test_wait_gives_up_fast_when_relay_down(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(transport, "_RELAY_PORT", 1)  # nothing listens on 1
    assert transport.wait_for_tpu(1.0) is False


def test_wait_probes_when_port_open(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(transport, "_relay_port_open", lambda *a, **k: True)
    monkeypatch.setattr(transport, "_SETTLE_AFTER_PROBE_S", 0)
    calls = []
    monkeypatch.setattr(transport, "_probe_once", lambda: calls.append(1) or True)
    assert transport.wait_for_tpu(60.0)
    assert calls == [1]


def test_wait_escalates_quiet_windows_and_final_probe(monkeypatch):
    """Failed probes escalate the quiet window (6 -> 9 -> 12 min, capped)
    and a deadline landing mid-window still gets one last probe."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(transport, "_relay_port_open", lambda *a, **k: True)
    monkeypatch.setattr(transport, "_SETTLE_AFTER_PROBE_S", 0)

    clock = [0.0]
    monkeypatch.setattr(transport.time, "monotonic", lambda: clock[0])
    sleeps = []
    monkeypatch.setattr(
        transport.time, "sleep", lambda s: (sleeps.append(s), clock.__setitem__(0, clock[0] + s))
    )
    probes = []
    # fail 3 probes, then succeed on the 4th (the final pre-surrender probe)
    monkeypatch.setattr(
        transport, "_probe_once", lambda: probes.append(1) or len(probes) >= 4
    )
    assert transport.wait_for_tpu(1500.0, log=lambda m: None)
    assert len(probes) == 4
    # escalation: 360, 540, then the final-window remainder (1500-900=600)
    assert sleeps[0] == 360 and sleeps[1] == 540
    assert sleeps[2] == 600  # remainder >= half a window -> last-chance probe


def test_wait_sweeps_stale_after_n_failures(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(transport, "_relay_port_open", lambda *a, **k: True)
    monkeypatch.setattr(transport, "_SETTLE_AFTER_PROBE_S", 0)
    monkeypatch.setattr(transport.time, "sleep", lambda s: None)
    swept = []
    monkeypatch.setattr(transport, "sweep_stale_tpu", lambda log=None: swept.append(1) or 0)
    probes = []
    monkeypatch.setattr(
        transport, "_probe_once", lambda: probes.append(1) or len(probes) >= 3
    )
    assert transport.wait_for_tpu(10_000.0, sweep_after_failures=2, log=lambda m: None)
    assert swept == [1]  # exactly once, after the 2nd failed probe


def test_stale_pids_excludes_self(monkeypatch):
    import os

    fake = (
        "ESTAB 0 0 127.0.0.1:51000 127.0.0.1:8082 "
        f'users:(("python",pid={os.getpid()},fd=5))\n'
        'ESTAB 0 0 127.0.0.1:51002 127.0.0.1:8082 users:(("python",pid=999999,fd=5))\n'
        'ESTAB 0 0 127.0.0.1:51004 127.0.0.1:9999 users:(("python",pid=888888,fd=5))\n'
    )

    class R:
        stdout = fake

    monkeypatch.setattr(transport.subprocess, "run", lambda *a, **k: R())
    assert transport.stale_tpu_pids() == [999999]


def test_sweep_excludes_relay_and_finds_clients(monkeypatch):
    """stale_tpu_pids must return CLIENT pids (peer = a relay listen port)
    and NEVER the relay's own pids — its accept-side sockets carry the
    relay port as the LOCAL address, and SIGKILLing the host-managed relay
    would permanently destroy TPU access (round-2 review finding)."""
    import subprocess
    import types

    LISTEN = (
        "State  Recv-Q Send-Q Local Address:Port  Peer Address:Port Process\n"
        'LISTEN 0 64 127.0.0.1:8082 0.0.0.0:* users:(("python3",pid=444,fd=3))\n'
        'LISTEN 0 64 127.0.0.1:8102 0.0.0.0:* users:(("python3",pid=444,fd=17))\n'
        'LISTEN 0 1024 127.0.0.1:9999 0.0.0.0:* users:(("other",pid=9,fd=9))\n'
    )
    ESTAB = (
        "State Recv-Q Send-Q Local Address:Port  Peer Address:Port Process\n"
        # relay's accept-side socket (local = relay port) -> must NOT match
        'ESTAB 0 0 127.0.0.1:8102 127.0.0.1:48778 users:(("python3",pid=444,fd=31))\n'
        # stale client on a NON-first relay port -> must match
        'ESTAB 0 0 127.0.0.1:48778 127.0.0.1:8102 users:(("python",pid=31337,fd=11))\n'
        # unrelated connection -> must NOT match
        'ESTAB 0 0 127.0.0.1:1111 127.0.0.1:9999 users:(("other",pid=9,fd=9))\n'
    )

    def fake_run(cmd, **kw):
        out = LISTEN if "-tnlp" in cmd else ESTAB
        return types.SimpleNamespace(stdout=out, returncode=0)

    monkeypatch.setattr(transport.subprocess, "run", fake_run)
    relay_pids, ports, addrs = transport._relay_listen_ports()
    assert relay_pids == {444}
    assert ports == {8082, 8102}
    assert addrs == {"127.0.0.1"}
    assert transport.stale_tpu_pids() == [31337]


def test_sweep_requires_relay_peer_address(monkeypatch):
    """A connection to a relay PORT on some OTHER host is not a relay client
    (round-2 advisor finding: port-only matching would SIGKILL any process
    with an outbound connection to 8082/8092-8107 anywhere)."""
    import types

    LISTEN = (
        "State  Recv-Q Send-Q Local Address:Port  Peer Address:Port Process\n"
        'LISTEN 0 64 127.0.0.1:8082 0.0.0.0:* users:(("python3",pid=444,fd=3))\n'
    )
    ESTAB = (
        "State Recv-Q Send-Q Local Address:Port  Peer Address:Port Process\n"
        # outbound to port 8082 on a REMOTE host -> must NOT match
        'ESTAB 0 0 10.0.0.7:51000 93.184.216.34:8082 users:(("curl",pid=777,fd=5))\n'
        # true relay client (loopback peer) -> must match
        'ESTAB 0 0 127.0.0.1:48778 127.0.0.1:8082 users:(("python",pid=31337,fd=11))\n'
    )

    def fake_run(cmd, **kw):
        out = LISTEN if "-tnlp" in cmd else ESTAB
        return types.SimpleNamespace(stdout=out, returncode=0)

    monkeypatch.setattr(transport.subprocess, "run", fake_run)
    assert transport.stale_tpu_pids() == [31337]
