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
