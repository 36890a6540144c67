"""HTTP retrieval server (pipelines/server.py).

The reference has no serving surface; this covers the daemon we add on top:
compile-once fixed-batch semantics (padding + chunking), npz wire format,
and error handling.
"""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_based_holographic_imaging_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
)
from style_transfer_based_holographic_imaging_tpu.models import init_net_params
from style_transfer_based_holographic_imaging_tpu.pipelines.server import (
    RetrievalService,
    _make_handler,
)


@pytest.fixture(scope="module")
def service():
    cfg = ExperimentConfig(
        model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
    )
    params = init_net_params(jax.random.key(0), image_size=32)
    rng = np.random.default_rng(0)
    sm = rng.random((1, 1, 1, 512), np.float32)
    ss = rng.random((1, 1, 1, 512), np.float32) + 0.5
    svc = RetrievalService(params, (sm, ss), cfg, batch_size=4)
    svc.warmup()
    return svc


@pytest.fixture(scope="module")
def server_url(service):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _holo(b, rng=None):
    rng = rng or np.random.default_rng(1)
    return (rng.random((b, 1, 32, 32)) * 0.6 + 0.05).astype(np.float32)


class TestService:
    def test_pad_and_chunk_match_direct(self, service):
        """B=6 over a compiled batch of 4 (one padded chunk + one full) must
        equal the per-sample results of a straight call."""
        holo = _holo(6)
        out = service.retrieve(holo)
        assert out["amp_foc"].shape == (6, 1, 32, 32)
        assert out["distance_pred"].shape == (6, 1, 1, 1)
        # same samples, different batch packing -> identical results
        out2 = service.retrieve(holo[:4])
        np.testing.assert_allclose(
            out["amp_foc"][:4], out2["amp_foc"], rtol=0, atol=1e-5
        )

    def test_shape_validation(self, service):
        with pytest.raises(ValueError, match="expected"):
            service.retrieve(np.zeros((2, 1, 16, 16), np.float32))
        s = service.image_size
        with pytest.raises(ValueError, match="expected"):
            service.retrieve(np.zeros((0, 1, s, s), np.float32))

    def test_3d_input_promoted(self, service):
        out = service.retrieve(_holo(2)[:, 0])
        assert out["ph_foc"].shape == (2, 1, 32, 32)


class TestHTTP:
    def test_healthz(self, server_url):
        with urllib.request.urlopen(server_url + "/healthz") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["batch_size"] == 4
        assert h["image_size"] == 32

    def test_retrieve_roundtrip(self, server_url, service):
        holo = _holo(3)
        buf = io.BytesIO()
        np.savez_compressed(buf, holo=holo)
        req = urllib.request.Request(
            server_url + "/retrieve", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = dict(np.load(io.BytesIO(r.read())))
        assert out["amp_foc"].shape == (3, 1, 32, 32)
        want = service.retrieve(holo)
        np.testing.assert_allclose(out["ph_foc"], want["ph_foc"], atol=1e-5)

    def test_bad_request_is_400_and_keeps_serving(self, server_url):
        req = urllib.request.Request(
            server_url + "/retrieve", data=b"not-an-npz", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        with urllib.request.urlopen(server_url + "/healthz") as r:
            assert json.loads(r.read())["status"] == "ok"

    def test_unknown_path_404(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server_url + "/nope")
        assert ei.value.code == 404


class TestMeshServing:
    def test_dp_mesh_matches_single_device(self, service):
        """The same service config over an 8-device DP mesh must reproduce the
        single-device results bitwise (params replicated, batch sharded)."""
        from style_transfer_based_holographic_imaging_tpu.parallel import make_mesh

        cfg = ExperimentConfig(
            model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
        )
        params = init_net_params(jax.random.key(0), image_size=32)
        rng = np.random.default_rng(0)
        sm = rng.random((1, 1, 1, 512), np.float32)
        ss = rng.random((1, 1, 1, 512), np.float32) + 0.5
        svc8 = RetrievalService(
            params, (sm, ss), cfg, batch_size=8, mesh=make_mesh(8)
        )
        holo = _holo(8)
        got = svc8.retrieve(holo)
        assert svc8.health()["n_devices"] == 8
        # reference: the module-scoped single-device service (batch 4, same
        # params/style RNG) — chunked into 2 batches of 4.
        want = service.retrieve(holo)
        # The congruent phase unwrap snaps to 2*pi multiples of the input; a
        # different batch packing can flip a rounding boundary on isolated
        # pixels, so compare modulo 2*pi.
        d = got["ph_foc"] - want["ph_foc"]
        d = d - 2 * np.pi * np.round(d / (2 * np.pi))
        np.testing.assert_allclose(d, 0.0, atol=1e-4)
        np.testing.assert_allclose(
            got["distance_pred"], want["distance_pred"], atol=2e-6
        )

    def test_indivisible_batch_rejected(self):
        from style_transfer_based_holographic_imaging_tpu.parallel import make_mesh

        cfg = ExperimentConfig(
            model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
        )
        params = init_net_params(jax.random.key(0), image_size=32)
        sm = np.zeros((1, 1, 1, 512), np.float32)
        ss = np.ones((1, 1, 1, 512), np.float32)
        with pytest.raises(ValueError, match="divisible"):
            RetrievalService(params, (sm, ss), cfg, batch_size=6, mesh=make_mesh(8))


def test_retrieve_remote_client(server_url, service):
    from style_transfer_based_holographic_imaging_tpu.pipelines.server import (
        retrieve_remote,
    )

    holo = _holo(2)
    out = retrieve_remote(server_url, holo)
    want = service.retrieve(holo)
    np.testing.assert_allclose(out["amp_foc"], want["amp_foc"], atol=1e-5)


class TestMeshServing2D:
    def test_2d_mesh_checks_data_axis_only(self):
        """batch_sharding shards over 'data' only — a (data=2, model=2) mesh
        must accept batch_size=2 (divisible by the data axis, not by the
        total device count), and a mesh without a 'data' axis must be
        rejected up front instead of failing opaquely in device_put."""
        from style_transfer_based_holographic_imaging_tpu.parallel import (
            DATA_AXIS,
            MODEL_AXIS,
            make_mesh,
        )

        cfg = ExperimentConfig(
            model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
        )
        params = init_net_params(jax.random.key(0), image_size=32)
        rng = np.random.default_rng(0)
        sm = rng.random((1, 1, 1, 512), np.float32)
        ss = rng.random((1, 1, 1, 512), np.float32) + 0.5
        mesh2d = make_mesh(
            4, axis_names=(DATA_AXIS, MODEL_AXIS), shape=(2, 2)
        )
        svc = RetrievalService(params, (sm, ss), cfg, batch_size=2, mesh=mesh2d)
        out = svc.retrieve(_holo(2))
        assert out["amp_foc"].shape == (2, 1, 32, 32)

        bad = make_mesh(4, axis_names=(MODEL_AXIS,), shape=(4,))
        with pytest.raises(ValueError, match="lack the batch axis"):
            RetrievalService(params, (sm, ss), cfg, batch_size=4, mesh=bad)
