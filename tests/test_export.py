"""AOT export artifact (pipelines/export_artifact.py): serialize the whole
retrieval program to StableHLO, reload it without model code, match the live
program bit-for-bit."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.models import init_net_params
from style_transfer_based_holographic_imaging_tpu.pipelines import (
    export_retrieval,
    load_artifact,
    make_retrieval_fn,
    save_artifact,
)

CFG = ExperimentConfig()


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    params = init_net_params(jax.random.key(0))
    rng = np.random.RandomState(0)
    sm = rng.rand(512).astype(np.float32)
    ss = (rng.rand(512) + 0.5).astype(np.float32)
    blob, meta = export_retrieval(
        params, (sm, ss), CFG, batch_size=2, platforms=("cpu",)
    )
    path = str(tmp_path_factory.mktemp("export") / "model.hstx")
    save_artifact(path, blob, meta)
    return params, sm, ss, path


def test_artifact_matches_live_program(artifact):
    params, sm, ss, path = artifact
    art = load_artifact(path)
    assert art.meta["batch_size"] == 2
    assert art.meta["platforms"] == ["cpu"]
    assert art.meta["result_keys"][:2] == ["amp_foc", "ph_foc"]

    holo = np.random.RandomState(1).rand(2, 1, 128, 128).astype(np.float32) * 0.5
    out = art.retrieve(holo)

    fn = make_retrieval_fn(CFG.physics, alpha=CFG.eval.alpha)
    d = float(CFG.physics.to_network_units(CFG.data.style_distances[0]))
    ref = jax.device_get(fn(params, holo, jnp.asarray(sm), jnp.asarray(ss), d))
    for k in ("amp_foc", "ph_foc", "distance_pred", "amp_field", "ph_field"):
        assert float(np.max(np.abs(out[k] - np.asarray(ref[k])))) < 2e-4, k


def test_artifact_pads_and_chunks(artifact):
    _, _, _, path = artifact
    art = load_artifact(path)
    # 3 samples through a compiled batch of 2: chunk + pad-with-last + trim.
    holo = np.random.RandomState(2).rand(3, 1, 128, 128).astype(np.float32)
    out = art.retrieve(holo)
    assert out["ph_foc"].shape[0] == 3
    # (B, S, S) input is promoted to (B, 1, S, S); padding repeats the last
    # sample, so singletons work too.
    one = art.retrieve(holo[:1, 0])
    assert one["ph_foc"].shape[0] == 1
    assert np.allclose(one["ph_foc"], out["ph_foc"][:1], atol=1e-6)
    with pytest.raises(ValueError, match="expected"):
        art.retrieve(np.zeros((2, 1, 64, 64), np.float32))
    # Empty batches fail the shape contract (not an IndexError deep inside).
    with pytest.raises(ValueError, match="expected"):
        art.retrieve(np.zeros((0, 1, 128, 128), np.float32))


def test_result_keys_shared_with_server():
    """The frozen artifact's output contract IS the live server's response
    contract — one constant, imported, not copied."""
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        export_artifact,
        server,
    )

    assert server._RESULT_KEYS is export_artifact._RESULT_KEYS


def test_artifact_bad_magic(tmp_path):
    p = tmp_path / "junk.hstx"
    p.write_bytes(b"NOTANART" + b"\0" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        load_artifact(str(p))


def test_golden_eval_accepts_artifact_fn(artifact):
    """evaluate_golden_suite(retrieval_fn=...) scores a frozen artifact with
    the standard metrics path (the `cli export --check` flow)."""
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    _, sm, ss, path = artifact
    art = load_artifact(path)
    g = load_golden_suite()
    m = evaluate_golden_suite(
        None,
        g,
        CFG,
        style_override=(sm, ss),
        retrieval_fn=lambda p, holo, s1, s2, d: art.retrieve(np.asarray(holo)),
    )
    assert np.isfinite(m["mean_psnr"]) and np.isfinite(m["r2"])
    assert len(m["distance_true_um"]) == 100


def test_pallas_export_is_tpu_only(artifact, tmp_path):
    """asm_backend='pallas' embeds the Mosaic ASM kernel: the artifact is
    forced to platforms=['tpu'] (regardless of what was asked for) and
    refuses to execute on the CPU host."""
    params, sm, ss, _ = artifact
    blob, meta = export_retrieval(
        params,
        (sm, ss),
        CFG,
        batch_size=1,
        platforms=("cpu", "tpu"),
        asm_backend="pallas",
    )
    assert meta["platforms"] == ["tpu"]
    assert meta["asm_backend"] == "pallas"
    path = str(tmp_path / "tpu_only.hstx")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    holo = np.zeros((1, 1, 128, 128), np.float32)
    with pytest.raises(Exception, match="(?i)platform"):
        art.retrieve(holo)

    with pytest.raises(ValueError, match="asm_backend"):
        export_retrieval(params, (sm, ss), CFG, batch_size=1, asm_backend="cuda")


def test_artifact_service_http(artifact):
    """`cli serve --artifact`: the frozen file behind the HTTP daemon —
    healthz advertises the artifact, /retrieve round-trips."""
    import threading

    from http.server import ThreadingHTTPServer

    from style_transfer_based_holographic_imaging_tpu.pipelines.server import (
        ArtifactService,
        _make_handler,
        retrieve_remote,
    )

    _, _, _, path = artifact
    svc = ArtifactService(path)
    svc.warmup()
    assert svc.health()["artifact"] == path
    assert svc.health()["platforms"] == ["cpu"]

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_port}"
        holo = np.random.RandomState(3).rand(3, 1, 128, 128).astype(np.float32)
        out = retrieve_remote(url, holo)
        ref = svc.retrieve(holo)
        assert out["ph_foc"].shape == (3, 1, 128, 128)
        assert np.allclose(out["distance_pred"], ref["distance_pred"], atol=1e-6)
        assert svc.health()["n_served"] == 6
    finally:
        httpd.shutdown()
