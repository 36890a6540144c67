"""End-to-end pipeline tests on the golden suite (random-init weights).

These exercise the full jitted program (sqrt -> encode -> AdaIN -> decode ->
distance -> refocus -> unwrap -> metrics) and the report artifacts; numeric
quality gates belong to the trained-checkpoint evaluation, not here.
"""

import os

import numpy as np
import jax
import pytest

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.models import init_net_params
from style_transfer_based_holographic_imaging_tpu.pipelines import (
    make_retrieval_fn,
    evaluate_golden_suite,
)


@pytest.fixture(scope="module")
def params():
    return init_net_params(jax.random.key(0))


def test_retrieval_step_shapes(goldens, params):
    cfg = ExperimentConfig()
    fn = make_retrieval_fn(cfg.physics)
    out = fn(
        params,
        goldens.content_holo[0],
        goldens.style_mean,
        goldens.style_std,
        goldens.distance_style[0],
    )
    assert out["amp_field"].shape == (5, 1, 128, 128)
    assert out["ph_foc"].shape == (5, 1, 128, 128)
    assert out["distance_pred"].shape == (5, 1, 1, 1)
    d = np.asarray(out["distance_pred"])
    assert ((d > 0) & (d < 1)).all()


def test_evaluate_golden_suite_with_artifacts(goldens, params, tmp_path):
    import dataclasses

    # Shrink to 2 batches for speed: evaluate handles any batch count.
    small = dataclasses.replace(
        goldens,
        content_holo=goldens.content_holo[:2],
        distance_style=goldens.distance_style[:2],
        distance_content=goldens.distance_content[:2],
        gt_amplitude=goldens.gt_amplitude[:2],
        gt_phase=goldens.gt_phase[:2],
    )
    metrics = evaluate_golden_suite(params, small, save_dir=str(tmp_path))
    assert np.isfinite(metrics["mean_psnr"])
    assert np.isfinite(metrics["mean_mae"])
    assert np.isfinite(metrics["r2"])
    assert len(metrics["distance_true_um"]) == 10
    # artifacts: 10 montages + box-plot + metrics.jsonl
    files = os.listdir(tmp_path)
    assert "distance_prediction.png" in files
    assert "metrics.jsonl" in files
    assert sum(f.endswith("_test.png") for f in files) == 10


def test_evaluate_synth_domain(params):
    from style_transfer_based_holographic_imaging_tpu.config import DOMAIN_PRESETS
    from style_transfer_based_holographic_imaging_tpu.data.synth import rbc_bank
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_synth_domain,
    )

    import dataclasses

    cfg = DOMAIN_PRESETS["red_blood_cell"]()
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, batch_size=2))
    bank = rbc_bank(n=8, seed=123)
    sm = np.random.default_rng(0).random((1, 1, 1, 512)).astype(np.float32)
    ss = sm + 0.5
    m = evaluate_synth_domain(params, cfg, bank, (sm, ss), n_batches=2)
    assert np.isfinite(m["mean_psnr"]) and np.isfinite(m["r2"])
    assert m["n_samples"] == 4
    # distances come back in the domain's physical range (mm -> um)
    assert all(3000.0 <= d <= 9000.0 for d in m["distance_true_um"])

    # refine_distance path: reported distances must be the refined ones
    # (different from the random-init head's), still finite and in-range.
    mr = evaluate_synth_domain(
        params, cfg, bank, (sm, ss), n_batches=1,
        refine_steps=5, refine_distance=True,
    )
    assert np.isfinite(mr["mean_psnr"])
    assert mr["distance_pred_um"] != m["distance_pred_um"][: len(mr["distance_pred_um"])]


def test_retrieval_deterministic(goldens, params):
    cfg = ExperimentConfig()
    fn = make_retrieval_fn(cfg.physics)
    a = fn(params, goldens.content_holo[0], goldens.style_mean, goldens.style_std,
           goldens.distance_style[0])
    b = fn(params, goldens.content_holo[0], goldens.style_mean, goldens.style_std,
           goldens.distance_style[0])
    np.testing.assert_array_equal(np.asarray(a["ph_foc"]), np.asarray(b["ph_foc"]))


class TestStylize:
    def test_stylize_shapes_and_alpha(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from style_transfer_based_holographic_imaging_tpu.models import init_net_params
        from style_transfer_based_holographic_imaging_tpu.pipelines.stylize import stylize

        params = init_net_params(jax.random.key(0), image_size=32)
        rng = np.random.default_rng(0)
        content = jnp.asarray(rng.random((2, 1, 32, 32), np.float32))
        style = jnp.asarray(rng.random((2, 1, 32, 32), np.float32))
        out = stylize(params, content, style, alpha=1.0)
        assert out["amp"].shape == (2, 1, 32, 32)
        assert out["phase"].shape == (2, 1, 32, 32)
        # alpha=0 must equal a pure content round-trip (no style mixing).
        out0 = stylize(params, content, style, alpha=0.0)
        outc = stylize(params, content, content, alpha=1.0)
        np.testing.assert_allclose(
            np.asarray(out0["amp"]), np.asarray(outc["amp"]), rtol=1e-4, atol=1e-5
        )


def test_stream_converts_style_distance_to_network_units():
    """stream_retrieval takes style distances in mm and must divide by
    distance_normalize (the domain presets use 10/25 — passing mm straight
    through refocused RBC frames at 60 mm instead of 6)."""
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import (
        DataConfig,
        ModelConfig,
        PhysicsConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
        stream_retrieval,
    )

    cfg = ExperimentConfig(
        physics=PhysicsConfig(distance_normalize=10.0),
        model=ModelConfig(image_size=32),
        data=DataConfig(image_size=32, style_distances=(6.0,)),
    )
    small = init_net_params(jax.random.key(0), image_size=32)
    rng = np.random.default_rng(0)
    holo = (rng.random((2, 1, 32, 32)) * 0.6 + 0.05).astype(np.float32)
    sm = rng.random((1, 1, 1, 512)).astype(np.float32)
    ss = (rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32)

    got = next(iter(stream_retrieval(small, [{"holo": holo}], (sm, ss), cfg)))

    fn = make_retrieval_fn(cfg.physics)
    want = fn(
        small,
        jnp.asarray(holo),
        jnp.asarray(sm),
        jnp.asarray(ss),
        jnp.full((2, 1, 1, 1), 0.6, jnp.float32),  # 6.0 mm / 10
    )
    np.testing.assert_allclose(
        np.asarray(got["amp_foc"]), np.asarray(want["amp_foc"]), atol=1e-5
    )


def test_stream_pads_ragged_tail_single_program():
    """A ragged final batch must not retrace: it is padded to the compiled
    shape and trimmed back in the yielded outputs."""
    from style_transfer_based_holographic_imaging_tpu.config import (
        DataConfig,
        ModelConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
        StreamStats,
        stream_retrieval,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
    )
    small = init_net_params(jax.random.key(0), image_size=32)
    rng = np.random.default_rng(0)
    sm = rng.random((1, 1, 1, 512)).astype(np.float32)
    ss = (rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32)
    mk = lambda b: {
        "holo": (rng.random((b, 1, 32, 32)) * 0.6 + 0.05).astype(np.float32)
    }
    stats = StreamStats()
    outs = list(
        stream_retrieval(small, [mk(4), mk(3)], (sm, ss), cfg, stats=stats)
    )
    assert outs[0]["amp_foc"].shape[0] == 4
    assert outs[1]["amp_foc"].shape[0] == 3  # trimmed, not padded or dropped
    assert stats.n_frames == 7


def test_bf16_outputs_are_fp32():
    """A bf16-net retrieval must return fp32 arrays: ml_dtypes bfloat16
    leaks through np.savez (the server's npz wire format) as raw void
    '|V2' arrays the client cannot interpret."""
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig

    small = init_net_params(jax.random.key(0), image_size=32)
    rng = np.random.default_rng(0)
    holo = (rng.random((2, 1, 32, 32)) * 0.6 + 0.05).astype(np.float32)
    sm = rng.random((1, 1, 1, 512)).astype(np.float32)
    ss = (rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32)
    fn = make_retrieval_fn(PhysicsConfig(), dtype=jnp.bfloat16)
    out = fn(small, jnp.asarray(holo), jnp.asarray(sm), jnp.asarray(ss), 0.2)
    for k, v in out.items():
        assert v.dtype == jnp.float32, (k, v.dtype)


def test_stream_chunks_oversize_batches():
    """A batch LARGER than the first must be chunked down to the compiled
    shape (one program, no retrace) — outputs arrive chunk by chunk with
    the frame total preserved."""
    import jax.numpy as jnp  # noqa: F401

    from style_transfer_based_holographic_imaging_tpu.config import (
        DataConfig,
        ModelConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
        StreamStats,
        stream_retrieval,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(image_size=32), data=DataConfig(image_size=32)
    )
    small = init_net_params(jax.random.key(0), image_size=32)
    rng = np.random.default_rng(0)
    sm = rng.random((1, 1, 1, 512)).astype(np.float32)
    ss = (rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32)
    mk = lambda b: {
        "holo": (rng.random((b, 1, 32, 32)) * 0.6 + 0.05).astype(np.float32)
    }
    stats = StreamStats()
    outs = list(
        stream_retrieval(small, [mk(2), mk(5)], (sm, ss), cfg, stats=stats)
    )
    assert [o["amp_foc"].shape[0] for o in outs] == [2, 2, 2, 1]
    assert stats.n_frames == 7


def test_refine_accepts_asm_backend_string():
    """asm_backend is a static jit arg — the documented string values must
    not hit the tracer (regression: TypeError on any non-None value)."""
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
        physics_refine,
    )

    rng = np.random.default_rng(0)
    amp = jnp.asarray(rng.random((1, 1, 16, 16), np.float32) + 0.1)
    ph = jnp.asarray(rng.random((1, 1, 16, 16), np.float32))
    d = jnp.full((1, 1, 1, 1), 0.3, jnp.float32)
    meas = jnp.asarray(rng.random((1, 1, 16, 16), np.float32) + 0.1)
    out = physics_refine(
        amp, ph, d, meas, PhysicsConfig(), steps=2, asm_backend="xla"
    )
    assert np.isfinite(float(np.asarray(out["residual"])[0]))
