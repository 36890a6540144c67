"""Dedicated phase-decoder (decoder_ph) support: the reference ships and
loads decoder_ph_iter_80000.pth.tar (test_field_retrieval_mnist.py:70-77);
here the head is trainable (ModelConfig.with_phase_decoder) and eval/serving
auto-detect it from the checkpoint tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import (
    DataConfig,
    PhysicsConfig,
    TrainConfig,
)
from style_transfer_based_holographic_imaging_tpu.models import (
    StyleTransferNet,
    init_net_params,
)
from style_transfer_based_holographic_imaging_tpu.models.net import has_phase_decoder

PHYSICS = PhysicsConfig()


@pytest.fixture(scope="module")
def ph_params():
    return jax.device_get(
        init_net_params(jax.random.key(0), image_size=64, with_phase_decoder=True)
    )


def test_detection(ph_params):
    assert has_phase_decoder(ph_params)
    assert not has_phase_decoder(
        init_net_params(jax.random.key(0), image_size=64)
    )


def test_retrieval_autodetects_and_uses_decoder_ph(ph_params):
    """retrieval_step built with net=None must route phase through
    decoder_ph — its output differs from the main decoder's phase channel."""
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        retrieval_step,
    )

    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((2, 1, 64, 64), np.float32) + 0.05)
    sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
    ss = sm + 0.5
    out = retrieval_step(ph_params, holo, sm, ss, 0.2, PHYSICS)
    # same params through a net WITHOUT the phase head -> main-decoder phase
    out_plain = retrieval_step(
        ph_params, holo, sm, ss, 0.2, PHYSICS, net=StyleTransferNet()
    )
    assert np.allclose(
        np.asarray(out["amp_field"]), np.asarray(out_plain["amp_field"])
    ), "amplitude path must be unchanged"
    assert not np.allclose(
        np.asarray(out["ph_field"]), np.asarray(out_plain["ph_field"])
    ), "phase must come from decoder_ph, not the main decoder's channel 1"


def test_quant_path_serves_decoder_ph(ph_params):
    """Round 3: the int8 serving path covers decoder_ph checkpoints (the
    round-2 NotImplementedError guard is gone — parity contracts live in
    tests/test_quant.py::test_int8_phase_decoder_parity)."""
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        retrieval_step,
    )

    holo = jnp.ones((1, 1, 64, 64), jnp.float32)
    sm = jnp.ones((1, 1, 1, 512), jnp.float32)
    out = retrieval_step(
        ph_params, holo, sm, sm, 0.2, PHYSICS, quant_scales={"conv0": 1.0}
    )
    assert np.all(np.isfinite(np.asarray(out["ph_field"])))


def test_train_step_updates_decoder_ph(ph_params):
    """One optimizer step must move decoder_ph weights (it feeds g_t_phase,
    so physics/supervised gradients reach it) while the frozen encoder
    stays put."""
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        sklearn_digit_bank,
        synth_batch,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        create_train_state,
        make_train_step,
    )

    data = DataConfig(batch_size=2, image_size=64, digit_pad=16)
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
    bank = jnp.asarray(sklearn_digit_bank(32))
    batch = synth_batch(
        jax.random.key(0), bank, data=data, physics=PHYSICS, return_gt=True
    )
    state = create_train_state(ph_params, cfg)
    net = StyleTransferNet(with_phase_decoder=True)
    step = make_train_step(net, PHYSICS, cfg)
    new_state, aux = step(state, batch, jax.random.key(1))
    p0 = ph_params["params"]
    p1 = jax.device_get(new_state.params)["params"]
    moved = not jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), p0["decoder_ph"], p1["decoder_ph"])
    )
    enc_same = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), p0["encoder"], p1["encoder"])
    )
    assert moved, "decoder_ph must receive gradient updates"
    assert enc_same
    assert np.isfinite(float(aux["loss_total"]))


def test_golden_eval_smoke_with_decoder_ph(ph_params):
    """evaluate_golden_suite must run a decoder_ph checkpoint end to end
    (auto-detection through make_retrieval_fn)."""
    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    goldens = load_golden_suite().subset(1)  # one batch keeps it fast
    params = init_net_params(jax.random.key(0), with_phase_decoder=True)
    m = evaluate_golden_suite(params, goldens, ExperimentConfig())
    assert np.isfinite(m["mean_psnr"])
