"""Training subsystem tests: synthesis determinism, loss gradients, a real
optimization step, encoder freezing, checkpoint round-trip."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import (
    DataConfig,
    ExperimentConfig,
    PhysicsConfig,
    TrainConfig,
)
from style_transfer_based_holographic_imaging_tpu.data.synth import (
    sklearn_digit_bank,
    synth_batch,
    InfiniteHologramSampler,
)
from style_transfer_based_holographic_imaging_tpu.models import StyleTransferNet, init_net_params
from style_transfer_based_holographic_imaging_tpu.train import (
    create_train_state,
    make_train_step,
    save_checkpoint,
    restore_checkpoint,
    tv_loss,
)

SMALL_DATA = DataConfig(batch_size=2, image_size=64, digit_pad=16)
PHYSICS = PhysicsConfig()


@pytest.fixture(scope="module")
def bank():
    return sklearn_digit_bank(32)


@pytest.fixture(scope="module")
def small_params():
    # host copy: train steps donate their state, which would delete shared
    # device buffers between tests
    return jax.device_get(init_net_params(jax.random.key(0), image_size=64))


def test_digit_bank_range(bank):
    assert bank.shape == (1797, 32, 32)
    assert bank.min() >= 0.0 and bank.max() <= 1.0


def test_synth_batch_shapes_and_determinism(bank):
    key = jax.random.key(7)
    b1 = synth_batch(key, jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS, return_gt=True)
    b2 = synth_batch(key, jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS, return_gt=True)
    assert b1["content_holo"].shape == (2, 1, 64, 64)
    assert b1["distance_style"].shape == (2, 1, 1, 1)
    np.testing.assert_array_equal(np.asarray(b1["content_holo"]), np.asarray(b2["content_holo"]))
    # distances come from the configured lists (fp32-rounded)
    dc = np.asarray(b1["distance_content"]).flatten()
    choices = np.asarray(SMALL_DATA.content_distances, np.float32)
    assert all(np.isclose(v, choices).any() for v in dc), dc


class TestShapeWarpAugmentation:
    def test_off_by_default_exact_parity(self, bank):
        """rotate_deg=elastic_px=0 must NOT change the synthesized batch at
        all (reference parity: flip/translate are its only transforms)."""
        key = jax.random.key(11)
        b0 = synth_batch(key, jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS)
        d_off = dataclasses.replace(SMALL_DATA, rotate_deg=0.0, elastic_px=0.0)
        b1 = synth_batch(key, jnp.asarray(bank), data=d_off, physics=PHYSICS)
        np.testing.assert_array_equal(
            np.asarray(b0["content_holo"]), np.asarray(b1["content_holo"])
        )

    def test_warp_changes_holograms_deterministically(self, bank):
        key = jax.random.key(11)
        d_aug = dataclasses.replace(SMALL_DATA, rotate_deg=20.0, elastic_px=2.0)
        b0 = synth_batch(key, jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS)
        b1 = synth_batch(key, jnp.asarray(bank), data=d_aug, physics=PHYSICS)
        b2 = synth_batch(key, jnp.asarray(bank), data=d_aug, physics=PHYSICS)
        assert not np.allclose(
            np.asarray(b0["content_holo"]), np.asarray(b1["content_holo"])
        )
        np.testing.assert_array_equal(
            np.asarray(b1["content_holo"]), np.asarray(b2["content_holo"])
        )

    def test_warp_preserves_range_and_mass(self, bank):
        """Bilinear warp of a [0, p] phase object stays in range and keeps
        most of its ink (rotation + small elastic flow, zero fill)."""
        key = jax.random.key(3)
        d_aug = dataclasses.replace(
            SMALL_DATA, rotate_deg=25.0, elastic_px=2.5, translate_frac=0.0
        )
        g = synth_batch(
            key, jnp.asarray(bank), data=d_aug, physics=PHYSICS, return_gt=True
        )
        ph = np.asarray(g["phase_content"])
        assert ph.min() >= 0.0
        assert ph.max() <= 1.0 + 1e-5
        g0 = synth_batch(
            key, jnp.asarray(bank), data=dataclasses.replace(d_aug, rotate_deg=0.0, elastic_px=0.0),
            physics=PHYSICS, return_gt=True,
        )
        mass0 = np.asarray(g0["phase_content"]).sum(axis=(1, 2, 3))
        mass1 = ph.sum(axis=(1, 2, 3))
        assert np.all(mass1 > 0.75 * mass0), (mass0, mass1)


def test_infinite_sampler_reproducible(bank):
    s1 = InfiniteHologramSampler(bank, SMALL_DATA, PHYSICS)
    s2 = InfiniteHologramSampler(bank, SMALL_DATA, PHYSICS)
    a = next(s1)
    _ = next(s2)
    s3 = InfiniteHologramSampler(bank, SMALL_DATA, PHYSICS, start_iteration=0)
    c = next(s3)
    np.testing.assert_array_equal(np.asarray(a["style_holo"]), np.asarray(c["style_holo"]))


def test_tv_loss_zero_for_constant():
    assert float(tv_loss(jnp.ones((1, 1, 8, 8)))) == 0.0


class TestTrainStep:
    @pytest.fixture(scope="class")
    def stepped(self, bank, small_params):
        cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
        net = StyleTransferNet()
        # host snapshot: the train step donates the state, deleting the
        # original device buffers
        params_before = jax.device_get(small_params)
        state = create_train_state(small_params, cfg)
        step_fn = make_train_step(net, PHYSICS, cfg)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS,
            return_gt=True,
        )
        new_state, aux = step_fn(state, batch, jax.random.key(1))
        return params_before, new_state, aux

    def test_losses_finite(self, stepped):
        _, _, aux = stepped
        for k, v in aux.items():
            assert np.isfinite(float(v)), k

    def test_decoder_updated_encoder_frozen(self, stepped):
        params0, new_state, _ = stepped
        p0 = params0["params"]
        p1 = jax.device_get(new_state.params)["params"]
        enc_same = jax.tree.all(
            jax.tree.map(lambda a, b: bool(jnp.all(a == b)), p0["encoder"], p1["encoder"])
        )
        dec_changed = not jax.tree.all(
            jax.tree.map(lambda a, b: bool(jnp.all(a == b)), p0["decoder"], p1["decoder"])
        )
        dist_changed = not jax.tree.all(
            jax.tree.map(
                lambda a, b: bool(jnp.all(a == b)), p0["distance_g"], p1["distance_g"]
            )
        )
        assert enc_same, "encoder must stay frozen"
        assert dec_changed, "decoder must receive updates"
        assert dist_changed, "distance head must receive updates"

    def test_loss_decreases_over_steps(self, bank, small_params):
        cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0, lr=2e-4)
        net = StyleTransferNet()
        state = create_train_state(small_params, cfg)
        step_fn = make_train_step(net, PHYSICS, cfg)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS,
            return_gt=True,
        )
        losses = []
        rng = jax.random.key(3)
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, aux = step_fn(state, batch, sub)
            losses.append(float(aux["loss_total"]))
        assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path, small_params):
    cfg = TrainConfig(checkpoint_dir=str(tmp_path))
    state = create_train_state(small_params, cfg)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = save_checkpoint(state, str(tmp_path))
    fresh = create_train_state(init_net_params(jax.random.key(9), image_size=64), cfg)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 42
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEma:
    def test_tracks_polyak_average(self, bank, small_params):
        cfg = TrainConfig(checkpoint_every=0, ema_decay=0.5)
        net = StyleTransferNet()
        state = create_train_state(jax.device_get(small_params), cfg)
        step_fn = make_train_step(net, PHYSICS, cfg)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS,
            return_gt=True,
        )
        expected = jax.device_get(state.params)
        for i in range(3):
            state, _ = step_fn(state, batch, jax.random.key(i + 1))
            p = jax.device_get(state.params)
            expected = jax.tree.map(lambda e, q: 0.5 * e + 0.5 * q, expected, p)
        got = jax.device_get(state.ema_params)
        for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-6)

    def test_off_by_default(self, small_params):
        state = create_train_state(
            jax.device_get(small_params), TrainConfig(checkpoint_every=0)
        )
        assert state.ema_params is None

    def test_checkpoint_roundtrip(self, tmp_path, small_params):
        cfg = TrainConfig(checkpoint_dir=str(tmp_path), ema_decay=0.9)
        state = create_train_state(jax.device_get(small_params), cfg)
        # Make EMA distinguishable from params.
        state = state.replace(
            ema_params=jax.tree.map(lambda x: x + 1.0, state.ema_params)
        )
        path = save_checkpoint(state, str(tmp_path))
        fresh = create_train_state(
            jax.device_get(init_net_params(jax.random.key(9), image_size=64)), cfg
        )
        restored = restore_checkpoint(path, fresh)
        a = jax.tree.leaves(state.ema_params)[0]
        b = jax.tree.leaves(restored.ema_params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_pre_ema_snapshot_seeds_from_params(self, tmp_path, small_params):
        # Snapshot written WITHOUT EMA, restored into an EMA-enabled run:
        # the average must seed from the restored params, not stale init.
        plain = create_train_state(
            jax.device_get(small_params), TrainConfig(checkpoint_dir=str(tmp_path))
        )
        path = save_checkpoint(plain, str(tmp_path))
        fresh = create_train_state(
            jax.device_get(init_net_params(jax.random.key(9), image_size=64)),
            TrainConfig(checkpoint_dir=str(tmp_path), ema_decay=0.9),
        )
        restored = restore_checkpoint(path, fresh)
        a = jax.tree.leaves(restored.params)[0]
        b = jax.tree.leaves(restored.ema_params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_path_runs(bank):
    """Adversarial plumbing: one step with adv_weight>0 updates D too."""
    from style_transfer_based_holographic_imaging_tpu.models import PatchDiscriminator

    cfg = TrainConfig(checkpoint_every=0, adv_weight=1.0)
    net = StyleTransferNet()
    params = init_net_params(jax.random.key(0), image_size=64)
    disc = PatchDiscriminator(image_size=64)
    disc_params = jax.device_get(disc.init(jax.random.key(1), jnp.ones((1, 64, 64, 1))))
    state = create_train_state(params, cfg, disc_params=disc_params)
    step_fn = make_train_step(net, PHYSICS, cfg, disc=disc)
    batch = synth_batch(
        jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA, physics=PHYSICS,
        return_gt=True,
    )
    new_state, aux = step_fn(state, batch, jax.random.key(2))
    assert "loss_adv" in aux and "loss_disc" in aux
    assert np.isfinite(float(aux["loss_disc"]))
    changed = not jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), disc_params, new_state.disc_params)
    )
    assert changed, "discriminator must receive updates"


class TestGradClip:
    def test_global_norm_clip_bounds_update(self):
        import optax

        from style_transfer_based_holographic_imaging_tpu.config import TrainConfig
        from style_transfer_based_holographic_imaging_tpu.train.state import (
            make_optimizer,
        )

        params = {"w": jnp.ones((4,))}
        huge = {"w": jnp.full((4,), 1e6)}
        tx = make_optimizer(TrainConfig(freeze_encoder=False, grad_clip_norm=1.0))
        upd, _ = tx.update(huge, tx.init(params), params)
        # adam's first-step update magnitude is ~lr regardless, so compare the
        # *clipped gradient* path directly instead:
        clip = optax.clip_by_global_norm(1.0)
        g, _ = clip.update(huge, clip.init(params))
        assert float(optax.global_norm(g)) <= 1.0 + 1e-5

    def test_clip_disabled(self):
        from style_transfer_based_holographic_imaging_tpu.config import TrainConfig
        from style_transfer_based_holographic_imaging_tpu.train.state import (
            make_optimizer,
        )

        # grad_clip_norm=0 must build a working optimizer (no clip stage)
        params = {"w": jnp.ones((4,))}
        tx = make_optimizer(TrainConfig(freeze_encoder=False, grad_clip_norm=0.0))
        upd, _ = tx.update({"w": jnp.ones((4,))}, tx.init(params), params)
        assert jnp.all(jnp.isfinite(upd["w"]))


class TestConfigRoundtrip:
    def test_json_roundtrip_stays_hashable(self):
        """JSON deserialization must return tuples for sequence fields —
        these frozen configs are static jit arguments (a restored config
        with list fields crashed extract_style_vector with
        'unhashable type: list')."""
        from style_transfer_based_holographic_imaging_tpu.config import (
            DOMAIN_PRESETS,
            ExperimentConfig,
        )

        for name in ("mnist", "polystyrene", "red_blood_cell"):
            cfg = DOMAIN_PRESETS[name]()
            back = ExperimentConfig.from_json(cfg.to_json())
            hash(back.data)
            hash(back.physics)
            assert back.data.content_distances == cfg.data.content_distances
            assert back.physics.band_limit == cfg.physics.band_limit
            assert back.model.width == cfg.model.width


class TestTrainMetricsJsonl:
    def test_jsonl_written(self, tmp_path):
        import json as _json

        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            ExperimentConfig,
            TrainConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            sklearn_digit_bank,
        )
        from style_transfer_based_holographic_imaging_tpu.train import train

        out = tmp_path / "run"
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=2, image_size=64, digit_pad=0),
            train=TrainConfig(
                iterations=2, freeze_encoder=False, checkpoint_every=0,
                log_every=1, checkpoint_dir=str(out),
            ),
        )
        train(cfg, bank=sklearn_digit_bank()[:8])
        lines = (out / "train_metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = _json.loads(lines[-1])
        assert rec["step"] == 2
        assert "loss_total" in rec and "img_per_sec" in rec

    def test_tensorboard_mirror(self, tmp_path):
        """TrainConfig.tensorboard_dir mirrors the JSONL scalars to a
        TensorBoard event dir (the reference's tensorboardX role,
        requirements.txt:6)."""
        import struct

        event_pb2 = pytest.importorskip("tensorboardX.proto.event_pb2")

        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            ExperimentConfig,
            TrainConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            sklearn_digit_bank,
        )
        from style_transfer_based_holographic_imaging_tpu.train import train

        tb_dir = tmp_path / "tb"
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=2, image_size=64, digit_pad=0),
            train=TrainConfig(
                iterations=2, freeze_encoder=False, checkpoint_every=0,
                log_every=1, checkpoint_dir=str(tmp_path / "run"),
                tensorboard_dir=str(tb_dir),
            ),
        )
        train(cfg, bank=sklearn_digit_bank()[:8])

        files = sorted(tb_dir.glob("events.out.tfevents.*"))
        assert files, "no event file written"
        # TFRecord framing: u64 length, u32 len-crc, payload, u32 data-crc.
        scalars = {}
        raw = files[0].read_bytes()
        off = 0
        while off < len(raw):
            (length,) = struct.unpack_from("<Q", raw, off)
            payload = raw[off + 12 : off + 12 + length]
            off += 12 + length + 4
            ev = event_pb2.Event.FromString(payload)
            for v in ev.summary.value:
                scalars.setdefault(v.tag, []).append((ev.step, v.simple_value))
        assert "train/loss_total" in scalars
        assert [s for s, _ in scalars["train/loss_total"]] == [1, 2]
        assert all(
            np.isfinite(val) for _, val in scalars["train/loss_total"]
        )


class TestGradAccumulation:
    def test_accumulated_step_matches_full_batch(self, bank, small_params):
        """grad_accum=4 over a batch of 4 must produce the same update as one
        full-batch step (all losses are per-sample means; dropout off)."""
        import dataclasses

        data = dataclasses.replace(SMALL_DATA, batch_size=4)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=data, physics=PHYSICS,
            return_gt=True,
        )
        net = StyleTransferNet()
        results = []
        for k in (1, 4):
            cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0, grad_accum=k)
            state = create_train_state(jax.device_get(small_params), cfg)
            step_fn = make_train_step(net, PHYSICS, cfg)
            new_state, aux = step_fn(state, jax.device_get(batch), jax.random.key(1))
            results.append((jax.device_get(new_state.params), float(aux["loss_total"])))
        p1, l1 = results[0]
        p4, l4 = results[1]
        assert abs(l1 - l4) < 1e-3 * max(abs(l1), 1.0)
        leaves1 = jax.tree_util.tree_leaves(p1["params"]["decoder"])
        leaves4 = jax.tree_util.tree_leaves(p4["params"]["decoder"])
        for a, b in zip(leaves1, leaves4):
            np.testing.assert_allclose(a, b, atol=5e-6)

    def test_adv_with_accum_rejected(self):
        cfg = TrainConfig(adv_weight=1.0, grad_accum=2)
        with pytest.raises(ValueError, match="grad_accum"):
            make_train_step(StyleTransferNet(), PHYSICS, cfg)


def test_remat_step_matches_plain(bank, small_params):
    """cfg.remat recomputes activations in the backward pass — results must
    be identical to the plain step (same program semantics)."""
    import dataclasses

    data = dataclasses.replace(SMALL_DATA, batch_size=2)
    batch = synth_batch(
        jax.random.key(0), jnp.asarray(bank), data=data, physics=PHYSICS,
        return_gt=True,
    )
    net = StyleTransferNet()
    outs = []
    for remat in (False, True):
        cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0, remat=remat)
        state = create_train_state(jax.device_get(small_params), cfg)
        step_fn = make_train_step(net, PHYSICS, cfg)
        new_state, aux = step_fn(state, jax.device_get(batch), jax.random.key(1))
        outs.append((jax.device_get(new_state.params), float(aux["loss_total"])))
    (p0, l0), (p1, l1) = outs
    assert abs(l0 - l1) < 1e-5 * max(abs(l0), 1.0)
    for a, b in zip(
        jax.tree_util.tree_leaves(p0["params"]["decoder"]),
        jax.tree_util.tree_leaves(p1["params"]["decoder"]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_load_release_params_roundtrip(tmp_path, small_params):
    """The shared release-restore helper loads a params-only checkpoint
    (the path every script now goes through)."""
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.train import (
        load_release_params,
    )

    path = str(tmp_path / "release")
    host = jax.device_get(small_params)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": host})
    ckptr.wait_until_finished()
    got = load_release_params(path, image_size=64)
    a = jax.tree_util.tree_leaves(host)[0]
    b = jax.tree_util.tree_leaves(got)[0]
    np.testing.assert_array_equal(a, b)


def test_latest_snapshot_skips_orbax_tmp_dirs(tmp_path):
    """An interrupted orbax save leaves iter_<n>.orbax-checkpoint-tmp-<ts>
    dirs behind; snapshot discovery must neither crash on them nor pick the
    partial snapshot (the crash-recovery path this helper serves)."""
    from style_transfer_based_holographic_imaging_tpu.train import latest_snapshot

    (tmp_path / "iter_35000").mkdir()
    (tmp_path / "iter_40000.orbax-checkpoint-tmp-1723456789").mkdir()
    got = latest_snapshot(str(tmp_path))
    assert got is not None and got.endswith("iter_35000")

    # Still None for a dir holding only temp debris.
    only_tmp = tmp_path / "only_tmp"
    only_tmp.mkdir()
    (only_tmp / "iter_1000.orbax-checkpoint-tmp-1").mkdir()
    assert latest_snapshot(str(only_tmp)) is None


def test_to_network_units_inverts_to_metres():
    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig

    for physics in (
        PhysicsConfig(),
        PhysicsConfig(distance_normalize=25.0, distance_normalize_constant=0.3),
    ):
        d_mm = np.array([0.2, 0.6, 6.0, 20.0])
        net = physics.to_network_units(d_mm)
        np.testing.assert_allclose(physics.to_metres(net), d_mm * 1e-3, rtol=1e-12)


class TestMixedPrecisionTrain:
    """ModelConfig.dtype="bfloat16": bf16 conv compute, fp32 params/losses."""

    def test_bf16_step_runs_fp32_params(self, bank, small_params):
        cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
        net = StyleTransferNet(dtype=jnp.bfloat16)
        state = create_train_state(jax.device_get(small_params), cfg)
        step_fn = make_train_step(net, PHYSICS, cfg)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA,
            physics=PHYSICS, return_gt=True,
        )
        new_state, aux = step_fn(state, batch, jax.random.key(1))
        for k, v in aux.items():
            assert np.isfinite(np.asarray(v, np.float32)).all(), k
        # params and every loss stay fp32 under the bf16 compute path
        for leaf in jax.tree.leaves(new_state.params):
            assert leaf.dtype == jnp.float32
        assert aux["loss_total"].dtype == jnp.float32

    def test_bf16_losses_close_to_fp32(self, bank, small_params):
        cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA,
            physics=PHYSICS, return_gt=True,
        )
        losses = {}
        for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            net = StyleTransferNet(dtype=dt)
            state = create_train_state(jax.device_get(small_params), cfg)
            step_fn = make_train_step(net, PHYSICS, cfg)
            _, aux = step_fn(state, batch, jax.random.key(1))
            losses[name] = float(aux["loss_total"])
        # bf16 conv rounding moves the loss a little, not qualitatively
        rel = abs(losses["bf16"] - losses["fp32"]) / abs(losses["fp32"])
        assert rel < 0.05, losses

    def test_compute_dtype_parse(self):
        from style_transfer_based_holographic_imaging_tpu.train.loop import (
            _compute_dtype,
        )

        assert _compute_dtype("bfloat16") == jnp.bfloat16
        assert _compute_dtype("float32") == jnp.float32
        with pytest.raises(ValueError):
            _compute_dtype("fp16")


class TestRestoreDirection:
    """orbax cannot restore partial targets — both directions of optional-
    field mismatch between snapshot and run must still restore params."""

    def test_ema_snapshot_into_plain_run(self, tmp_path, small_params):
        ema_state = create_train_state(
            small_params,
            TrainConfig(checkpoint_dir=str(tmp_path), ema_decay=0.9),
        )
        path = save_checkpoint(ema_state, str(tmp_path))
        plain = create_train_state(
            jax.device_get(init_net_params(jax.random.key(9), image_size=64)),
            TrainConfig(checkpoint_dir=str(tmp_path)),
        )
        restored = restore_checkpoint(path, plain)
        assert restored.ema_params is None  # run doesn't use EMA
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(ema_state.params)[0]),
            np.asarray(jax.tree.leaves(restored.params)[0]),
        )

    def test_gan_snapshot_into_plain_run(self, tmp_path, small_params):
        from style_transfer_based_holographic_imaging_tpu.models import (
            PatchDiscriminator,
        )

        disc = PatchDiscriminator(image_size=64)
        dp = jax.device_get(
            disc.init(jax.random.key(1), jnp.ones((1, 64, 64, 1)))
        )
        gan = create_train_state(
            small_params,
            TrainConfig(checkpoint_dir=str(tmp_path), adv_weight=1.0),
            disc_params=dp,
        )
        path = save_checkpoint(gan, str(tmp_path))
        plain = create_train_state(
            jax.device_get(init_net_params(jax.random.key(9), image_size=64)),
            TrainConfig(checkpoint_dir=str(tmp_path)),
        )
        restored = restore_checkpoint(path, plain)
        assert restored.disc_params is None  # run is non-adversarial
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(gan.params)[0]),
            np.asarray(jax.tree.leaves(restored.params)[0]),
        )


def test_resume_adv_from_non_adv_state(bank):
    """Resuming with adv_weight > 0 from a plain state must attach a fresh
    discriminator (and train it), not silently drop L_adv."""
    from style_transfer_based_holographic_imaging_tpu.train import train

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=2, image_size=64, digit_pad=16),
        train=TrainConfig(iterations=1, checkpoint_every=0, adv_weight=1.0),
    )
    plain = create_train_state(
        jax.device_get(init_net_params(jax.random.key(0), image_size=64)),
        TrainConfig(checkpoint_every=0),
    )
    state = train(cfg, bank=bank, state=plain)
    assert state.disc_params is not None
    assert state.disc_opt_state is not None


class TestPerceptualLoss:
    """VGG-feature (encoder-tap) supervised term (TrainConfig.perceptual_weight)."""

    def _loss(self, bank, params, weight, sup=0.0):
        import functools

        from style_transfer_based_holographic_imaging_tpu.train.loop import (
            generator_loss_fn,
        )

        cfg = TrainConfig(
            supervised_weight=sup, perceptual_weight=weight, adv_weight=0.0
        )
        batch = synth_batch(
            jax.random.key(0), jnp.asarray(bank), data=SMALL_DATA,
            physics=PHYSICS, return_gt=True,
        )
        fn = functools.partial(
            generator_loss_fn, net=StyleTransferNet(), physics=PHYSICS, cfg=cfg
        )
        (loss, aux), grads = jax.value_and_grad(fn, has_aux=True)(
            jax.device_put(params), batch, jax.random.key(1)
        )
        return loss, aux, grads

    def test_term_finite_and_additive(self, bank, small_params):
        _, aux0, _ = self._loss(bank, small_params, 0.0)
        loss1, aux1, grads = self._loss(bank, small_params, 2.0)
        assert "loss_perceptual" not in aux0
        lp = float(aux1["loss_perceptual"])
        assert np.isfinite(lp) and lp > 0.0
        assert abs(float(loss1) - float(aux0["loss_total"]) - 2.0 * lp) < 1e-4
        # gradient reaches the decoder through the predicted phase
        g_dec = grads["params"]["decoder"]["conv0"]["kernel"]
        assert float(jnp.max(jnp.abs(g_dec))) > 0.0

    def test_feature_extractor_is_stop_gradded(self, bank, small_params):
        """The perceptual term alone must not push the encoder toward
        feature collapse: its encoder gradient flows only through the
        predicted phase (finite), and zeroing the prediction path's
        contribution is not directly assertable — instead pin the contract
        that the pipelined trainer refuses the un-plumbed term."""
        from jax.sharding import Mesh

        from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
            make_pipeline_train_fn,
        )

        cfg = TrainConfig(perceptual_weight=1.0)
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
        with pytest.raises(ValueError, match="perceptual_weight"):
            make_pipeline_train_fn(
                jax.device_put(small_params), mesh, n_micro=2, image_size=64,
                physics=PHYSICS, cfg=cfg,
            )
