"""Measured-.mat-tree training path: sampler semantics, no-GT train step,
CLI wiring (reference Holo_loader train split, utils/Data_loader.py:72-139)."""

import os

import numpy as np
import jax
import pytest
import scipy.io as sio

from style_transfer_based_holographic_imaging_tpu.config import (
    DataConfig,
    PhysicsConfig,
    TrainConfig,
)
from style_transfer_based_holographic_imaging_tpu.data.mat_sampler import (
    MeasuredHologramSampler,
)

DATA = DataConfig(
    batch_size=2,
    image_size=32,
    style_distances=(6.0,),
    content_distances=(4.0, 5.0),
)
PHYSICS = PhysicsConfig(distance_normalize=10.0)


def _write_mat(path, key, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sio.savemat(path, {key: arr})


@pytest.fixture(scope="module")
def train_tree(tmp_path_factory):
    """RBC-layout train split: frames larger than the train patch so the
    random crop is exercised (40x48 vs patch 32)."""
    root = tmp_path_factory.mktemp("rbc_tree") / "red_blood_cell"
    rng = np.random.default_rng(0)
    for d in (4.0, 5.0, 6.0):
        for j in range(3):
            _write_mat(
                str(root / "train" / "holography" / ("%1.1f" % d) / f"h{j}.mat"),
                "holography",
                rng.random((40, 48)).astype(np.float64) * 2.0,
            )
    return str(root)


class TestMeasuredSampler:
    def test_batch_shapes_and_pools(self, train_tree):
        s = MeasuredHologramSampler(train_tree, DATA, PHYSICS)
        assert len(s.ds) == 9
        # 3 frames at the style distance, 6 at the content distances
        assert len(s._style_idx) == 3 and len(s._content_idx) == 6
        b = next(s)
        assert b["content_holo"].shape == (2, 1, 32, 32)
        assert b["style_holo"].shape == (2, 1, 32, 32)
        assert b["distance_style"].shape == (2, 1, 1, 1)
        assert set(b) == {
            "content_holo", "style_holo", "distance_content", "distance_style",
        }, "measured batches must carry no GT keys (no-GT regime)"

    def test_sqrt_and_network_units(self, train_tree):
        s = MeasuredHologramSampler(train_tree, DATA, PHYSICS)
        b = next(s)
        # intensities up to 2.0 -> sqrt <= sqrt(2); raw would exceed it
        assert float(b["content_holo"].max()) <= np.sqrt(2.0) + 1e-6
        d = np.unique(b["distance_style"])
        np.testing.assert_allclose(
            d, PHYSICS.to_network_units(np.float32(6.0)), rtol=1e-6
        )

    def test_resume_determinism(self, train_tree):
        s1 = MeasuredHologramSampler(train_tree, DATA, PHYSICS)
        next(s1)
        b1 = next(s1)
        s2 = MeasuredHologramSampler(train_tree, DATA, PHYSICS, start_iteration=1)
        b2 = next(s2)
        np.testing.assert_array_equal(b1["content_holo"], b2["content_holo"])
        np.testing.assert_array_equal(b1["distance_content"], b2["distance_content"])

    def test_lazy_matches_preloaded(self, train_tree):
        b1 = next(MeasuredHologramSampler(train_tree, DATA, PHYSICS))
        b2 = next(MeasuredHologramSampler(train_tree, DATA, PHYSICS, preload=False))
        np.testing.assert_array_equal(b1["style_holo"], b2["style_holo"])

    def test_missing_distance_errors(self, train_tree):
        with pytest.raises(ValueError, match="style frames"):
            MeasuredHologramSampler(
                train_tree,
                DATA,
                PHYSICS,
                style_distances=(9.0,),
            )

    def test_undersized_frame_errors(self, train_tree):
        big = DataConfig(batch_size=2, image_size=64, style_distances=(6.0,),
                         content_distances=(4.0, 5.0))
        with pytest.raises(ValueError, match="smaller"):
            MeasuredHologramSampler(train_tree, big, PHYSICS)

    def test_style_batches(self, train_tree):
        s = MeasuredHologramSampler(train_tree, DATA, PHYSICS)
        batches = list(s.style_batches(2))
        assert len(batches) == 2 and batches[0].shape == (2, 1, 32, 32)


def test_no_gt_train_step_on_measured_batch(train_tree):
    """One real optimizer step on measured batches with the no-GT loss set:
    the supervised term must be absent and every other loss finite."""
    from style_transfer_based_holographic_imaging_tpu.models import (
        StyleTransferNet,
        init_net_params,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        create_train_state,
        make_train_step,
    )

    data = DataConfig(batch_size=2, image_size=64, style_distances=(6.0,),
                      content_distances=(4.0, 5.0))
    tree64 = os.path.join(os.path.dirname(train_tree), "tree64")
    rng = np.random.default_rng(1)
    for d in (4.0, 5.0, 6.0):
        _write_mat(
            os.path.join(tree64, "train", "holography", "%1.1f" % d, "h0.mat"),
            "holography",
            rng.random((64, 64)),
        )
    sampler = MeasuredHologramSampler(tree64, data, PHYSICS, domain="red_blood_cell")
    cfg = TrainConfig(checkpoint_every=0, supervised_weight=0.0)
    params = init_net_params(jax.random.key(0), image_size=64)
    state = create_train_state(params, cfg)
    step_fn = make_train_step(StyleTransferNet(), PHYSICS, cfg)
    state, aux = step_fn(state, next(sampler), jax.random.key(1))
    assert "loss_supervised" not in aux
    assert {"loss_physics", "loss_distance", "loss_content", "loss_style"} <= set(aux)
    for k, v in aux.items():
        assert np.isfinite(float(v)), k


def test_cli_train_mat_root_builds_sampler_and_forces_no_gt(
    tmp_path, monkeypatch
):
    """`cli train --mat-root` must construct the measured sampler against the
    domain preset, drop the synthetic bank, and force the no-GT loss set;
    train() itself is stubbed (the real step is covered above)."""
    import style_transfer_based_holographic_imaging_tpu.train as train_pkg
    from style_transfer_based_holographic_imaging_tpu import cli

    # rbc-preset-sized tree: the preset's DataConfig keeps the default
    # 128x128 train patch, so frames must be at least that.
    root = tmp_path / "red_blood_cell"
    rng = np.random.default_rng(2)
    for d in (4.0, 5.0, 6.0):
        _write_mat(
            str(root / "train" / "holography" / ("%1.1f" % d) / "h0.mat"),
            "holography",
            rng.random((132, 140)),
        )

    captured = {}

    def fake_train(cfg, *, bank=None, sampler=None, state=None, mesh=None,
                   partition="dp", **kw):
        captured.update(cfg=cfg, bank=bank, sampler=sampler)
        return "STATE"

    monkeypatch.setattr(train_pkg, "train", fake_train)
    monkeypatch.setattr(train_pkg, "save_checkpoint", lambda s, d: str(tmp_path))
    rc = cli.main([
        "train", "--cpu", "--mat-root", str(root), "--domain", "rbc",
        "--iterations", "1", "--batch-size", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    assert isinstance(captured["sampler"], MeasuredHologramSampler)
    assert captured["bank"] is None
    assert captured["cfg"].train.supervised_weight == 0.0
    assert captured["cfg"].physics.distance_normalize == 10.0  # rbc preset
