"""Dataset-layer tests: .mat trees (all three domain layouts), prefetch,
streaming retrieval."""

import os

import numpy as np
import pytest
import scipy.io as sio

from style_transfer_based_holographic_imaging_tpu.data.mat_loader import HoloMatDataset
from style_transfer_based_holographic_imaging_tpu.data.prefetch import prefetch_to_device


def _write_mat(path, key, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sio.savemat(path, {key: arr})


@pytest.fixture
def generic_tree(tmp_path):
    root = tmp_path / "sample_domain"
    rng = np.random.default_rng(0)
    for d in (5.0, 6.0):
        for j in range(3):
            _write_mat(
                str(root / "train" / "holography" / ("%1.2f" % d) / f"h{j}.mat"),
                "holography",
                rng.random((32, 32)).astype(np.float64),
            )
    return str(root)


@pytest.fixture
def poly_tree(tmp_path):
    root = tmp_path / "polystyrene_bead"
    rng = np.random.default_rng(0)
    for fov in (1, 2):
        for d in (5, 6):
            _write_mat(
                str(root / f"fov{fov}" / "test" / "holography" / str(d) / "h0.mat"),
                "holography",
                rng.random((16, 16)),
            )
            _write_mat(
                str(root / f"fov{fov}" / "test" / "gt_amplitude" / f"gt_amplitude{d-4}.mat"),
                "gt_amplitude",
                rng.random((16, 16)),
            )
            _write_mat(
                str(root / f"fov{fov}" / "test" / "gt_phase" / f"gt_phase{d-4}.mat"),
                "gt_phase",
                rng.random((16, 16)),
            )
    return str(root)


@pytest.fixture
def rbc_tree(tmp_path):
    root = tmp_path / "red_blood_cell"
    rng = np.random.default_rng(0)
    for d, n in ((6.0, 5), (7.0, 3)):
        for j in range(1, n + 1):
            _write_mat(
                str(root / "test" / "holography" / ("%1.1f" % d) / f"holography{j}.mat"),
                "holography",
                rng.random((16, 16)),
            )
    return str(root)


class TestMatLoader:
    def test_generic_train_tree(self, generic_tree):
        ds = HoloMatDataset(generic_tree, "train", distances=[5.0, 6.0])
        assert len(ds) == 6
        item = ds[0]
        assert item["holo"].shape == (1, 32, 32)
        assert item["holo"].dtype == np.float32
        assert float(item["distance"]) == 5.0

    def test_poly_fov_tree_with_gt(self, poly_tree):
        ds = HoloMatDataset(poly_tree, "test", distances=[5, 6])
        assert ds.domain == "polystyrene"
        assert len(ds) == 4  # 2 fovs x 2 distances x 1 file
        item = ds[0]
        assert "gt_amplitude" in item and "gt_phase" in item
        assert item["gt_amplitude"].shape == (1, 16, 16)

    def test_rbc_frame_counts(self, rbc_tree):
        ds = HoloMatDataset(
            rbc_tree, "test", distances=[6.0, 7.0], rbc_frames={6.0: 5, 7.0: 3}
        )
        assert ds.domain == "red_blood_cell"
        assert len(ds) == 8
        assert all(r.gt_amplitude_path is None for r in ds.records)

    def test_batches(self, generic_tree):
        ds = HoloMatDataset(generic_tree, "train", distances=[5.0, 6.0])
        batches = list(ds.batches(4))
        assert batches[0]["holo"].shape == (4, 1, 32, 32)
        assert batches[0]["distance"].shape == (4, 1, 1, 1)
        assert batches[1]["holo"].shape == (2, 1, 32, 32)
        assert len(list(ds.batches(4, drop_remainder=True))) == 1


class TestPrefetch:
    def test_roundtrip_and_order(self):
        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), buffer_size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(np.asarray(b["x"])[0, 0]) == i

    def test_producer_error_propagates(self):
        def gen():
            yield {"x": np.zeros((1,), np.float32)}
            raise RuntimeError("boom")

        it = prefetch_to_device(gen())
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


class TestStreaming:
    def test_stream_retrieval_over_mat_tree(self, rbc_tree):
        import jax
        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.models import init_net_params
        from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
            stream_retrieval,
            StreamStats,
        )

        ds = HoloMatDataset(
            rbc_tree, "test", distances=[6.0], rbc_frames={6.0: 5}
        )
        params = init_net_params(jax.random.key(0), image_size=16)
        rng = np.random.default_rng(0)
        sv = (
            rng.random((1, 1, 1, 512)).astype(np.float32),
            rng.random((1, 1, 1, 512)).astype(np.float32) + 0.5,
        )
        stats = StreamStats()
        outs = list(
            stream_retrieval(
                params,
                ds.batches(2),
                sv,
                ExperimentConfig(data=DataConfig(style_distances=(6.0,))),
                stats=stats,
            )
        )
        assert stats.n_frames == 5
        assert sum(o["amp_field"].shape[0] for o in outs) == 5
        assert outs[0]["amp_field"].shape[-2:] == (16, 16)


class TestInterpolationSweep:
    def test_sweep_batch(self):
        import jax
        import jax.numpy as jnp
        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            PhysicsConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            synth_interpolation_batch,
        )

        data = DataConfig(
            image_size=32,
            digit_pad=8,
            style_distances=(0.2, 0.3, 0.4),
            content_distances=(0.5,),
        )
        bank = jnp.asarray(np.random.default_rng(0).random((4, 16, 16)), jnp.float32)
        out = synth_interpolation_batch(
            jax.random.key(0), bank, data=data, physics=PhysicsConfig()
        )
        assert out["style_holo"].shape == (3, 1, 32, 32)
        # One content object held fixed across the sweep...
        c = np.asarray(out["content_holo"])
        np.testing.assert_allclose(c[0], c[1], atol=1e-6)
        np.testing.assert_allclose(c[0], c[2], atol=1e-6)
        # ...while the style plane sweeps the configured distances.
        d_s = np.asarray(out["distance_style"]).reshape(-1)
        np.testing.assert_allclose(d_s, [0.2, 0.3, 0.4], rtol=1e-6)
        s = np.asarray(out["style_holo"])
        assert np.abs(s[0] - s[1]).max() > 1e-4

    def test_repackage_tool_dry_run(self, generic_tree, capsys):
        import subprocess
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [
                _sys.executable,
                os.path.join(repo, "scripts", "repackage_mat_dataset.py"),
                "--src", generic_tree,
                "--dst", generic_tree + "_flat",
                "--distances", "5:7",
                "--dry-run",
            ],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 0, r.stderr
        assert "repackaged" in r.stdout


class TestNativeMatReader:
    def test_parity_with_scipy(self, tmp_path):
        from style_transfer_based_holographic_imaging_tpu.data.mat_native import (
            native_available,
            read_mat_2d,
        )

        if not native_available():
            pytest.skip("native/libmatio.so not built")
        rng = np.random.default_rng(0)
        cases = {
            "plain_f64": rng.standard_normal((17, 23)),
            "f32": rng.standard_normal((8, 8)).astype(np.float32),
            "u8": (rng.random((5, 9)) * 255).astype(np.uint8),
            "i16": (rng.random((4, 6)) * 1000 - 500).astype(np.int16),
        }
        for compress in (False, True):
            for name, arr in cases.items():
                p = str(tmp_path / f"{name}_{compress}.mat")
                sio.savemat(p, {"holography": arr}, do_compression=compress)
                out = read_mat_2d(p, "holography")
                assert out is not None, f"{name} compress={compress}"
                ref = sio.loadmat(p)["holography"]
                np.testing.assert_allclose(out, ref.astype(np.float64))

    def test_missing_variable_falls_back(self, tmp_path):
        from style_transfer_based_holographic_imaging_tpu.data.mat_loader import (
            load_matfile,
        )
        from style_transfer_based_holographic_imaging_tpu.data.mat_native import (
            read_mat_2d,
            native_available,
        )

        p = str(tmp_path / "x.mat")
        sio.savemat(p, {"other": np.ones((3, 3))})
        if native_available():
            assert read_mat_2d(p, "holography") is None
        # keyed load falls back to scipy and still exposes the real variable
        d = load_matfile(p, "holography")
        assert "other" in d

    def test_dataset_uses_native_path(self, generic_tree):
        from style_transfer_based_holographic_imaging_tpu.data.mat_loader import (
            HoloMatDataset,
        )

        ds = HoloMatDataset(generic_tree, "train", (5.0, 6.0))
        item = ds[0]
        assert item["holo"].shape == (1, 32, 32)
        assert np.isfinite(item["holo"]).all()

    def test_multi_variable_compressed(self, tmp_path):
        """Regression: element-scan must re-sync past UNPADDED miCOMPRESSED
        elements so variables after the first stay reachable."""
        from style_transfer_based_holographic_imaging_tpu.data.mat_native import (
            native_available,
            read_mat_2d,
        )

        if not native_available():
            pytest.skip("native/libmatio.so not built")
        rng = np.random.default_rng(1)
        a, b = rng.random((7, 5)), rng.random((33, 17))
        for comp in (False, True):
            p = str(tmp_path / f"multi_{comp}.mat")
            sio.savemat(p, {"first": a, "holography": b}, do_compression=comp)
            out = read_mat_2d(p, "holography")
            assert out is not None, f"compress={comp}"
            np.testing.assert_allclose(out, b)


class TestSyntheticDomainBanks:
    def test_bead_bank(self):
        from style_transfer_based_holographic_imaging_tpu.data.synth import bead_bank

        bank = bead_bank(8, 32, seed=1)
        assert bank.shape == (8, 32, 32)
        assert bank.min() >= 0.0 and bank.max() <= 1.0 + 1e-6
        assert (bank.reshape(8, -1).max(axis=1) > 0.5).all()  # beads present

    def test_rbc_bank_biconcave(self):
        from style_transfer_based_holographic_imaging_tpu.data.synth import rbc_bank

        bank = rbc_bank(8, 48, seed=2)
        assert bank.shape == (8, 48, 48)
        assert bank.min() >= 0.0 and bank.max() <= 1.0 + 1e-6
        # Biconcave: a cell's rim is thicker than its centre. Verify on a
        # single-cell field by construction.
        one = rbc_bank(1, 64, radius_range=(0.3, 0.3), seed=0)[0]
        cy, cx = np.unravel_index(np.argmax(one), one.shape)
        # centre of the cell = centroid of its support
        ys, xs = np.nonzero(one > 0.01)
        c_y, c_x = int(ys.mean()), int(xs.mean())
        assert one[c_y, c_x] < one.max()  # dimple at the centre

    def test_banks_feed_synth_batch(self):
        import jax
        import jax.numpy as jnp
        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            PhysicsConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            bead_bank,
            synth_batch,
        )

        data = DataConfig(batch_size=4, image_size=32, digit_pad=8,
                          style_distances=(8.0,), content_distances=(5.0, 10.0))
        physics = PhysicsConfig(distance_normalize=20.0)
        out = synth_batch(jax.random.key(0), jnp.asarray(bead_bank(8, 16)),
                          data=data, physics=physics)
        assert out["content_holo"].shape == (4, 1, 32, 32)
        assert np.isfinite(np.asarray(out["content_holo"])).all()


def test_prefetch_releases_producer_on_early_exit():
    """Abandoning the prefetch iterator must not leave the producer thread
    blocked on the bounded queue (pinning staged HBM batches)."""
    import threading
    import time

    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.data.prefetch import (
        prefetch_to_device,
    )

    n_before = threading.active_count()
    src = ({"x": np.full((4,), i, np.float32)} for i in range(100))
    it = prefetch_to_device(src, buffer_size=2)
    first = next(it)
    assert float(first["x"][0]) == 0.0
    it.close()  # consumer walks away after one batch
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_load_digit_bank_formats(tmp_path):
    """The offline-MNIST drop-in accepts both the repo's {'bank'} layout and
    standard MNIST .npz exports (x_train 28x28 uint8), normalizing both to
    (N, 64, 64) float32 in [0, 1]."""
    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        load_digit_bank,
    )

    rng = np.random.default_rng(0)
    p1 = tmp_path / "bank.npz"
    np.savez(p1, bank=rng.random((3, 64, 64)).astype(np.float32))
    b1 = load_digit_bank(str(p1))
    assert b1.shape == (3, 64, 64) and b1.dtype == np.float32

    p2 = tmp_path / "mnist.npz"
    np.savez(p2, x_train=(rng.random((5, 28, 28)) * 255).astype(np.uint8))
    b2 = load_digit_bank(str(p2))
    assert b2.shape == (5, 64, 64)
    assert 0.0 <= b2.min() and b2.max() <= 1.0

    p3 = tmp_path / "bad.npz"
    np.savez(p3, something=np.zeros((2, 2)))
    import pytest

    with pytest.raises(ValueError):
        load_digit_bank(str(p3))


def test_morphed_digit_bank():
    """The bank-diversity lever (scripts/make_big_bank.py): morphs keep the
    originals verbatim at the front, produce distinct in-range shapes, and
    are deterministic in the seed."""
    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        morphed_digit_bank,
        sklearn_digit_bank,
    )

    base = sklearn_digit_bank()[:16]
    out = morphed_digit_bank(base, 48, seed=7, batch=32)
    assert out.shape == (48, 64, 64)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_array_equal(out[:16], base)
    # morphs are new shapes, not copies, and not empty
    morphs = out[16:]
    assert (morphs > 0.2).mean(axis=(1, 2)).min() > 0.005
    dists = np.abs(morphs[:, None] - base[None]).mean(axis=(2, 3)).min(axis=1)
    assert (dists > 1e-3).all()
    again = morphed_digit_bank(base, 48, seed=7, batch=32)
    np.testing.assert_array_equal(out, again)
    # n <= len(base) short-circuits
    np.testing.assert_array_equal(morphed_digit_bank(base, 8), base[:8])
