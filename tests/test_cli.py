"""CLI surface tests (style_transfer_based_holographic_imaging_tpu.cli)."""

import os

import numpy as np
import pytest
import scipy.io as sio

from style_transfer_based_holographic_imaging_tpu.cli import main


class TestStreamCommand:
    def test_stream_mat_tree(self, tmp_path, capsys):
        root = tmp_path / "red_blood_cell"
        holo_dir = root / "test" / "holography" / "6.0"
        os.makedirs(holo_dir)
        rng = np.random.default_rng(0)
        for j in range(1, 5):
            sio.savemat(
                str(holo_dir / f"holography{j}.mat"),
                {"holography": rng.random((32, 32))},
            )
        sv = tmp_path / "sv.npz"
        np.savez(
            str(sv),
            mean=rng.random((1, 1, 1, 512)).astype(np.float32),
            std=(rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32),
        )
        rc = main(
            [
                "stream",
                "--root", str(root),
                "--domain", "red_blood_cell",
                "--distances", "6.0",
                "--style-vector", str(sv),
                "--batch-size", "2",
                "--cpu",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert '"frames": 4' in out

    def test_stream_empty_tree_errors(self, tmp_path):
        rc = main(
            ["stream", "--root", str(tmp_path), "--distances", "6.0",
             "--style-vector", "/nonexistent.npz", "--cpu"]
        )
        assert rc == 1

    def test_unknown_command_rejected(self):
        with pytest.raises(SystemExit):
            main(["definitely-not-a-command"])

    def test_stream_with_refinement(self, tmp_path, capsys):
        root = tmp_path / "red_blood_cell"
        holo_dir = root / "test" / "holography" / "6.0"
        os.makedirs(holo_dir)
        rng = np.random.default_rng(1)
        for j in range(1, 3):
            sio.savemat(
                str(holo_dir / f"holography{j}.mat"),
                {"holography": rng.random((32, 32))},
            )
        sv = tmp_path / "sv.npz"
        np.savez(
            str(sv),
            mean=rng.random((1, 1, 1, 512)).astype(np.float32),
            std=(rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32),
        )
        rc = main(
            ["stream", "--root", str(root), "--domain", "red_blood_cell",
             "--distances", "6.0", "--style-vector", str(sv),
             "--batch-size", "2", "--refine", "3", "--cpu"]
        )
        assert rc == 0
        assert '"frames": 2' in capsys.readouterr().out


class TestAutofocusCommand:
    def test_autofocus_npz_input(self, tmp_path, capsys):
        import json as _json

        import jax.numpy as jnp

        from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
        from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
        from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

        g = load_golden_suite()
        ph = np.asarray(g.gt_phase[0][:2])
        holo = np.asarray(
            holo_forward(np.full_like(ph, 0.6), ph, 0.5, PhysicsConfig())
        )
        f = tmp_path / "holos.npz"
        np.savez(str(f), holo=holo)
        rc = main(
            [
                "autofocus",
                "--input", str(f),
                "--d-min", "0.3",
                "--d-max", "0.7",
                "--n-coarse", "9",
                "--n-fine", "5",
                "--cpu",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = _json.loads(out)
        assert rec["n"] == 2
        assert abs(rec["d_mean"] - 0.5) < 0.08

    def test_autofocus_requires_input(self, capsys):
        rc = main(["autofocus", "--cpu"])
        assert rc == 1


class TestQuantScaleResolution:
    def test_domain_release_finds_sibling_scales(self, tmp_path):
        """checkpoints/rbc_release + --quant must resolve the sibling
        rbc_quant_scales.json, NOT the parent's flagship quant_scales.json."""
        import json
        import types

        from style_transfer_based_holographic_imaging_tpu.cli import (
            _load_quant_scales,
        )

        parent = tmp_path / "checkpoints"
        (parent / "rbc_release").mkdir(parents=True)
        json.dump({"conv1_1": 1.5}, open(parent / "rbc_quant_scales.json", "w"))
        json.dump({"conv1_1": 9.9}, open(parent / "quant_scales.json", "w"))
        args = types.SimpleNamespace(
            quant="auto", checkpoint=str(parent / "rbc_release")
        )
        scales = _load_quant_scales(args)
        assert scales == {"conv1_1": 1.5}

    def test_plain_release_uses_parent(self, tmp_path):
        import json
        import types

        from style_transfer_based_holographic_imaging_tpu.cli import (
            _load_quant_scales,
        )

        parent = tmp_path / "checkpoints"
        (parent / "release").mkdir(parents=True)
        json.dump({"conv1_1": 2.5}, open(parent / "quant_scales.json", "w"))
        args = types.SimpleNamespace(
            quant="auto", checkpoint=str(parent / "release")
        )
        assert _load_quant_scales(args) == {"conv1_1": 2.5}


class TestExitCodeNormalization:
    def test_rich_command_return_exits_zero(self, monkeypatch):
        """cmd_train/cmd_eval return rich objects (TrainState / metrics
        dict) for programmatic callers; main() must map those to exit
        status 0 — sys.exit(TrainState) dumped the repr and exited 1 on a
        SUCCESSFUL `cli train` run."""
        from style_transfer_based_holographic_imaging_tpu import cli

        monkeypatch.setattr(cli, "cmd_doctor", lambda args: {"rich": object()})
        assert cli.main(["doctor", "--cpu"]) == 0
        monkeypatch.setattr(cli, "cmd_doctor", lambda args: 1)
        assert cli.main(["doctor", "--cpu"]) == 1


class TestDoctorCommand:
    def test_doctor_reports_inventory(self, capsys):
        import json as _json

        rc = main(["doctor", "--cpu"])
        assert rc == 0
        rep = _json.loads(capsys.readouterr().out)
        assert "transport_ready" in rep
        assert "flagship" in rep["releases"]
        assert rep["releases"]["flagship"]["int8_scales"] is True


class TestStreamDP:
    def test_stream_devices_flag(self, tmp_path, capsys):
        """--devices 2: batch-DP streaming over the virtual CPU mesh; the
        ragged tail is padded to the compiled shape and trimmed back."""
        root = tmp_path / "red_blood_cell"
        holo_dir = root / "test" / "holography" / "6.0"
        os.makedirs(holo_dir)
        rng = np.random.default_rng(0)
        for j in range(1, 6):  # 5 frames: batches of 2 -> ragged tail of 1
            sio.savemat(
                str(holo_dir / f"holography{j}.mat"),
                {"holography": rng.random((32, 32))},
            )
        sv = tmp_path / "sv.npz"
        np.savez(
            str(sv),
            mean=rng.random((1, 1, 1, 512)).astype(np.float32),
            std=(rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32),
        )
        rc = main(
            [
                "stream",
                "--root", str(root),
                "--domain", "red_blood_cell",
                "--distances", "6.0",
                "--style-vector", str(sv),
                "--batch-size", "2",
                "--devices", "2",
                "--cpu",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert '"frames": 5' in out  # ragged tail padded + trimmed, not dropped


class TestDomainReleaseResolution:
    def test_sibling_config_and_style(self, tmp_path, monkeypatch):
        """checkpoints/rbc_release resolves rbc_config.json and
        rbc_style_vector.npz — never the flagship's (wrong physics/units)."""
        import json as _json
        import types

        from style_transfer_based_holographic_imaging_tpu.cli import (
            _load_config,
            _load_style,
        )
        from style_transfer_based_holographic_imaging_tpu.config import (
            DOMAIN_PRESETS,
            ExperimentConfig,
        )

        parent = tmp_path / "checkpoints"
        (parent / "rbc_release").mkdir(parents=True)
        (parent / "rbc_config.json").write_text(
            DOMAIN_PRESETS["red_blood_cell"]().to_json()
        )
        (parent / "config.json").write_text(ExperimentConfig().to_json())
        rng = np.random.default_rng(0)
        np.savez(parent / "rbc_style_vector.npz",
                 mean=np.full((1, 1, 1, 512), 7.0, np.float32),
                 std=np.ones((1, 1, 1, 512), np.float32))
        np.savez(parent / "style_vector.npz",
                 mean=np.zeros((1, 1, 1, 512), np.float32),
                 std=np.ones((1, 1, 1, 512), np.float32))
        args = types.SimpleNamespace(
            checkpoint=str(parent / "rbc_release"), style_vector=None
        )
        cfg = _load_config(args)
        assert cfg.physics.distance_normalize == 10.0  # domain, not MNIST
        mean, _ = _load_style(args)
        assert float(mean[0, 0, 0, 0]) == 7.0  # the domain's vector
