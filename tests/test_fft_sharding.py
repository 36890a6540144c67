"""Distributed-FFT propagation parity on the 8-device host mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.ops import asm
from style_transfer_based_holographic_imaging_tpu.parallel import make_mesh
from style_transfer_based_holographic_imaging_tpu.parallel.fft_sharding import (
    fov_sharding,
    sharded_propagate,
)

KW = dict(wavelength=532e-9, pixel_size=1.5e-6)


def _field(b=2, n=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.random((b, 1, n, n)) + 1j * rng.random((b, 1, n, n))).astype(np.complex64)
    )


class TestShardedPropagate:
    def test_matches_single_device(self):
        mesh = make_mesh(8)
        f = _field()
        d = jnp.asarray([[[[3e-4]]], [[[7e-4]]]], jnp.float32)
        ref = np.asarray(asm._propagate_xla(f, d, **KW))
        f_sharded = jax.device_put(f, fov_sharding(mesh))
        out = np.asarray(sharded_propagate(f_sharded, d, mesh=mesh, **KW))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5

    def test_no_pad(self):
        mesh = make_mesh(8)
        f = _field(b=1)
        ref = np.asarray(asm._propagate_xla(f, 5e-4, pad=False, **KW))
        out = np.asarray(
            sharded_propagate(
                jax.device_put(f, fov_sharding(mesh)), 5e-4, mesh=mesh, pad=False, **KW
            )
        )
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5

    def test_output_keeps_fov_sharding(self):
        mesh = make_mesh(8)
        f = jax.device_put(_field(), fov_sharding(mesh))
        out = sharded_propagate(f, 3e-4, mesh=mesh, **KW)
        # Rows still split across devices (no implicit gather).
        shard_rows = {s.data.shape[-2] for s in out.addressable_shards}
        assert shard_rows == {f.shape[-2] // 8}

    def test_indivisible_raises(self):
        mesh = make_mesh(8)
        f = _field(b=1, n=20)  # padded 40 rows, not divisible by 8
        with pytest.raises(ValueError):
            sharded_propagate(f, 3e-4, mesh=mesh, **KW)

    def test_jit_and_grad(self):
        mesh = make_mesh(8)
        f = _field(b=1)
        fn = jax.jit(
            lambda x, d: jnp.sum(
                jnp.abs(sharded_propagate(x, d, mesh=mesh, **KW)) ** 2
            )
        )
        g = jax.grad(fn)(f, 4e-4)
        assert np.all(np.isfinite(np.asarray(jnp.abs(g))))


def test_band_limit_matches_single_device():
    """The Matsushima band-limit mask must apply identically on the sharded
    path (the domain presets require it at mm-range distances)."""
    mesh = make_mesh(8)
    f = _field()
    d = jnp.asarray([[[[6e-3]]], [[[1.2e-2]]]], jnp.float32)  # mm-range
    ref = np.asarray(asm._propagate_xla(f, d, band_limit=True, **KW))
    out = np.asarray(
        sharded_propagate(
            jax.device_put(f, fov_sharding(mesh)),
            d,
            mesh=mesh,
            band_limit=True,
            **KW,
        )
    )
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
    # and the mask matters: unmasked differs at these distances
    nomask = np.asarray(asm._propagate_xla(f, d, **KW))
    assert np.abs(nomask - ref).max() / np.abs(ref).max() > 1e-3


class TestMeshShardedPallas:
    """The Pallas ASM kernel under a DP (batch-sharded) mesh: its
    custom_partitioning (kernels/asm_pallas.py) shards the batch dim with
    the operands, so mesh-sharded jit programs no longer need the XLA
    backend. Parity target: the single-device XLA composition."""

    @pytest.fixture(autouse=True)
    def _fp32_dft(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        asm_pallas.set_dft_precision("highest")
        yield
        asm_pallas.set_dft_precision("high")

    def _batch_sharded(self, mesh, x):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    def test_const_distance_batch_sharded(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import (
            propagate_pallas,
        )

        mesh = make_mesh(8)
        f = _field(b=16)
        fs = self._batch_sharded(mesh, f)
        run = jax.jit(lambda x: propagate_pallas(x, 5e-4, **KW, interpret=True))
        out = run(fs)
        ref = np.asarray(asm._propagate_xla(f, 5e-4, **KW))
        assert np.abs(np.asarray(out) - ref).max() / np.abs(ref).max() < 1e-5
        # output must stay batch-sharded (no gather inserted)
        assert out.sharding.spec[0] == "data"

    def test_dynamic_distance_batch_sharded(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import (
            propagate_pallas,
        )

        mesh = make_mesh(8)
        rng = np.random.default_rng(1)
        f = _field(b=16, seed=2)
        d = jnp.asarray(rng.uniform(2e-4, 8e-4, (16, 1, 1, 1)).astype(np.float32))
        fs = self._batch_sharded(mesh, f)
        ds = self._batch_sharded(mesh, d)
        run = jax.jit(lambda x, dd: propagate_pallas(x, dd, **KW, interpret=True))
        out = run(fs, ds)
        ref = np.asarray(asm._propagate_xla(f, d, **KW))
        assert np.abs(np.asarray(out) - ref).max() / np.abs(ref).max() < 1e-5
        assert out.sharding.spec[0] == "data"
