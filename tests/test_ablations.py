"""Shape/behaviour tests for the ablation model families (models/ablations.py):
the U-Net holographic autoencoder (ref net_autoencoder pyc) and the
trivial-solution variant with ECA (ref net_trivial_solution pyc)."""

import numpy as np
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.models.ablations import (
    CBR,
    ECALayer,
    HoloAutoEncoder,
    TrivialSolutionNet,
)


class TestHoloAutoEncoder:
    def test_forward_shapes(self):
        model = HoloAutoEncoder()
        x = jnp.ones((2, 32, 32, 1))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 32, 32, 2)  # (amp, phase)

    def test_no_skip_variant(self):
        model = HoloAutoEncoder(skip=False)
        x = jnp.ones((1, 32, 32, 1))
        params = model.init(jax.random.key(0), x)
        assert model.apply(params, x).shape == (1, 32, 32, 2)

    def test_cbr_up_doubles_resolution(self):
        blk = CBR(8, stride=2, sampling="up")
        x = jnp.ones((1, 8, 8, 4))
        params = blk.init(jax.random.key(0), x)
        assert blk.apply(params, x).shape == (1, 16, 16, 8)

    def test_cbr_group_norm(self):
        blk = CBR(32, norm="group")
        x = jnp.ones((1, 8, 8, 4))
        params = blk.init(jax.random.key(0), x)
        assert blk.apply(params, x).shape == (1, 8, 8, 32)


class TestECA:
    def test_gate_bounded_and_shaped(self):
        eca = ECALayer()
        x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 16)), jnp.float32)
        params = eca.init(jax.random.key(0), x)
        y = eca.apply(params, x)
        assert y.shape == x.shape
        # Sigmoid gate: |y| <= |x| elementwise.
        assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)

    def test_param_count_is_k(self):
        eca = ECALayer(k_size=5)
        params = eca.init(jax.random.key(0), jnp.ones((1, 4, 4, 8)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert n == 5  # one k-tap conv, no bias


class TestTrivialSolutionNet:
    def test_forward(self):
        model = TrivialSolutionNet()
        x = jnp.ones((2, 64, 64, 1))
        params = model.init(jax.random.key(0), x)
        amp, phase, dist = model.apply(params, x)
        assert amp.shape == (2, 64, 64, 1)
        assert phase.shape == (2, 64, 64, 1)
        assert dist.shape == (2, 1)
        d = np.asarray(dist)
        assert np.all((d > 0) & (d < 1))  # sigmoid head


def test_cbr_batchnorm_trains_statistics(rng):
    """norm='batch' must collect batch statistics in train mode (it was a
    frozen running-average affine no-op before)."""
    import flax

    from style_transfer_based_holographic_imaging_tpu.models.ablations import CBR

    m = CBR(8, norm="batch")
    x = jnp.asarray(rng.random((2, 8, 8, 4)).astype(np.float32) * 3 + 5)
    variables = m.init(jax.random.key(0), x, train=True)
    assert "batch_stats" in variables
    y, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    new_mean = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    old_mean = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    assert not np.allclose(np.asarray(new_mean), np.asarray(old_mean))
    # eval mode uses running stats, no mutation needed
    y_eval = m.apply(variables, x, train=False)
    assert y_eval.shape == y.shape
