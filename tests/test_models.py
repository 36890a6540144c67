"""Model parity tests.

torch (CPU) is available in the test env, so each flax module is checked
against a freshly built torch module with the *same random weights*, pushed
through the interop converters. This validates simultaneously:

* reflection-pad + VALID conv semantics,
* ceil-mode max pooling,
* ConvTranspose2d(2, stride=2) == matmul + depth-to-space,
* the InstanceNorm1d-on-(B, F) quirk of the distance MLP,
* the torch->flax weight conversion layout rules.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from style_transfer_based_holographic_imaging_tpu.models import (
    VggEncoder,
    AmpPhaseDecoder,
    DistanceMLP,
    PatchDiscriminator,
    StyleTransferNet,
    split_style_vector,
)
from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
    convert_vgg_state_dict,
    convert_decoder_state_dict,
    convert_distance_state_dict,
    torch_to_numpy,
)

torch.manual_seed(0)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


def build_torch_vgg():
    """The reference encoder architecture (net.py:76-130) up to relu4_1,
    built independently here as a parity oracle."""
    cfg = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P", 512]
    layers = [tnn.Conv2d(1, 3, 1)]
    in_ch = 3
    for v in cfg:
        if v == "P":
            layers.append(tnn.MaxPool2d(2, 2, 0, ceil_mode=True))
        else:
            layers += [tnn.ReflectionPad2d(1), tnn.Conv2d(in_ch, v, 3), tnn.ReLU()]
            in_ch = v
    return tnn.Sequential(*layers)


def build_torch_decoder():
    """The reference decoder architecture (net.py:33-74) as a parity oracle."""
    def rc(i, o):
        return [tnn.ReflectionPad2d(1), tnn.Conv2d(i, o, 3), tnn.ReLU()]

    layers = (
        rc(512, 512)
        + rc(512, 256)
        + [tnn.ConvTranspose2d(256, 256, 2, stride=2), tnn.ReLU()]
        + rc(256, 256) + rc(256, 256) + rc(256, 256) + rc(256, 128)
        + [tnn.ConvTranspose2d(128, 128, 2, stride=2), tnn.ReLU()]
        + rc(128, 128) + rc(128, 64)
        + [tnn.ConvTranspose2d(64, 64, 2, stride=2), tnn.ReLU()]
        + rc(64, 64) + rc(64, 64)
        + [tnn.ReflectionPad2d(1), tnn.Conv2d(64, 2, 3)]
    )
    return tnn.Sequential(*layers)


def build_torch_distance():
    class TD(tnn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = tnn.Linear(1024, 1024)
            self.l2 = tnn.Linear(1024, 1024)
            self.l3 = tnn.Linear(1024, 512)
            self.out = tnn.Linear(512, 1)
            self.n1 = tnn.InstanceNorm1d(1024)
            self.n2 = tnn.InstanceNorm1d(1024)
            self.n3 = tnn.InstanceNorm1d(512)

        def forward(self, m, s):
            b = m.shape[0]
            x = torch.cat([m.view(b, -1), s.view(b, -1)], dim=1)
            x = torch.relu(self.n1(self.l1(x)))
            x = torch.relu(self.n2(self.l2(x)))
            x = torch.relu(self.n3(self.l3(x)))
            return torch.sigmoid(self.out(x))

    return TD()


@pytest.fixture(scope="module")
def vgg_pair():
    tv = build_torch_vgg().eval()
    params = {"params": convert_vgg_state_dict(
        {k: v for k, v in torch_to_numpy(tv.state_dict()).items()},
        collapse_rgb_stem=False,
    )}
    return tv, params


class TestVggParity:
    def test_relu4_1_matches_torch(self, rng, vgg_pair):
        tv, params = vgg_pair
        x = rng.random((2, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tv(torch.from_numpy(x)).numpy()
        got = nchw(VggEncoder().apply(params, jnp.asarray(nhwc(x))))
        assert got.shape == want.shape == (2, 512, 8, 8)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_all_taps_shapes(self, rng, vgg_pair):
        _, params = vgg_pair
        x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
        taps = VggEncoder().apply(params, x, all_taps=True)
        assert [t.shape for t in taps] == [
            (1, 64, 64, 64),
            (1, 32, 32, 128),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
        ]

    def test_odd_size_ceil_pool(self, rng, vgg_pair):
        """torch ceil_mode pools keep partial windows; 100 -> 50 -> 25 -> 13."""
        tv, params = vgg_pair
        x = rng.random((1, 1, 100, 100)).astype(np.float32)
        with torch.no_grad():
            want = tv(torch.from_numpy(x)).numpy()
        got = nchw(VggEncoder().apply(params, jnp.asarray(nhwc(x))))
        assert got.shape == want.shape == (1, 512, 13, 13)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestDecoderParity:
    def test_matches_torch(self, rng):
        td = build_torch_decoder().eval()
        params = {"params": convert_decoder_state_dict(torch_to_numpy(td.state_dict()))}
        t = (rng.random((2, 512, 8, 8)).astype(np.float32) - 0.2)
        with torch.no_grad():
            want = td(torch.from_numpy(t)).numpy()
        got = nchw(AmpPhaseDecoder().apply(params, jnp.asarray(nhwc(t))))
        assert got.shape == want.shape == (2, 2, 64, 64)
        # NB: tight on purpose. A conv-transpose with its 2x2 taps flipped
        # differs from torch by only ~3e-4 under *random* weights (it is a
        # within-block output permutation that random stacks average away)
        # while being catastrophic under trained weights — 5e-4 here once
        # masked exactly that bug.
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestDistanceParity:
    def test_matches_torch(self, rng):
        td = build_torch_distance().eval()
        params = {"params": convert_distance_state_dict(torch_to_numpy(td.state_dict()))}
        m = rng.random((4, 512, 1, 1)).astype(np.float32)
        s = rng.random((4, 512, 1, 1)).astype(np.float32) + 0.5
        with torch.no_grad():
            want = td(torch.from_numpy(m), torch.from_numpy(s)).numpy()
        # ours takes NHWC-style stats (B,1,1,C)
        got = np.asarray(
            DistanceMLP().apply(
                params,
                (jnp.asarray(m.reshape(4, 1, 1, 512)), jnp.asarray(s.reshape(4, 1, 1, 512))),
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert ((got > 0) & (got < 1)).all()

    def test_batch_one_no_hack_needed(self, rng):
        """The reference needs a repeat(2,...) workaround for B=1
        (net.py:255-256); ours must be consistent between B=1 and batched."""
        params = DistanceMLP().init(
            jax.random.key(0),
            (jnp.ones((2, 1, 1, 512)), jnp.ones((2, 1, 1, 512))),
        )
        m = jnp.asarray(rng.random((2, 1, 1, 512)).astype(np.float32))
        s = jnp.asarray(rng.random((2, 1, 1, 512)).astype(np.float32)) + 0.5
        full = np.asarray(DistanceMLP().apply(params, (m, s)))
        single = np.asarray(DistanceMLP().apply(params, (m[:1], s[:1])))
        np.testing.assert_allclose(single, full[:1], atol=1e-6)


class TestDiscriminator:
    def test_shapes(self, rng):
        d = PatchDiscriminator()
        x = jnp.asarray(rng.random((2, 128, 128, 1)).astype(np.float32))
        params = d.init(jax.random.key(0), x)
        src, cls = d.apply(params, x)
        assert src.shape == (2, 2, 2, 1)
        assert cls.shape == (2, 5)


class TestStyleTransferNet:
    @pytest.fixture(scope="class")
    def net_and_params(self):
        net = StyleTransferNet()
        x = jnp.ones((1, 64, 64, 1), jnp.float32)
        params = net.init(
            jax.random.key(0), x, x, field_retrieval=True, unknown_distance=True
        )
        return net, params

    def test_field_retrieval_shapes(self, rng, net_and_params):
        net, params = net_and_params
        content = jnp.asarray(rng.random((3, 64, 64, 1)).astype(np.float32))
        sm = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32))
        ss = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32)) + 0.5
        amp, ph, d = net.apply(
            params, content, sm, ss, 1.0, unknown_distance=True,
            method=StyleTransferNet.field_retrieval,
        )
        assert amp.shape == (3, 64, 64, 1)
        assert ph.shape == (3, 64, 64, 1)
        assert d.shape == (3, 1)

    def test_training_forward_losses(self, rng, net_and_params):
        net, params = net_and_params
        c = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
        s = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
        out = net.apply(params, c, s, 1.0, field_retrieval=True, unknown_distance=True)
        assert np.isfinite(float(out["loss_content"]))
        assert np.isfinite(float(out["loss_style"]))
        assert out["g_t"].shape == (2, 64, 64, 1)
        assert out["d_content"].shape == (2, 1)

    def test_alpha_zero_is_identity_mix(self, rng, net_and_params):
        """alpha=0 bypasses the style statistics entirely (net.py:246)."""
        net, params = net_and_params
        content = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
        sm = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32))
        ss = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32)) + 0.5
        a0 = net.apply(params, content, sm, ss, 0.0,
                       method=StyleTransferNet.field_retrieval)
        a0b = net.apply(params, content, sm * 5.0, ss * 3.0, 0.0,
                        method=StyleTransferNet.field_retrieval)
        np.testing.assert_allclose(np.asarray(a0[0]), np.asarray(a0b[0]), atol=1e-6)


def test_split_style_vector_layouts():
    sv_nchw = np.stack([np.full((512, 1, 1), 2.0), np.full((512, 1, 1), 3.0)]).astype(
        np.float32
    )
    m, s = split_style_vector(jnp.asarray(sv_nchw))
    assert m.shape == (1, 1, 1, 512) and float(m[0, 0, 0, 0]) == 2.0
    assert s.shape == (1, 1, 1, 512) and float(s[0, 0, 0, 0]) == 3.0
    # multi-style: (2B, 1, 1, C)
    sv_multi = np.concatenate([np.full((3, 1, 1, 512), 1.0), np.full((3, 1, 1, 512), 4.0)])
    m2, s2 = split_style_vector(jnp.asarray(sv_multi.astype(np.float32)))
    assert m2.shape == (3, 1, 1, 512) and float(s2[0, 0, 0, 0]) == 4.0


class TestStyleVectorInterop:
    def test_pt_roundtrip(self, tmp_path):
        from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
            load_style_vector,
            save_style_vector_pt,
        )

        rng2 = np.random.default_rng(0)
        mean = rng2.random((1, 1, 1, 512)).astype(np.float32)
        std = (rng2.random((1, 1, 1, 512)) + 0.5).astype(np.float32)
        p = str(tmp_path / "style_vector.pt")
        save_style_vector_pt(mean, std, p)
        m2, s2 = load_style_vector(p)
        np.testing.assert_array_equal(mean, m2)
        np.testing.assert_array_equal(std, s2)

    def test_reads_reference_artifact(self):
        """The real bundled artifact loads with the documented layout
        (style_representation/MNIST/style_vector.pt: (2, 512, 1, 1))."""
        import os

        from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
            load_style_vector,
        )

        path = "/root/reference/style_representation/MNIST/style_vector.pt"
        if not os.path.isfile(path):
            pytest.skip("reference artifact not mounted")
        mean, std = load_style_vector(path)
        assert mean.shape == (1, 1, 1, 512)
        assert std.shape == (1, 1, 1, 512)
        assert np.all(std >= 0)


class TestLoadReferenceCheckpoint:
    def test_one_call_migration(self, rng, tmp_path):
        """load_reference_checkpoint composes the three converters into a
        variables tree that drives the full retrieval pipeline (the
        documented migration path, docs/MIGRATION.md)."""
        from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
        from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
            load_reference_checkpoint,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            retrieval_step,
        )

        # Reference-layout artifacts: RGB-stem VGG (vgg_normalised.pth has a
        # 3-channel stem collapsed at load, test_field_retrieval_mnist.py:87),
        # decoder and distance state dicts keyed by Sequential indices.
        tv = build_torch_vgg()
        sd = tv.state_dict()
        sd["0.weight"] = torch.randn(3, 3, 1, 1)
        vgg_p = str(tmp_path / "vgg_normalised.pth")
        torch.save(sd, vgg_p)
        dec_p = str(tmp_path / "decoder_iter_80000.pth.tar")
        torch.save(build_torch_decoder().state_dict(), dec_p)
        dist_p = str(tmp_path / "distance_g_iter_80000.pth.tar")
        torch.save(build_torch_distance().state_dict(), dist_p)

        variables = load_reference_checkpoint(vgg_p, dec_p, dist_p)
        got = variables["params"]["encoder"]["stem"]["kernel"]
        want = convert_vgg_state_dict(torch_to_numpy(sd))["stem"]["kernel"]
        np.testing.assert_array_equal(got, want)
        assert got.shape == (1, 1, 1, 3)  # RGB stem collapsed to grayscale

        holo = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32) * 0.6)
        sm = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32))
        ss = jnp.asarray((rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32))
        ds = jnp.full((2, 1, 1, 1), 0.2, jnp.float32)
        out = retrieval_step(variables, holo, sm, ss, ds, physics=PhysicsConfig())
        assert out["amp_foc"].shape == (2, 1, 32, 32)
        assert np.all(np.isfinite(np.asarray(out["distance_pred"])))

    def test_decoder_ph_artifact_converts_and_routes(self, rng, tmp_path):
        """The reference's decoder_ph_iter_80000.pth.tar converts into the
        decoder_ph subtree and eval auto-routes phase through it."""
        from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
        from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
            load_reference_checkpoint,
        )
        from style_transfer_based_holographic_imaging_tpu.models.net import (
            has_phase_decoder,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            retrieval_step,
        )

        tv = build_torch_vgg()
        sd = tv.state_dict()
        sd["0.weight"] = torch.randn(3, 3, 1, 1)
        vgg_p = str(tmp_path / "vgg_normalised.pth")
        torch.save(sd, vgg_p)
        dec_p = str(tmp_path / "decoder_iter_80000.pth.tar")
        torch.save(build_torch_decoder().state_dict(), dec_p)
        ph_p = str(tmp_path / "decoder_ph_iter_80000.pth.tar")
        torch.save(build_torch_decoder().state_dict(), ph_p)
        dist_p = str(tmp_path / "distance_g_iter_80000.pth.tar")
        torch.save(build_torch_distance().state_dict(), dist_p)

        variables = load_reference_checkpoint(
            vgg_p, dec_p, dist_p, decoder_ph=ph_p
        )
        assert has_phase_decoder(variables)
        holo = jnp.asarray(rng.random((1, 1, 32, 32)).astype(np.float32) * 0.6)
        sm = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32))
        ss = sm + 0.5
        out = retrieval_step(variables, holo, sm, ss, 0.2, physics=PhysicsConfig())
        plain = load_reference_checkpoint(vgg_p, dec_p, dist_p)
        out_plain = retrieval_step(plain, holo, sm, ss, 0.2, physics=PhysicsConfig())
        np.testing.assert_allclose(
            np.asarray(out["amp_field"]), np.asarray(out_plain["amp_field"]),
            rtol=1e-5, atol=1e-6,
        )
        assert not np.allclose(
            np.asarray(out["ph_field"]), np.asarray(out_plain["ph_field"])
        )

    def test_shape_mismatch_raises(self, tmp_path):
        from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
            load_reference_checkpoint,
        )

        tv = build_torch_vgg()
        sd = tv.state_dict()
        sd["2.weight"] = torch.randn(64, 64, 3, 3)  # conv1_1 expects in=3
        vgg_p = str(tmp_path / "vgg.pth")
        torch.save(sd, vgg_p)
        dec_p = str(tmp_path / "dec.pth.tar")
        torch.save(build_torch_decoder().state_dict(), dec_p)
        dist_p = str(tmp_path / "dist.pth.tar")
        torch.save(build_torch_distance().state_dict(), dist_p)
        with pytest.raises(AssertionError, match="conv1_1"):
            load_reference_checkpoint(vgg_p, dec_p, dist_p)


class TestFastReflectConv:
    """The SAME-conv + border-fix-up fast path must equal the materialized
    reflect-pad path exactly (same math, fp-order tolerance only)."""

    @pytest.mark.parametrize("backend", ["einsum", "pallas"])
    @pytest.mark.parametrize("shape", [(3, 17, 13, 5), (3, 16, 12, 5)])
    def test_fast_equals_slow(self, rng, backend, shape):
        import flax.linen as nn

        from style_transfer_based_holographic_imaging_tpu.models import layers
        from style_transfer_based_holographic_imaging_tpu.models.layers import (
            reflect_conv,
        )

        class M(nn.Module):
            fast: bool

            @nn.compact
            def __call__(self, x):
                return reflect_conv(x, 8, "c", fast=self.fast)

        x = jnp.asarray(rng.random(shape, np.float32))
        fast, slow = M(fast=True), M(fast=False)
        p = fast.init(jax.random.key(0), x)
        layers.set_reflect_backend(backend)
        try:
            got = np.asarray(fast.apply(p, x))
        finally:
            layers.set_reflect_backend("auto")
        np.testing.assert_allclose(
            got,
            np.asarray(slow.apply(p, x)),
            rtol=1e-5,
            atol=1e-5,
        )

    @pytest.mark.parametrize("backend", ["einsum", "pallas"])
    def test_fast_gradients_match(self, rng, backend):
        import flax.linen as nn

        from style_transfer_based_holographic_imaging_tpu.models import layers
        from style_transfer_based_holographic_imaging_tpu.models.layers import (
            reflect_conv,
        )

        class M(nn.Module):
            fast: bool

            @nn.compact
            def __call__(self, x):
                return jnp.sum(reflect_conv(x, 4, "c", fast=self.fast) ** 2)

        x = jnp.asarray(rng.random((2, 8, 8, 3), np.float32))
        p = M(fast=True).init(jax.random.key(1), x)
        layers.set_reflect_backend(backend)
        try:
            g_fast = jax.grad(lambda p, x: M(fast=True).apply(p, x), argnums=(0, 1))(p, x)
        finally:
            layers.set_reflect_backend("auto")
        g_slow = jax.grad(lambda p, x: M(fast=False).apply(p, x), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_slow)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestConvTransposeParity:
    def test_matches_torch_exactly(self, rng):
        import torch.nn as tnn

        from style_transfer_based_holographic_imaging_tpu.models.layers import (
            ConvTranspose2x2,
        )

        tm = tnn.ConvTranspose2d(6, 4, 2, stride=2).eval()
        params = {
            "params": {
                "kernel": jnp.asarray(tm.weight.detach().numpy()),
                "bias": jnp.asarray(tm.bias.detach().numpy()),
            }
        }
        x = rng.random((2, 6, 5, 5)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = nchw(ConvTranspose2x2(4).apply(params, jnp.asarray(nhwc(x))))
        # bit-exact: the lowering must place tap (di, dj) at output
        # (2i+di, 2j+dj) exactly as torch's scatter does
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestWidthMultiplier:
    """The 'fast profile' knob: channel-scaled architecture family."""

    def test_half_width_shapes(self):
        from style_transfer_based_holographic_imaging_tpu.models import (
            StyleTransferNet,
            init_net_params,
        )

        params = init_net_params(jax.random.key(0), image_size=64, width=0.5)
        inner = params["params"]
        assert inner["encoder"]["conv4_1"]["kernel"].shape[-1] == 256
        assert inner["decoder"]["conv0"]["kernel"].shape[-1] == 256
        # fixed 2-channel output regardless of width
        assert inner["decoder"]["conv10"]["kernel"].shape[-1] == 2

        net = StyleTransferNet(width=0.5)
        x = jnp.ones((2, 64, 64, 1), jnp.float32)
        sm = jnp.ones((1, 1, 1, 256))
        ss = jnp.ones((1, 1, 1, 256))
        amp, ph, d = net.apply(
            params, x, sm, ss, 1.0,
            unknown_distance=True,
            method=StyleTransferNet.field_retrieval,
        )
        assert amp.shape == (2, 64, 64, 1)
        assert ph.shape == (2, 64, 64, 1)
        assert d.shape == (2, 1)

    def test_width_via_retrieval_fn(self):
        from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
        from style_transfer_based_holographic_imaging_tpu.models import init_net_params
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            make_retrieval_fn,
        )

        params = init_net_params(jax.random.key(0), image_size=64, width=0.25)
        fn = make_retrieval_fn(PhysicsConfig(), width=0.25)
        holo = jnp.full((2, 1, 64, 64), 0.3, jnp.float32)
        c = 128  # max(round(512 * 0.25), 8)
        out = fn(
            params, holo, jnp.ones((1, 1, 1, c)), jnp.ones((1, 1, 1, c)),
            jnp.full((2, 1, 1, 1), 0.2),
        )
        assert out["amp_foc"].shape == (2, 1, 64, 64)
        assert out["distance_pred"].shape == (2, 1, 1, 1)

    def test_train_step_half_width(self):
        import dataclasses as dc

        from style_transfer_based_holographic_imaging_tpu.config import (
            DataConfig,
            ExperimentConfig,
            ModelConfig,
            TrainConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            sklearn_digit_bank,
        )
        from style_transfer_based_holographic_imaging_tpu.train import train

        cfg = ExperimentConfig(
            model=ModelConfig(width=0.5, image_size=64),
            data=DataConfig(batch_size=2, image_size=64, digit_pad=0),
            train=TrainConfig(
                iterations=2, freeze_encoder=False, checkpoint_every=1000,
                log_every=1000,
            ),
        )
        state = train(cfg, bank=sklearn_digit_bank()[:16])
        assert int(state.step) == 2


class TestVggFiveTaps:
    def test_relu5_1_tap(self):
        from style_transfer_based_holographic_imaging_tpu.models.vgg import VggEncoder

        enc = VggEncoder(n_taps=5)
        x = jnp.ones((1, 64, 64, 1), jnp.float32)
        params = enc.init(jax.random.key(0), x)
        taps = enc.apply(params, x, all_taps=True)
        assert len(taps) == 5
        # relu4_1 at H/8, relu5_1 at H/16, both 512-ch
        assert taps[3].shape == (1, 8, 8, 512)
        assert taps[4].shape == (1, 4, 4, 512)
        # default 4-tap encoder params are a strict subset (same names/shapes)
        p4 = VggEncoder().init(jax.random.key(0), x)["params"]
        p5 = params["params"]
        for name, v in p4.items():
            assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(
                lambda a: a.shape, p5[name]
            )


def test_with_phase_decoder_materializes_and_runs(rng):
    """with_phase_decoder=True must create decoder_ph params and route the
    phase through it (the reference's commented-out branch, net.py:249-252)."""
    from style_transfer_based_holographic_imaging_tpu.models.net import (
        StyleTransferNet,
        init_net_params,
    )

    variables = init_net_params(
        jax.random.key(0), image_size=32, with_phase_decoder=True
    )
    assert "decoder_ph" in variables["params"]
    net = StyleTransferNet(with_phase_decoder=True)
    holo = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    sm = jnp.asarray(rng.random((1, 1, 1, 512)).astype(np.float32))
    ss = jnp.asarray((rng.random((1, 1, 1, 512)) + 0.5).astype(np.float32))
    amp, phase = net.apply(
        variables, holo, sm, ss, method=StyleTransferNet.field_retrieval
    )
    assert amp.shape == phase.shape == (1, 32, 32, 1)


class TestReceptiveField:
    """utils/misc.receptive_field vs the reference's backward-recursion
    calculator (utils/functions.py:130-194), ported as a tiny oracle."""

    @staticmethod
    def _oracle_input_rf(layers):
        # conv1d_r (functions.py:130-135): r_in = r_out*s + max(k - s, 0),
        # folded from the last layer back to the input as
        # receptive_field_calculator's loop does (functions.py:171-181).
        r = 1
        for k, s in reversed(list(layers)):
            r = r * s + max(k - s, 0)
        return r

    def test_matches_reference_recursion(self):
        from style_transfer_based_holographic_imaging_tpu.utils.misc import (
            receptive_field,
        )

        # Parity holds for kernel >= stride (every layer in the reference's
        # models). For kernel < stride the reference's max(k-s, 0) clamp
        # OVERESTIMATES the true span ((r_out-1)*s + k) by s-k; our forward
        # accumulation is exact there, so such stacks are excluded.
        rng = np.random.default_rng(0)
        for _ in range(50):
            n = int(rng.integers(1, 8))
            layers = []
            for _ in range(n):
                s = int(rng.integers(1, 4))
                layers.append((int(rng.integers(s, 8)), s))
            got = receptive_field(layers)
            assert len(got) == n
            for i in range(n):
                assert got[i] == self._oracle_input_rf(layers[: i + 1])

    def test_vgg_relu4_1_receptive_field(self):
        """The encoder's relu4-1 tap (the AdaIN feature plane) sees 68x68
        input pixels — the number the reference's dev tool prints for the
        net.py:76-107 stack up to relu4-1."""
        from style_transfer_based_holographic_imaging_tpu.utils.misc import (
            receptive_field,
        )

        # (kernel, stride) input-first: 1x1 stem, conv1_1..1_2, pool,
        # conv2_1..2_2, pool, conv3_1..3_4, pool, conv4_1 (net.py:77-107).
        vgg_to_relu4_1 = (
            [(1, 1), (3, 1), (3, 1), (2, 2), (3, 1), (3, 1), (2, 2)]
            + [(3, 1)] * 4
            + [(2, 2), (3, 1)]
        )
        rf = receptive_field(vgg_to_relu4_1)
        assert rf[-1] == self._oracle_input_rf(vgg_to_relu4_1) == 68
