"""AdaIN / feature-statistics parity tests against torch oracles.

torch (CPU) is available in the test environment, so each op is checked
against a freshly written torch implementation of the reference math
(function.py:4-23,41-67) on random data — no reference code is imported.
"""

import numpy as np
import jax.numpy as jnp
import torch

from style_transfer_based_holographic_imaging_tpu.ops import (
    calc_mean_std,
    adain,
    adain_with_stats,
    coral,
)


def torch_mean_std(feat: torch.Tensor, eps=1e-5):
    n, c = feat.shape[:2]
    var = feat.view(n, c, -1).var(dim=2) + eps
    std = var.sqrt().view(n, c, 1, 1)
    mean = feat.view(n, c, -1).mean(dim=2).view(n, c, 1, 1)
    return mean, std


def test_calc_mean_std_matches_torch(rng):
    x = rng.standard_normal((3, 7, 9, 5)).astype(np.float32)  # NCHW
    tm, ts = torch_mean_std(torch.from_numpy(x))
    # ours runs NHWC
    m, s = calc_mean_std(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(m)[:, 0, 0, :], tm.numpy()[:, :, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0, :], ts.numpy()[:, :, 0, 0], atol=1e-6)


def test_adain_matches_torch(rng):
    c = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    s = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    tc, tsty = torch.from_numpy(c), torch.from_numpy(s)
    sm, ss = torch_mean_std(tsty)
    cm, cs = torch_mean_std(tc)
    expected = ((tc - cm) / cs * ss + sm).numpy()

    ours = np.asarray(
        adain(
            jnp.asarray(np.transpose(c, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(s, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), expected, atol=1e-5)


def test_adain_with_stats_equals_adain(rng):
    c = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    s = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    sm, ss = calc_mean_std(jnp.asarray(s))
    np.testing.assert_allclose(
        np.asarray(adain_with_stats(jnp.asarray(c), sm, ss)),
        np.asarray(adain(jnp.asarray(c), jnp.asarray(s))),
        atol=1e-6,
    )


def test_coral_moments_transferred(rng):
    src = rng.standard_normal((3, 16, 16)).astype(np.float32)
    tgt = (2.0 * rng.standard_normal((3, 16, 16)) + 1.0).astype(np.float32)
    out = np.asarray(coral(jnp.asarray(src), jnp.asarray(tgt)))
    assert out.shape == src.shape
    # First/second moments of the result should match the target's.
    np.testing.assert_allclose(
        out.reshape(3, -1).mean(-1), tgt.reshape(3, -1).mean(-1), atol=0.2
    )
    np.testing.assert_allclose(
        out.reshape(3, -1).std(-1), tgt.reshape(3, -1).std(-1), rtol=0.2
    )
