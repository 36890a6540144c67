"""Distance regressor: AdaIN feature statistics -> object-to-sensor distance.

Functional re-design of the reference's ``Distance_G`` (net.py:266-327):
the (mu, sigma) pair of 512-channel relu4_1 statistics is flattened and
concatenated to 1024 features, pushed through three
Linear -> Dropout(0.5) -> InstanceNorm -> ReLU blocks (1024 -> 1024 -> 512)
and a sigmoid head, yielding a normalized distance in (0, 1).

The reference's ``InstanceNorm1d`` on a (B, 1024) tensor silently behaves as
a per-sample feature normalization with no affine parameters (verified
against torch 2.13 — see models/layers.instance_norm_rows). We implement
that *effective* math directly, so converted checkpoints predict
identically, and the batch-1 ``repeat(2, ...)`` workaround the reference
needs (net.py:255-256) becomes unnecessary.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from style_transfer_based_holographic_imaging_tpu.models.layers import instance_norm_rows

__all__ = ["DistanceMLP"]


class DistanceMLP(nn.Module):
    """(mean, std) feature stats -> normalized distance in (0, 1)."""

    hidden: int = 1024
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        mean_std: Tuple[jax.Array, jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        mean, std = mean_std
        b = mean.shape[0]
        x = jnp.concatenate([mean.reshape(b, -1), std.reshape(b, -1)], axis=-1)
        x = x.astype(self.dtype)

        for name in ("l1", "l2", "l3"):
            feats = self.hidden if name != "l3" else self.hidden // 2
            x = nn.Dense(feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)(x)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
            x = instance_norm_rows(x)
            x = nn.relu(x)

        x = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype, name="out")(x)
        return nn.sigmoid(x)
