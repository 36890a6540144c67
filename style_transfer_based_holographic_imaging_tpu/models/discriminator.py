"""PatchGAN discriminator (StarGAN-style dual head).

Functional re-design of the reference's ``Discriminator`` (net.py:8-31):
a strided 4x4 conv ladder with LeakyReLU(0.01) followed by two heads —
a 1-channel patch-realism map and a c_dim-channel domain classifier whose
kernel covers the whole remaining spatial extent. Training-only (the L_adv
term of Figures/training.png); unused at inference.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["PatchDiscriminator"]


class PatchDiscriminator(nn.Module):
    image_size: int = 128
    conv_dim: int = 64
    c_dim: int = 5
    repeat_num: int = 6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        dt, pd = self.dtype, self.param_dtype
        x = x.astype(dt)
        dim = self.conv_dim
        x = nn.Conv(dim, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dt, param_dtype=pd, name="conv_in")(x)
        x = nn.leaky_relu(x, 0.01)
        for i in range(1, self.repeat_num):
            dim *= 2
            x = nn.Conv(dim, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=dt, param_dtype=pd, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.01)

        k = self.image_size // (2 ** self.repeat_num)
        out_src = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=dt, param_dtype=pd, name="head_src")(x)
        out_cls = nn.Conv(self.c_dim, (k, k), padding="VALID", use_bias=False,
                          dtype=dt, param_dtype=pd, name="head_cls")(x)
        return out_src, out_cls.reshape(out_cls.shape[0], self.c_dim)
