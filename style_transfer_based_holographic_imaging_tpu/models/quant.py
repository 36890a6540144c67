"""Post-training int8 quantized inference path.

TPU v5e's MXU runs int8 matmuls/convs at twice the bf16 rate; this module
exploits that for the field-retrieval serving path (a capability with no
reference counterpart — the torch reference runs fp32 end to end). Measured
on v5e (scripts/exp_int8_conv.py, batch 256, in-chain): int8 with static
scales beats bf16 by 1.4-1.56x on the deep conv layers (16^2..64^2
spatial); convs whose input spatial size exceeds ``max_hw`` keep bf16.

Update (measured, scripts/exp_packed_conv.py + exp_quant_e2e.py): the
"128^2 is breakeven" finding above was a plumbing artifact — the e2e
harness calibrated the full-resolution convs but the serving path's
``max_hw`` stayed 64, so they silently ran bf16.  Chained int8 convs at
128^2 (requantize fused between convs) win ~2.5x over the bf16 chain
(decoder tail 6.4 vs 16.1 ms at b=256).  The serving-side gate is now the
scales dict itself: a conv runs int8 iff its name was calibrated
(``max_hw`` here defaults to 128 = everything; scale files calibrated
with max_hw=64 reproduce the old deep-layers-only behavior exactly).

Design:

* pure functions over the SAME params pytree the flax modules use —
  ``variables['params']['encoder'|'decoder'|'distance_g']`` — no duplicate
  checkpoint format; the ladder layout mirrors models/vgg._BLOCKS and
  models/decoder.AmpPhaseDecoder (reference: net.py:76-130, 33-74);
* weights: symmetric per-output-channel int8, quantized at trace time from
  the fp params (a (3,3,I,O) reduce — negligible);
* activations: symmetric per-tensor int8 with STATIC scales calibrated
  offline (``calibrate_scales``) — no data-dependent reductions in the
  serving graph;
* epilogue: int32 accumulator -> one fused bf16 multiply-add
  (dequant + bias) -> relu, exactly the pattern that benched fastest;
* everything else (stem, transposed convs, AdaIN, distance head, physics)
  runs the normal bf16/fp32 path.

The fp fallback (``scales=None``) reproduces the flax module math op-for-op
and is pinned to it by tests/test_quant.py.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_based_holographic_imaging_tpu.models.layers import (
    max_pool_ceil,
    reflect_pad2d,
)
from style_transfer_based_holographic_imaging_tpu.models.vgg import _BLOCKS
from style_transfer_based_holographic_imaging_tpu.ops.stats import (
    adain_with_stats,
    calc_mean_std,
)

__all__ = [
    "quant_retrieval_forward",
    "quant_encode",
    "calibrate_scales",
    "save_scales",
    "load_scales",
    "set_fused_stacks",
]

_DN = ("NHWC", "HWIO", "NHWC")

# Fused Pallas head/tail conv stacks (kernels/conv_stack.py). OFF by
# default: measured on v5e b=256 they do NOT beat the XLA composition
# (tail 17.2 vs 16.6 ms, head 14.8 vs 9.1 — the in-kernel VMEM copies for
# reflection padding and K-concatenation replace the HBM round-trips they
# save; see docs/PERFORMANCE.md). Kept as an opt-in experiment ("on") and
# exercised by tests; "auto" currently equals "off". Trace-time setting
# like layers.set_reflect_backend: rebuild jitted fns after changing.
_FUSED_STACKS = "off"


def set_fused_stacks(mode: str) -> None:
    global _FUSED_STACKS
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused-stack mode {mode!r}")
    _FUSED_STACKS = mode


def _use_fused(x: jax.Array, observer, channels: int = 64) -> bool:
    """Whether the opt-in fused conv stacks apply to this input.

    ``channels`` is the stack's max INTERMEDIATE channel count (the input's
    own channel dim understates it for the encoder head, whose 1/3-channel
    input widens to w(64) inside the stack — pass the real kernel width).
    """
    if _FUSED_STACKS != "on" or observer is not None:
        return False
    if x.shape[1] < 4 or x.shape[1] % 2 or x.shape[2] < 4 or x.shape[2] % 2:
        return False
    # Per-grid-step VMEM footprint ~ H*W*C*12 B (image + padded copy + fp32
    # accumulator). conv_stack.py raises the scoped-VMEM limit to 100 MB;
    # gate at 64 MB for headroom (the estimate ignores Mosaic's own
    # temporaries). Bail to the XLA path for large fields of view.
    if x.shape[1] * x.shape[2] * max(x.shape[3], channels) * 12 > 64 * 1024 * 1024:
        return False
    return True

# Decoder ladder: (kind, name) in order — mirrors AmpPhaseDecoder.__call__.
_DEC_LADDER: Tuple[Tuple[str, str], ...] = (
    ("conv", "conv0"),
    ("conv", "conv1"),
    ("up", "up0"),
    ("conv", "conv2"),
    ("conv", "conv3"),
    ("conv", "conv4"),
    ("conv", "conv5"),
    ("up", "up1"),
    ("conv", "conv6"),
    ("conv", "conv7"),
    ("up", "up2"),
    ("conv", "conv8"),
    ("conv", "conv9"),
    ("conv", "conv10"),  # no relu
)


def _absmax(x: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def _quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(x * scale), -127.0, 127.0).astype(jnp.int8)


def int8_conv_valid(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    dt: Any,
    act_max: jax.Array,
    relu: bool,
    pad_fn=None,
) -> jax.Array:
    """The ONE int8 serving epilogue: per-tensor activation scale from the
    calibrated absmax, per-output-channel kernel scales, int8 quantize
    (``pad_fn`` applied to the quantized activations), int32-accumulate
    VALID conv, fused 1/(sx*sk) dequant + bias (+ relu).

    Shared by the serving path (``_reflect_conv``) and the packed
    space-to-depth formulation (kernels/packed_conv.py) so the two cannot
    drift — the packed variant's parity contract depends on byte-identical
    quantization semantics.
    """
    sx = jnp.float32(127.0) / jnp.maximum(act_max, 1e-8)
    k32 = kernel.astype(jnp.float32)
    sk = jnp.float32(127.0) / jnp.maximum(
        jnp.max(jnp.abs(k32), axis=(0, 1, 2)), 1e-8
    )  # (O,) per-output-channel
    xq = _quantize(x.astype(jnp.float32), sx)
    if pad_fn is not None:
        xq = pad_fn(xq)
    kq = _quantize(k32, sk[None, None, None, :])
    acc = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    m = (1.0 / (sx * sk)).astype(dt)  # (O,)
    y = acc.astype(dt) * m + bias.astype(dt)
    return jax.nn.relu(y) if relu else y


def _reflect_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    dt: Any,
    act_max: Optional[jax.Array],
    relu: bool,
) -> jax.Array:
    """One ReflectionPad2d(1)+3x3 VALID conv layer, int8 when ``act_max``
    is given, else the exact bf16/fp32 math of models.layers.ReflectConv
    (matpad backend)."""
    if act_max is None:
        xd = reflect_pad2d(x.astype(dt), kernel.shape[0] // 2)
        y = jax.lax.conv_general_dilated(
            xd, kernel.astype(dt), (1, 1), "VALID", dimension_numbers=_DN
        )
        y = y + bias.astype(dt)
        return jax.nn.relu(y) if relu else y

    return int8_conv_valid(
        x,
        kernel,
        bias,
        dt=dt,
        act_max=act_max,
        relu=relu,
        pad_fn=lambda xq: jnp.pad(
            xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
        ),
    )


def _conv_transpose_2x2(x: jax.Array, kernel: jax.Array, bias: jax.Array, dt: Any):
    """torch ConvTranspose2d(k=2, s=2) — mirrors models.layers.ConvTranspose2x2.

    Stays bf16 deliberately: an int8 variant (the packed-matmul form of
    kernels/packed_conv.packed_deconv + fused dequant + depth-to-space) was
    measured e2e SLOWER (32.5 vs 30.2 ms at b=256) — the depth-to-space
    copy plus the input quantize pass cost more than the small GEMM saves.
    """
    k = jnp.transpose(kernel.astype(dt), (2, 3, 1, 0))
    y = jax.lax.conv_transpose(
        x.astype(dt),
        k,
        strides=(2, 2),
        padding="VALID",
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    return y + bias.astype(dt)


class _Observer:
    """Records per-conv input absmax during calibration passes."""

    def __init__(self) -> None:
        self.maxes: Dict[str, jax.Array] = {}

    def see(self, name: str, x: jax.Array) -> None:
        self.maxes[name] = _absmax(x)


def _layer_scale(
    scales: Optional[Dict[str, Any]],
    observer: Optional[_Observer],
    name: str,
    x: jax.Array,
    max_hw: int,
) -> Optional[jax.Array]:
    """Activation absmax for this conv if it should run int8, else None."""
    if observer is not None and x.shape[1] <= max_hw:
        observer.see(name, x)
    if scales is None or x.shape[1] > max_hw or name not in scales:
        return None
    return jnp.asarray(scales[name], jnp.float32)


def _fold_stem(enc_params) -> Tuple[jax.Array, jax.Array]:
    """Compose the 1x1 grayscale stem (net.py:77) into conv1_1 — exact.

    The stem is pointwise affine (y = x*k + b per channel), which commutes
    with reflection padding, so conv1_1(pad(stem(x))) == conv'(pad(x)) + b'
    with K'[h,w,0,f] = sum_o stem_k[o] K[h,w,o,f] and
    b'[f] = b[f] + sum_{h,w,o} K[h,w,o,f] stem_b[o]. Saves one full 128^2
    conv + tensor materialization at inference (fp32 compose; error ~1e-7).
    """
    stem_k = enc_params["stem"]["kernel"].astype(jnp.float32)  # (1,1,1,3)
    stem_b = enc_params["stem"]["bias"].astype(jnp.float32)  # (3,)
    k11 = enc_params["conv1_1"]["kernel"].astype(jnp.float32)  # (3,3,3,F)
    b11 = enc_params["conv1_1"]["bias"].astype(jnp.float32)  # (F,)
    k_f = jnp.einsum("o,hwof->hwf", stem_k[0, 0, 0], k11)[:, :, None, :]
    b_f = b11 + jnp.einsum("hwof,o->f", k11, stem_b)
    return k_f, b_f


def quant_encode(
    enc_params,
    x: jax.Array,
    *,
    scales: Optional[Dict[str, Any]] = None,
    observer: Optional[_Observer] = None,
    compute_dtype: Any = jnp.bfloat16,
    max_hw: int = 128,
    n_taps: int = 4,
    fold_stem: bool = True,
) -> jax.Array:
    """VGG encode to relu4_1 with int8 deep layers (mirrors VggEncoder)."""
    dt = compute_dtype
    x = x.astype(dt)
    folded = None
    if fold_stem:
        folded = _fold_stem(enc_params)
    else:
        stem = enc_params["stem"]
        x = (
            jax.lax.conv_general_dilated(
                x, stem["kernel"].astype(dt), (1, 1), "VALID", dimension_numbers=_DN
            )
            + stem["bias"].astype(dt)
        )
    fused_head = (
        _use_fused(
            x,
            observer,
            channels=int(enc_params["conv1_1"]["kernel"].shape[-1]),
        )
        and n_taps >= 2
    )
    if fused_head:
        from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
            fused_encoder_head,
        )

        if folded is not None:
            k1, b1 = folded
        else:
            p = enc_params["conv1_1"]
            k1, b1 = p["kernel"], p["bias"]
        p2 = enc_params["conv1_2"]
        # conv1_1 -> relu -> conv1_2 -> relu -> 2x2 pool, one VMEM-resident
        # kernel; the pool belongs to conv2_1's pool_before (net.py:84).
        x = fused_encoder_head(
            x, k1.astype(dt), b1, p2["kernel"].astype(dt), p2["bias"]
        )

    for block in _BLOCKS[:n_taps]:
        for name, _, pool_before in block:
            if fused_head and name in ("conv1_1", "conv1_2"):
                continue
            if pool_before and not (fused_head and name == "conv2_1"):
                x = max_pool_ceil(x, 2, 2)
            if folded is not None and name == "conv1_1":
                kernel, bias = folded
            else:
                p = enc_params[name]
                kernel, bias = p["kernel"], p["bias"]
            am = _layer_scale(scales, observer, f"encoder.{name}", x, max_hw)
            x = _reflect_conv(x, kernel, bias, dt=dt, act_max=am, relu=True)
    return x


def quant_decode(
    dec_params,
    t: jax.Array,
    *,
    scales: Optional[Dict[str, Any]] = None,
    observer: Optional[_Observer] = None,
    compute_dtype: Any = jnp.bfloat16,
    max_hw: int = 128,
    prefix: str = "decoder",
) -> jax.Array:
    """relu4_1 features -> (B, H, W, 2) amp+phase (mirrors AmpPhaseDecoder).

    ``prefix`` names the scales-dict namespace — "decoder" for the main
    amp/phase decoder, "decoder_ph" for the dedicated phase head (the
    reference's decoder_ph artifact, test_field_retrieval_mnist.py:77)."""
    dt = compute_dtype
    x = t.astype(dt)
    for i, (kind, name) in enumerate(_DEC_LADDER):
        p = dec_params[name]
        if kind == "up":
            x = jax.nn.relu(_conv_transpose_2x2(x, p["kernel"], p["bias"], dt))
            continue
        if name == "conv8" and _use_fused(
            x, observer, channels=int(x.shape[3])
        ):
            from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
                fused_conv_tail,
            )

            p9 = dec_params["conv9"]
            p10 = dec_params["conv10"]
            return fused_conv_tail(
                x,
                p["kernel"].astype(dt),
                p["bias"],
                p9["kernel"].astype(dt),
                p9["bias"],
                p10["kernel"].astype(dt),
                p10["bias"],
            )
        last = i == len(_DEC_LADDER) - 1
        am = _layer_scale(scales, observer, f"{prefix}.{name}", x, max_hw)
        x = _reflect_conv(
            x, p["kernel"], p["bias"], dt=dt, act_max=am, relu=not last
        )
    return x


def quant_retrieval_forward(
    variables,
    content: jax.Array,
    style_mean: jax.Array,
    style_std: jax.Array,
    alpha: float = 1.0,
    *,
    scales: Optional[Dict[str, Any]] = None,
    observer: Optional[_Observer] = None,
    compute_dtype: Any = jnp.bfloat16,
    max_hw: int = 128,
    unknown_distance: bool = True,
):
    """int8-accelerated StyleTransferNet.field_retrieval (net.py:228-260).

    ``content`` is the sqrt-intensity hologram batch, NHWC. Returns
    (amp, phase[, d_pred]) exactly like the flax method.
    """
    from style_transfer_based_holographic_imaging_tpu.models.distance import (
        DistanceMLP,
    )

    params = variables["params"]
    content_feat = quant_encode(
        params["encoder"],
        content,
        scales=scales,
        observer=observer,
        compute_dtype=compute_dtype,
        max_hw=max_hw,
    )
    t = adain_with_stats(content_feat, style_mean, style_std)
    t = alpha * t + (1.0 - alpha) * content_feat
    g = quant_decode(
        params["decoder"],
        t,
        scales=scales,
        observer=observer,
        compute_dtype=compute_dtype,
        max_hw=max_hw,
    )
    amp, phase = g[..., 0:1], g[..., 1:2]
    if "decoder_ph" in params:
        # Dedicated phase head: phase from decoder_ph channel 0, mirroring
        # StyleTransferNet.field_retrieval's with_phase_decoder branch.
        ph = quant_decode(
            params["decoder_ph"],
            t,
            scales=scales,
            observer=observer,
            compute_dtype=compute_dtype,
            max_hw=max_hw,
            prefix="decoder_ph",
        )
        phase = ph[..., 0:1]
    if not unknown_distance:
        return amp, phase
    mlp = DistanceMLP(dtype=compute_dtype)
    d = mlp.apply(
        {"params": params["distance_g"]}, calc_mean_std(content_feat)
    )
    return amp, phase, d


def calibrate_scales(
    variables,
    content_batches: Iterable[np.ndarray],
    style_mean,
    style_std,
    *,
    alpha: float = 1.0,
    compute_dtype: Any = jnp.bfloat16,
    max_hw: int = 128,
    margin: float = 1.0,
) -> Dict[str, float]:
    """Run fp calibration passes and return per-conv input absmax scales.

    ``content_batches``: NHWC sqrt-intensity hologram batches. The returned
    dict {conv_name: absmax * margin} feeds ``quant_retrieval_forward``.
    """
    sm = jnp.asarray(style_mean)
    ss = jnp.asarray(style_std)

    # variables/sm/ss are jit ARGUMENTS, not closures: closed-over device
    # arrays are embedded as constants at trace time, and inlining a constant
    # (mlir.ir_constant) host-fetches the array — which the remote axon
    # backend rejects with UNIMPLEMENTED.
    def one_batch(variables, content, sm, ss):
        obs = _Observer()
        quant_retrieval_forward(
            variables,
            content,
            sm,
            ss,
            alpha,
            observer=obs,
            compute_dtype=compute_dtype,
            max_hw=max_hw,
            unknown_distance=False,
        )
        return obs.maxes

    run = jax.jit(one_batch)
    agg: Dict[str, float] = {}
    for batch in content_batches:
        maxes = jax.device_get(run(variables, jnp.asarray(batch, jnp.float32), sm, ss))
        for k, v in maxes.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return {k: v * margin for k, v in agg.items()}


def save_scales(scales: Dict[str, float], path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1, sort_keys=True)


def load_scales(path: str) -> Dict[str, float]:
    import json

    with open(path) as f:
        return json.load(f)
