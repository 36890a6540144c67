"""Pipeline parallelism: GPipe-scheduled retrieval over a ``pipe`` mesh axis.

The reference is single-process, single-device (SURVEY.md §2 — no
parallelism of any strategy). This module completes the framework's
parallelism menu (DP `parallel.mesh`, FoV/FFT sharding
`parallel.fft_sharding`, channel TP `parallel.tp`) with the fourth
classical axis: **pipeline parallelism**, for model families so deep/wide
that even channel-sharded layers don't fit one chip's HBM, and for
latency-hiding on multi-chip serving where the batch is too small for DP.

Design (TPU-idiomatic, everything inside one jitted SPMD program):

* The retrieval forward (stem → VGG ladder → AdaIN + distance head →
  decoder ladder) is flattened into a linear chain of layer ops and split
  into ``mesh.shape['pipe']`` contiguous stages, balanced by a FLOP model
  (exact linear-partition DP, not greedy).
* Stages are heterogeneous (different param/activation shapes), but SPMD
  requires one program on every device. Both are therefore *packed*: each
  stage's parameters flatten into one fp32 vector, padded to the widest
  stage and stacked into an ``(S, Pmax)`` array sharded ``P('pipe', None)``
  — each device materialises ONLY its own stage's weights (true pipeline
  memory scaling). Activations at stage boundaries likewise travel as
  ``(microbatch, Amax)`` flat buffers; each stage unpacks with its static
  boundary shape via ``lax.switch`` on ``lax.axis_index('pipe')``.
* The schedule is classic GPipe inside one ``lax.scan``: at tick ``t``,
  device ``s`` runs microbatch ``t - s`` (bubbles compute garbage that is
  masked out of the collection window), then a single ring
  ``lax.ppermute`` hands its output to stage ``s+1``; the last stage's
  buffers are ``psum``-broadcast so the result leaves the shard_map
  replicated. ``M`` microbatches over ``S`` stages cost ``M + S - 1``
  ticks — bubble fraction ``(S-1)/(M+S-1)``, amortised by raising
  ``n_micro`` exactly as in the scaling-book pipelining recipe.

The distance prediction (needed downstream of the encoder) rides the flat
activation buffer as one extra lane, so it flows through later stages
without a separate collective.

Numerics are identical to the single-device ``pipelines.retrieval_step``
(same reflect-pad VALID convs, ceil-mode pools, transposed-conv taps,
instance-norm rows; fp32 throughout); ``tests/test_parallel.py`` asserts
parity on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.models.layers import (
    instance_norm_rows,
    max_pool_ceil,
    reflect_pad2d,
)
from style_transfer_based_holographic_imaging_tpu.models.vgg import _BLOCKS
from style_transfer_based_holographic_imaging_tpu.ops.stats import (
    adain_with_stats,
    calc_mean_std,
)

__all__ = [
    "PIPE_AXIS",
    "make_pipeline_retrieval_fn",
    "make_pipeline_finetune_fn",
    "make_pipeline_train_fn",
    "pipeline_plan",
]

PIPE_AXIS = "pipe"

_DN = ("NHWC", "HWIO", "NHWC")

# Decoder ladder (models/decoder.py <=> reference net.py:33-74):
# (name, base features, kind) in execution order. 'u' = ConvTranspose2x2,
# 'r' = reflect conv + relu, 'last' = reflect conv, no relu, fixed 2ch.
_DECODER: Tuple[Tuple[str, int, str], ...] = (
    ("conv0", 512, "r"),
    ("conv1", 256, "r"),
    ("up0", 256, "u"),
    ("conv2", 256, "r"),
    ("conv3", 256, "r"),
    ("conv4", 256, "r"),
    ("conv5", 128, "r"),
    ("up1", 128, "u"),
    ("conv6", 128, "r"),
    ("conv7", 64, "r"),
    ("up2", 64, "u"),
    ("conv8", 64, "r"),
    ("conv9", 64, "r"),
    ("conv10", 2, "last"),
)


@dataclasses.dataclass(frozen=True)
class _Layer:
    kind: str                      # 'stem' | 'rconv' | 'up' | 'adain' | 'stash'
    path: Tuple[str, ...]          # into params['params']
    relu: bool
    pool_before: bool
    in_shape: Tuple[int, int, int]   # activation (h, w, c) INTO this op
    out_shape: Tuple[int, int, int]
    flops: float


def _build_chain(
    image_size: int, width: float = 1.0, with_phase_decoder: bool = False
) -> List[_Layer]:
    """The retrieval forward as a flat layer chain with static shapes.

    ``with_phase_decoder`` appends the dedicated decoder_ph ladder (the
    reference's decoder_ph artifact surface, test_field_retrieval_mnist.py:77)
    after a zero-param 'stash' op that parks the main decoder's output in the
    ``g`` lane and rewinds the activation to the AdaIN mixture ``t`` — both
    decoders consume the same ``t`` (models/net.py field_retrieval)."""

    def w_(f: int) -> int:
        return max(int(round(f * width)), 8)

    def _decoder_ladder(layers, module, h, w, c):
        for name, feats, kind in _DECODER:
            ih, iw, ic = h, w, c
            if kind == "u":
                f = w_(feats)
                h, w = h * 2, w * 2
                layers.append(
                    _Layer("up", (module, name), True, False, (ih, iw, ic),
                           (h, w, f), 2.0 * h * w * ic * f)
                )
            else:
                f = 2 if kind == "last" else w_(feats)
                layers.append(
                    _Layer("rconv", (module, name), kind != "last", False,
                           (ih, iw, ic), (h, w, f), 2.0 * h * w * 9 * ic * f)
                )
            c = f
        return h, w, c

    layers: List[_Layer] = []
    h = w = image_size
    c = 1
    layers.append(
        _Layer("stem", ("encoder", "stem"), False, False, (h, w, c), (h, w, 3),
               2.0 * h * w * 3)
    )
    c = 3
    for block in _BLOCKS[:4]:
        for name, feats, pool_before in block:
            ih, iw, ic = h, w, c
            if pool_before:
                h, w = -(-h // 2), -(-w // 2)
            f = w_(feats)
            layers.append(
                _Layer("rconv", ("encoder", name), True, pool_before,
                       (ih, iw, ic), (h, w, f), 2.0 * h * w * 9 * ic * f)
            )
            c = f
    # AdaIN mixing + distance head at the relu4_1 boundary
    # (net.py:240-258). FLOPs: the distance MLP's dense ladder.
    d_flops = 2.0 * (1024 * 1024 + 1024 * 1024 + 1024 * 512 + 512)
    layers.append(
        _Layer("adain", ("distance_g",), False, False, (h, w, c), (h, w, c),
               d_flops)
    )
    t_shape = (h, w, c)
    h, w, c = _decoder_ladder(layers, "decoder", h, w, c)
    if with_phase_decoder:
        layers.append(
            _Layer("stash", ("stash",), False, False, (h, w, c), t_shape,
                   float(np.prod(t_shape)))
        )
        h, w, c = t_shape
        _decoder_ladder(layers, "decoder_ph", h, w, c)
    return layers


def _partition(chain: Sequence[_Layer], n_stages: int) -> List[List[_Layer]]:
    """Exact linear-partition of the chain into ``n_stages`` contiguous
    groups minimising the max per-stage FLOPs (O(n^2 S) DP)."""
    n = len(chain)
    if not 1 <= n_stages <= n:
        raise ValueError(f"n_stages={n_stages} for a {n}-layer chain")
    cost = np.array([l.flops for l in chain])
    pref = np.concatenate([[0.0], np.cumsum(cost)])

    # dp[s][i] = best max-cost splitting chain[:i] into s stages.
    dp = np.full((n_stages + 1, n + 1), np.inf)
    cut = np.zeros((n_stages + 1, n + 1), np.int64)
    dp[0][0] = 0.0
    for s in range(1, n_stages + 1):
        for i in range(s, n + 1):
            for j in range(s - 1, i):
                v = max(dp[s - 1][j], pref[i] - pref[j])
                if v < dp[s][i]:
                    dp[s][i] = v
                    cut[s][i] = j
    bounds = [n]
    for s in range(n_stages, 0, -1):
        bounds.append(int(cut[s][bounds[-1]]))
    bounds = bounds[::-1]
    return [list(chain[bounds[s] : bounds[s + 1]]) for s in range(n_stages)]


def pipeline_plan(
    image_size: int,
    n_stages: int,
    width: float = 1.0,
    with_phase_decoder: bool = False,
) -> List[List[str]]:
    """Human-readable stage assignment (layer names per stage)."""
    stages = _partition(
        _build_chain(image_size, width, with_phase_decoder), n_stages
    )
    return [["/".join(l.path) for l in st] for st in stages]


# ---- functional layer applies (parity contracts in models/layers.py) ----


def _conv(x, kernel, bias, padding):
    return (
        jax.lax.conv_general_dilated(x, kernel, (1, 1), padding,
                                     dimension_numbers=_DN)
        + bias
    )


def _apply_rconv(p, x, relu):
    """ReflectionPad2d(1) + VALID 3x3 conv — ReflectConv's matpad backend."""
    y = _conv(reflect_pad2d(x, 1), p["kernel"], p["bias"], "VALID")
    return jax.nn.relu(y) if relu else y


def _apply_up(p, x):
    """torch ConvTranspose2d(k=2, s=2) + relu (models/layers.ConvTranspose2x2)."""
    k = jnp.transpose(p["kernel"], (2, 3, 1, 0))
    y = jax.lax.conv_transpose(
        x, k, strides=(2, 2), padding="VALID", dimension_numbers=_DN,
        transpose_kernel=True,
    )
    return jax.nn.relu(y + p["bias"])


def _apply_distance(p, mean, std):
    """DistanceMLP forward, deterministic (models/distance.py)."""
    b = mean.shape[0]
    x = jnp.concatenate([mean.reshape(b, -1), std.reshape(b, -1)], axis=-1)
    for name in ("l1", "l2", "l3"):
        x = x @ p[name]["kernel"] + p[name]["bias"]
        x = jax.nn.relu(instance_norm_rows(x))
    return jax.nn.sigmoid(x @ p["out"]["kernel"] + p["out"]["bias"])


def _layer_leaf_shapes(layer: _Layer, width: float) -> List[Tuple[Tuple[str, ...], Tuple[int, ...]]]:
    """(relative param path, shape) leaves of one layer op, in pack order."""
    ih, iw, ic = layer.in_shape
    oh, ow, oc = layer.out_shape
    if layer.kind == "stem":
        return [(("kernel",), (1, 1, ic, oc)), (("bias",), (oc,))]
    if layer.kind == "rconv":
        return [(("kernel",), (3, 3, ic, oc)), (("bias",), (oc,))]
    if layer.kind == "up":
        return [(("kernel",), (ic, oc, 2, 2)), (("bias",), (oc,))]
    if layer.kind == "adain":
        hidden = 1024
        dims = [(ic * 2, hidden), (hidden, hidden), (hidden, hidden // 2),
                (hidden // 2, 1)]
        out: List[Tuple[Tuple[str, ...], Tuple[int, ...]]] = []
        for name, (i, o) in zip(("l1", "l2", "l3", "out"), dims):
            out.append(((name, "kernel"), (i, o)))
            out.append(((name, "bias"), (o,)))
        return out
    if layer.kind == "stash":
        return []
    raise ValueError(layer.kind)


def _get_path(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _pack_stage_params(
    params, stages: Sequence[Sequence[_Layer]], width: float
) -> Tuple[jax.Array, List[List[Tuple[int, Tuple[int, ...]]]]]:
    """Flatten each stage's params into one fp32 vector (padded to the widest
    stage) and record per-leaf (offset, shape) for static unpacking."""
    p = params["params"] if "params" in params else params
    vecs: List[jax.Array] = []
    offsets: List[List[Tuple[int, Tuple[int, ...]]]] = []
    for stage in stages:
        parts: List[jax.Array] = []
        offs: List[Tuple[int, Tuple[int, ...]]] = []
        pos = 0
        for layer in stage:
            leaf_shapes = _layer_leaf_shapes(layer, width)
            base = _get_path(p, layer.path) if leaf_shapes else None
            for rel, shape in leaf_shapes:
                leaf = jnp.asarray(_get_path(base, rel), jnp.float32)
                if tuple(leaf.shape) != shape:
                    raise ValueError(
                        f"param {layer.path + rel}: expected {shape}, got "
                        f"{tuple(leaf.shape)} — width mismatch?"
                    )
                parts.append(leaf.reshape(-1))
                offs.append((pos, shape))
                pos += leaf.size
        # A stage may hold only zero-param ops (the 'stash' rewind): keep a
        # 1-element placeholder so the packed stack stays rectangular.
        vecs.append(jnp.concatenate(parts) if parts else jnp.zeros((1,)))
        offsets.append(offs)
    pmax = max(v.size for v in vecs)
    packed = jnp.stack(
        [jnp.pad(v, (0, pmax - v.size)) for v in vecs]
    )
    return packed, offsets


@dataclasses.dataclass(frozen=True)
class _Boundary:
    """Static layout of one stage-boundary flat buffer, in lane order
    ``x | d | t | feat | g | stats``.

    * ``x`` — the running activation (always present).
    * ``d`` — distance-head prediction lane (after the adain op).
    * ``t`` — the AdaIN mixture, carried when a later stage needs it: the
      decoder_ph rewind ('stash'), or the training loss (content target,
      net.py:193).
    * ``feat`` — the pre-AdaIN relu4_1 features (training: the re-encode
      pass's content-loss operand).
    * ``g`` — the main decoder's parked output while decoder_ph runs.
    * ``stats`` — per-sample (mu, sigma) of the four encoder taps
      (training: style-loss operands, net.py:195-198).
    """

    x: Tuple[int, int, int]
    d: bool = False
    t: Optional[Tuple[int, int, int]] = None
    feat: Optional[Tuple[int, int, int]] = None
    g: Optional[Tuple[int, int, int]] = None
    stats: int = 0

    def offsets(self) -> Tuple[Dict[str, Tuple[int, Tuple[int, ...]]], int]:
        out: Dict[str, Tuple[int, Tuple[int, ...]]] = {}
        pos = int(np.prod(self.x))
        out["x"] = (0, tuple(self.x))
        if self.d:
            out["d"] = (pos, (1,))
            pos += 1
        for name in ("t", "feat", "g"):
            shp = getattr(self, name)
            if shp is not None:
                out[name] = (pos, tuple(shp))
                pos += int(np.prod(shp))
        if self.stats:
            out["stats"] = (pos, (self.stats,))
            pos += self.stats
        return out, pos

    def size(self) -> int:
        return self.offsets()[1]


def _take_lane(buf: jax.Array, layout, name: str):
    off, shp = layout[name]
    n = int(np.prod(shp))
    return buf[:, off : off + n].reshape((buf.shape[0],) + shp)


def _make_stage_fn(
    stage: Sequence[_Layer],
    offs: Sequence[Tuple[int, Tuple[int, ...]]],
    in_b: _Boundary,
    out_b: _Boundary,
    amax: int,
    width: float,
    tap_info: Dict[str, Tuple[int, int]],
) -> Callable:
    """Branch body for one stage: unpack flat lane buffers, run the layers,
    repack. All shapes static; chosen at runtime by lax.switch.

    ``tap_info`` maps encoder tap layer name -> (offset, channels) inside
    the stats lane; empty outside training mode."""
    leaf_iter = list(offs)
    in_layout, _ = in_b.offsets()

    def fn(sp: jax.Array, buf: jax.Array, sm: jax.Array, ss: jax.Array,
           alpha: jax.Array):
        mb = buf.shape[0]
        x = _take_lane(buf, in_layout, "x")
        d = _take_lane(buf, in_layout, "d") if "d" in in_layout else None
        t_val = _take_lane(buf, in_layout, "t") if "t" in in_layout else None
        feat_val = (
            _take_lane(buf, in_layout, "feat") if "feat" in in_layout else None
        )
        g_val = _take_lane(buf, in_layout, "g") if "g" in in_layout else None
        if "stats" in in_layout:
            stats_val = _take_lane(buf, in_layout, "stats")
        elif out_b.stats:
            stats_val = jnp.zeros((mb, out_b.stats), jnp.float32)
        else:
            stats_val = None

        li = 0
        for layer in stage:
            leaves: Dict[str, Any] = {}
            for rel, shape in _layer_leaf_shapes(layer, width):
                off, shp = leaf_iter[li]
                li += 1
                node = leaves
                for k in rel[:-1]:
                    node = node.setdefault(k, {})
                node[rel[-1]] = jax.lax.dynamic_slice_in_dim(
                    sp, off, int(np.prod(shp))
                ).reshape(shp)
            if layer.pool_before:
                x = max_pool_ceil(x, 2, 2)
            if layer.kind == "stem":
                x = _conv(x, leaves["kernel"], leaves["bias"], "VALID")
            elif layer.kind == "rconv":
                x = _apply_rconv(leaves, x, layer.relu)
                if (
                    stats_val is not None
                    and layer.path[0] == "encoder"
                    and layer.path[1] in tap_info
                ):
                    o, ch = tap_info[layer.path[1]]
                    mean, std = calc_mean_std(x)
                    stats_val = stats_val.at[:, o : o + ch].set(
                        mean.reshape(mb, ch)
                    )
                    stats_val = stats_val.at[:, o + ch : o + 2 * ch].set(
                        std.reshape(mb, ch)
                    )
            elif layer.kind == "up":
                x = _apply_up(leaves, x)
            elif layer.kind == "adain":
                mean, std = calc_mean_std(x)
                d = _apply_distance(leaves, mean, std)
                feat_val = x
                x = alpha * adain_with_stats(x, sm, ss) + (1.0 - alpha) * x
                t_val = x
            elif layer.kind == "stash":
                # Park the main decoder's output, rewind to the AdaIN
                # mixture for the decoder_ph ladder (net.py field_retrieval:
                # both decoders consume the same t).
                g_val = x
                assert t_val is not None, "stash needs the t lane upstream"
                x = t_val
            else:
                raise ValueError(layer.kind)

        parts = [x.reshape(mb, -1)]
        for name, val in (
            ("d", d), ("t", t_val), ("feat", feat_val), ("g", g_val),
            ("stats", stats_val),
        ):
            want = getattr(out_b, name)
            if want:
                assert val is not None, f"stage must produce lane {name!r}"
                parts.append(val.reshape(mb, -1))
        out = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        pad = amax - out.shape[-1]
        if pad:
            out = jnp.pad(out, ((0, 0), (0, pad)))
        return out

    return fn


def _build_pipeline(
    params,
    mesh: Mesh,
    *,
    n_micro: int,
    image_size: int,
    alpha: float,
    width: float,
    axis: str,
    train_taps: bool = False,
):
    """Shared pipeline construction: FLOP-balanced stages, packed per-stage
    params committed ``P(axis, None)``, and the shard_mapped GPipe forward
    ``sharded(sp, x_nhwc, sm, ss, alpha) -> (B, amax) flat lane buffers``.
    Used by the retrieval fn and both train steps (the forward is one
    differentiable program — scan/switch/ppermute/psum all carry transposes,
    so ``jax.grad`` w.r.t. the packed array yields stage-local gradients).

    ``train_taps`` adds the training lanes: per-sample (mu, sigma) of the
    four encoder taps (style loss), the pre-AdaIN relu4_1 features (content
    loss operand on the re-encode pass), and rides the AdaIN mixture ``t``
    out (content-loss target). Checkpoints carrying ``decoder_ph`` get the
    stash/rewind chain automatically (phase from the dedicated head).

    ``alpha`` here is only the default recorded for callers; the sharded fn
    takes alpha as a TRACED scalar so training passes can disable the AdaIN
    mix (alpha=0 -> the decode of the raw style features, net.py:181)."""
    del alpha  # traced at call time; kept in the signature for callers
    n_stages = int(mesh.shape[axis])
    p = params["params"] if "params" in params else params
    with_phase = "decoder_ph" in p
    chain = _build_chain(image_size, width, with_phase)
    stages = _partition(chain, n_stages)
    packed, offsets = _pack_stage_params(params, stages, width)
    packed = jax.device_put(packed, NamedSharding(mesh, P(axis, None)))

    # Global layer positions of the lane-producing/consuming ops.
    adain_idx = next(i for i, l in enumerate(chain) if l.kind == "adain")
    stash_idx = next(
        (i for i, l in enumerate(chain) if l.kind == "stash"), None
    )
    t_shape = chain[adain_idx].out_shape
    g_shape = chain[stash_idx].in_shape if stash_idx is not None else None

    tap_info: Dict[str, Tuple[int, int]] = {}
    stats_total = 0
    if train_taps:
        for l in chain:
            if l.path[0] == "encoder" and l.path[1] in (
                "conv1_1", "conv2_1", "conv3_1", "conv4_1",
            ):
                tap_info[l.path[1]] = (stats_total, l.out_shape[2])
                stats_total += 2 * l.out_shape[2]

    starts: List[int] = []
    pos = 0
    for st in stages:
        starts.append(pos)
        pos += len(st)
    starts.append(len(chain))

    def bound(pidx: int) -> _Boundary:
        """Lane layout of the boundary BEFORE global layer index ``pidx``
        (``pidx == len(chain)`` is the final output boundary)."""
        x = chain[pidx].in_shape if pidx < len(chain) else chain[-1].out_shape
        after_adain = pidx > adain_idx
        keep_t = after_adain and (
            train_taps or (stash_idx is not None and pidx <= stash_idx)
        )
        return _Boundary(
            x=tuple(x),
            d=after_adain,
            t=tuple(t_shape) if keep_t else None,
            feat=tuple(t_shape) if (train_taps and after_adain) else None,
            g=(
                tuple(g_shape)
                if (stash_idx is not None and pidx > stash_idx)
                else None
            ),
            stats=stats_total if (train_taps and pidx > 0) else 0,
        )

    in_bounds = [
        _Boundary(x=tuple(chain[0].in_shape)) if i == 0 else bound(starts[i])
        for i in range(n_stages)
    ]
    out_bounds = [bound(starts[i + 1]) for i in range(n_stages)]
    final_b = out_bounds[-1]
    amax = max(b.size() for b in in_bounds + out_bounds)

    branch_fns = [
        _make_stage_fn(
            stages[i], offsets[i], in_bounds[i], out_bounds[i], amax, width,
            tap_info,
        )
        for i in range(n_stages)
    ]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    h0, w0, c0 = chain[0].in_shape

    def local_fn(sp, x, sm, ss, alpha):
        """Per-device GPipe schedule (inside shard_map over ``axis``)."""
        sp = sp[0]
        stage = jax.lax.axis_index(axis)
        batch = x.shape[0]
        mb = batch // n_micro
        xs = x.reshape(n_micro, mb, h0, w0, c0)
        in_flat = h0 * w0 * c0
        # Per-sample style statistics (training: t = adain(f_c, stats(f_s)),
        # net.py:178) ride microbatch-aligned; broadcast vectors stay whole.
        per_sample = sm.shape[0] == batch and batch > 1
        if per_sample:
            sm_r = sm.reshape((n_micro, mb) + sm.shape[1:])
            ss_r = ss.reshape((n_micro, mb) + ss.shape[1:])

        def tick(act, t):
            # Device ``stage`` works on microbatch ``t - stage`` at tick t.
            mbi = jnp.clip(t - stage, 0, n_micro - 1)
            x_t = xs[mbi].reshape(mb, in_flat)
            in0 = jnp.pad(x_t, ((0, 0), (0, amax - in_flat)))
            inp = jnp.where(stage == 0, in0, act)
            sm_t = sm_r[mbi] if per_sample else sm
            ss_t = ss_r[mbi] if per_sample else ss
            y = jax.lax.switch(stage, branch_fns, sp, inp, sm_t, ss_t, alpha)
            nxt = jax.lax.ppermute(y, axis, perm)
            out = jax.lax.psum(
                jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y)), axis
            )
            return nxt, out

        act0 = jnp.zeros((mb, amax), jnp.float32)
        _, outs = jax.lax.scan(tick, act0, jnp.arange(n_micro + n_stages - 1))
        return outs[n_stages - 1 :].reshape(batch, amax)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    info = {
        "out_boundary": final_b,
        "out_layout": final_b.offsets()[0],
        "has_phase": with_phase,
        "tap_info": tap_info,
        "stats_total": stats_total,
        "c4": t_shape[2],
    }
    return packed, sharded, stages, info


def make_pipeline_retrieval_fn(
    params,
    mesh: Mesh,
    *,
    n_micro: int,
    image_size: int,
    physics: Optional[PhysicsConfig] = None,
    alpha: float = 1.0,
    width: float = 1.0,
    unwrap: bool = True,
    axis: str = PIPE_AXIS,
):
    """Build a jitted pipeline-parallel retrieval step over ``mesh[axis]``.

    Args:
      params: the full net param dict (``init_net_params`` /
        ``load_release_params`` layout).
      mesh: a mesh whose ``axis`` dimension is the pipeline depth ``S``.
      n_micro: GPipe microbatch count ``M`` (batch must divide by it);
        bubble fraction is ``(S-1)/(M+S-1)``.
      image_size: static hologram side (the chain's shapes hang off it).
      physics: when given, the returned fn also ASM-refocuses by
        ``-d_style`` and returns the same dict as
        ``pipelines.retrieval_step``; otherwise only the style-plane
        fields + distance.

    Returns ``fn(content_holo_nchw, style_mean, style_std[, d_style])``.
    The packed per-stage params are committed to the mesh once,
    ``P(axis, None)``-sharded — each device holds only its stage.
    """
    packed, sharded, stages, info = _build_pipeline(
        params, mesh, n_micro=n_micro, image_size=image_size, alpha=alpha,
        width=width, axis=axis,
    )
    layout = info["out_layout"]

    @functools.partial(jax.jit, static_argnums=(4,))
    def step(sp, content_holo, sm, ss, d_style):
        content = jnp.sqrt(jnp.asarray(content_holo, jnp.float32))
        x = jnp.transpose(content, (0, 2, 3, 1))
        outs = sharded(sp, x, sm, ss, jnp.float32(alpha))
        xo = _take_lane(outs, layout, "x")
        d = _take_lane(outs, layout, "d")
        if info["has_phase"]:
            # x lane = decoder_ph output (phase from channel 0, net.py:152);
            # the main decoder's amp/phase sit parked in the g lane.
            g = _take_lane(outs, layout, "g")
            amp = jnp.transpose(g[..., 0:1], (0, 3, 1, 2))
            ph = jnp.transpose(xo[..., 0:1], (0, 3, 1, 2))
        else:
            amp = jnp.transpose(xo[..., 0:1], (0, 3, 1, 2))
            ph = jnp.transpose(xo[..., 1:2], (0, 3, 1, 2))
        result = {
            "amp_field": amp,
            "ph_field": ph,
            "distance_pred": d.reshape(-1, 1, 1, 1),
        }
        if physics is not None:
            from style_transfer_based_holographic_imaging_tpu.ops import (
                holo_forward,
            )

            refocus_d = float(
                -np.float32(d_style)
                - np.float32(2.0 * physics.distance_normalize_constant)
            )
            amp_foc, ph_foc = holo_forward(
                amp,
                ph * physics.phase_normalize,
                refocus_d,
                physics,
                return_field=True,
                unwrap=unwrap,
                asm_backend="xla",
            )
            result["amp_foc"] = amp_foc
            result["ph_foc"] = ph_foc
        return result

    def fn(content_holo, style_mean, style_std, d_style: float = 0.2):
        if content_holo.shape[0] % n_micro:
            raise ValueError(
                f"batch {content_holo.shape[0]} not divisible by "
                f"n_micro={n_micro}"
            )
        # d_style is a static jit arg (trace-time refocus constant). Without
        # physics it is unused — normalize it so varying values don't force
        # spurious recompiles of the whole shard_map program.
        d = float(d_style) if physics is not None else 0.0
        return step(packed, content_holo, style_mean, style_std, d)

    # The executed plan, verbatim (not re-derived via pipeline_plan, which
    # would re-run the chain build + partition DP and could desync).
    fn.stages = [["/".join(l.path) for l in st] for st in stages]
    fn.packed_params = packed
    return fn


def make_pipeline_finetune_fn(
    params,
    mesh: Mesh,
    *,
    n_micro: int,
    image_size: int,
    physics: PhysicsConfig,
    lr: float = 2e-5,
    distance_weight: float = 10.0,
    alpha: float = 1.0,
    width: float = 1.0,
    axis: str = PIPE_AXIS,
):
    """Pipeline-parallel SUPERVISED fine-tune: GPipe forward + backward.

    One notch beyond inference-only PP (round-1 VERDICT #10): the packed
    per-stage parameters are TRAINED through the pipelined program.
    ``jax.value_and_grad`` differentiates the shard_mapped GPipe schedule
    (every primitive in it — ``lax.scan``, ``lax.switch``, ``ppermute``,
    ``psum``, ``where`` masking — carries a transpose), so each device
    receives exactly its own stage's gradient slice, and the Adam update is
    elementwise on the ``P(axis, None)``-sharded (S, Pmax) array — no
    optimizer collectives, true pipeline memory scaling for params + both
    moments.

    Scope: the objective is the *retrieval-path* supervised loss at a FIXED
    style vector — style-plane field supervision (the targets are propagated
    from known objects through the same physics, as in
    `train.loop.generator_loss_fn`'s supervised term) plus distance
    regression — the cheap fine-tune/distillation mode. The FULL multi-loss
    scheme (per-batch style features, content/style losses, physics cycle,
    adversarial) is ``make_pipeline_train_fn``.

    Returns ``(step_fn, state0)``; ``state0 = (packed, m, v, t)`` and
    ``step_fn(state, batch, sm, ss) -> (state, metrics)`` with ``batch``
    the `data.synth.synth_batch(return_gt=True)` dict (NCHW).
    """
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
    from style_transfer_based_holographic_imaging_tpu.train.losses import (
        distance_loss,
    )

    packed, sharded, _stages, info = _build_pipeline(
        params, mesh, n_micro=n_micro, image_size=image_size, alpha=alpha,
        width=width, axis=axis,
    )
    layout = info["out_layout"]

    def loss_fn(sp, batch, sm, ss):
        x = jnp.transpose(batch["content_holo"], (0, 2, 3, 1))
        outs = sharded(sp, x, sm, ss, jnp.float32(alpha))
        xo = _take_lane(outs, layout, "x")
        d_pred = _take_lane(outs, layout, "d")
        if info["has_phase"]:
            amp = _take_lane(outs, layout, "g")[..., 0:1]
            ph = xo[..., 0:1]
        else:
            amp, ph = xo[..., 0:1], xo[..., 1:2]
        # Style-plane ground truth from the known object (stop-gradient
        # physics), exactly the supervised term of generator_loss_fn.
        gt_amp, gt_ph = holo_forward(
            batch["amplitude"],
            batch["phase_content"],
            batch["distance_style"],
            physics,
            return_field=True,
            asm_backend="xla",
        )
        gt_amp = jax.lax.stop_gradient(jnp.transpose(gt_amp, (0, 2, 3, 1)))
        gt_ph = jax.lax.stop_gradient(
            jnp.transpose(gt_ph, (0, 2, 3, 1)) / physics.phase_normalize
        )
        l_sup = jnp.mean((amp - gt_amp) ** 2) + jnp.mean((ph - gt_ph) ** 2)
        l_d = distance_loss(d_pred, batch["distance_content"])
        loss = l_sup + distance_weight * l_d
        return loss, {"loss_supervised": l_sup, "loss_distance": l_d,
                      "loss_total": loss}

    b1, b2, eps = 0.9, 0.999, 1e-8

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch, sm, ss):
        # batch is the synth_batch(return_gt=True) dict — content_holo is
        # already the sqrt-intensity the net consumes (data/synth.py).
        sp, m, v, t = state
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            sp, batch, sm, ss
        )
        t = t + 1
        m = b1 * m + (1.0 - b1) * grads
        v = b2 * v + (1.0 - b2) * grads * grads
        mhat = m / (1.0 - b1 ** t)
        vhat = v / (1.0 - b2 ** t)
        sp = sp - lr * mhat / (jnp.sqrt(vhat) + eps)
        return (sp, m, v, t), aux

    state0 = (
        packed,
        jnp.zeros_like(packed),
        jnp.zeros_like(packed),
        jnp.zeros((), jnp.float32),
    )
    return step_fn, state0


def make_pipeline_train_fn(
    params,
    mesh: Mesh,
    *,
    n_micro: int,
    image_size: int,
    physics: PhysicsConfig,
    cfg,
    lr: Optional[float] = None,
    alpha: float = 1.0,
    width: float = 1.0,
    axis: str = PIPE_AXIS,
    disc=None,
    disc_params=None,
):
    """Pipeline-parallel FULL training step: the reconstructed reference
    scheme (SURVEY §3.3 — content + style + physics cycle + distance
    [+ supervised] [+ adversarial]) through the GPipe schedule.

    Three passes through the ONE pipelined program per step (every pass
    differentiates into the same packed per-stage params):

      1. style pass  — alpha=0 disables the AdaIN mix, so the chain encodes
         the style holograms, taps per-sample (mu, sigma) at
         relu1_1..relu4_1 into the stats lane (style-loss targets,
         net.py:195-198) and predicts d_style from the feature stats.
      2. content pass — the relu4_1 segment of the style stats feeds AdaIN
         per-sample (t = adain(f_c, stats(f_s)), net.py:178); outputs g_t
         (+ decoder_ph phase when present), d_content, and rides t out
         (content-loss target).
      3. re-encode pass — g_t's amplitude goes back through the pipeline;
         the pre-AdaIN feat lane is enc(g_t) at relu4_1 (content loss,
         net.py:193) and its stats lane the style-loss operands.

    The physics cycle, distance and supervised terms are computed on the
    replicated outputs exactly as in ``train.loop.generator_loss_fn``.
    The optional LSGAN discriminator (tiny vs the generator) runs
    replicated outside the pipeline, with its own Adam state — pass
    ``disc``/``disc_params`` and set ``cfg.adv_weight``.

    ``cfg`` is a ``TrainConfig`` (weights + lr are read from it unless
    ``lr`` overrides). Returns ``(step_fn, state0)`` with
    ``state0 = (packed, m, v, t, disc_params, disc_m, disc_v)`` and
    ``step_fn(state, batch) -> (state, metrics)``; ``batch`` is the
    `data.synth.synth_batch` dict (NCHW), with GT fields when
    ``cfg.supervised_weight``.

    Cost note: passes 1 and 3 only need the encoder but run the full chain
    (their decoder ticks are wasted FLOPs, ~1.5x a minimal schedule) — the
    price of keeping ONE packed program so all three passes share weights
    and gradient plumbing.
    """
    from style_transfer_based_holographic_imaging_tpu.train.losses import (
        distance_loss,
        lsgan_d_loss,
        lsgan_g_loss,
        physics_cycle_loss,
        tv_loss,
    )
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

    if getattr(cfg, "perceptual_weight", 0.0):
        raise ValueError(
            "perceptual_weight is not plumbed through the pipelined loss "
            "program (it needs a 4th encoder pass); train with the DP/FSDP/TP "
            "paths, or set perceptual_weight=0 for PP"
        )
    lr = float(cfg.lr if lr is None else lr)
    packed, sharded, _stages, info = _build_pipeline(
        params, mesh, n_micro=n_micro, image_size=image_size, alpha=alpha,
        width=width, axis=axis, train_taps=True,
    )
    layout = info["out_layout"]
    tap_info = info["tap_info"]
    c4 = info["c4"]
    s4 = tap_info["conv4_1"][0]
    has_phase = info["has_phase"]
    use_adv = bool(cfg.adv_weight) and disc is not None

    def _amp_ph(outs):
        xo = _take_lane(outs, layout, "x")
        if has_phase:
            return _take_lane(outs, layout, "g")[..., 0:1], xo[..., 0:1]
        return xo[..., 0:1], xo[..., 1:2]

    def loss_fn(sp, dp, batch):
        content = jnp.transpose(batch["content_holo"], (0, 2, 3, 1))
        style = jnp.transpose(batch["style_holo"], (0, 2, 3, 1))
        b = content.shape[0]
        sm0 = jnp.zeros((1, 1, 1, c4), jnp.float32)
        ss0 = jnp.ones((1, 1, 1, c4), jnp.float32)

        # pass 1: style encode (alpha=0 -> no AdaIN mix)
        outs_s = sharded(sp, style, sm0, ss0, jnp.float32(0.0))
        stats_s = _take_lane(outs_s, layout, "stats")
        d_s_pred = _take_lane(outs_s, layout, "d")
        sm_b = stats_s[:, s4 : s4 + c4].reshape(b, 1, 1, c4)
        ss_b = stats_s[:, s4 + c4 : s4 + 2 * c4].reshape(b, 1, 1, c4)

        # pass 2: content retrieval with per-sample style stats
        outs_c = sharded(sp, content, sm_b, ss_b, jnp.float32(alpha))
        amp_t, ph_t = _amp_ph(outs_c)
        d_c_pred = _take_lane(outs_c, layout, "d")
        t_mix = _take_lane(outs_c, layout, "t")

        # pass 3: re-encode g_t (its amplitude, net.py:183/186)
        outs_g = sharded(sp, amp_t, sm0, ss0, jnp.float32(0.0))
        feat_g = _take_lane(outs_g, layout, "feat")
        stats_g = _take_lane(outs_g, layout, "stats")

        loss_c = jnp.mean((feat_g - jax.lax.stop_gradient(t_mix)) ** 2)
        loss_s = jnp.float32(0.0)
        sg_stats_s = jax.lax.stop_gradient(stats_s)
        for off, ch in tap_info.values():
            loss_s = loss_s + jnp.mean(
                (stats_g[:, off : off + ch] - sg_stats_s[:, off : off + ch])
                ** 2
            )
            loss_s = loss_s + jnp.mean(
                (
                    stats_g[:, off + ch : off + 2 * ch]
                    - sg_stats_s[:, off + ch : off + 2 * ch]
                )
                ** 2
            )

        loss = cfg.content_weight * loss_c + cfg.style_weight * loss_s
        aux = {"loss_content": loss_c, "loss_style": loss_s}

        amp_n = jnp.transpose(amp_t, (0, 3, 1, 2))
        ph_n = jnp.transpose(ph_t, (0, 3, 1, 2))
        if cfg.physics_weight:
            l_phy = physics_cycle_loss(
                amp_n,
                ph_n,
                d_c_pred.reshape(-1, 1, 1, 1),
                batch["distance_style"],
                batch["content_holo"],
                physics,
            )
            loss = loss + cfg.physics_weight * l_phy
            aux["loss_physics"] = l_phy
        if cfg.distance_weight:
            l_d = distance_loss(d_s_pred, batch["distance_style"]) + (
                distance_loss(d_c_pred, batch["distance_content"])
            )
            loss = loss + cfg.distance_weight * l_d
            aux["loss_distance"] = l_d
        if cfg.supervised_weight and "phase_content" in batch:
            gt_amp, gt_ph = holo_forward(
                batch["amplitude"],
                batch["phase_content"],
                batch["distance_style"],
                physics,
                return_field=True,
                asm_backend="xla",
            )
            gt_amp = jax.lax.stop_gradient(jnp.transpose(gt_amp, (0, 2, 3, 1)))
            gt_ph = jax.lax.stop_gradient(
                jnp.transpose(gt_ph, (0, 2, 3, 1)) / physics.phase_normalize
            )
            l_sup = jnp.mean((amp_t - gt_amp) ** 2) + jnp.mean(
                (ph_t - gt_ph) ** 2
            )
            loss = loss + cfg.supervised_weight * l_sup
            aux["loss_supervised"] = l_sup
        if cfg.tv_weight:
            l_tv = tv_loss(ph_n)
            loss = loss + cfg.tv_weight * l_tv
            aux["loss_tv"] = l_tv
        if use_adv:
            fake_logits, _ = disc.apply(dp, amp_t)
            l_adv = lsgan_g_loss(fake_logits)
            loss = loss + cfg.adv_weight * l_adv
            aux["loss_adv"] = l_adv

        aux["loss_total"] = loss
        aux["g_t"] = amp_t
        return loss, aux

    b1, b2, eps = 0.9, 0.999, 1e-8

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        sp, m, v, t, dp, dm, dv = state
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            sp, dp, batch
        )
        t = t + 1
        m = b1 * m + (1.0 - b1) * grads
        v = b2 * v + (1.0 - b2) * grads * grads
        mhat = m / (1.0 - b1 ** t)
        vhat = v / (1.0 - b2 ** t)
        sp = sp - lr * mhat / (jnp.sqrt(vhat) + eps)

        if use_adv:
            fake = jax.lax.stop_gradient(aux.pop("g_t"))
            real = jnp.transpose(batch["style_holo"], (0, 2, 3, 1))

            def d_loss_fn(p):
                real_logits, _ = disc.apply(p, real)
                fake_logits, _ = disc.apply(p, fake)
                return lsgan_d_loss(real_logits, fake_logits)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dp)
            dm = jax.tree.map(lambda a, g: b1 * a + (1 - b1) * g, dm, d_grads)
            dv = jax.tree.map(
                lambda a, g: b2 * a + (1 - b2) * g * g, dv, d_grads
            )
            dp = jax.tree.map(
                lambda p_, a, b_: p_
                - lr * (a / (1.0 - b1 ** t)) / (
                    jnp.sqrt(b_ / (1.0 - b2 ** t)) + eps
                ),
                dp,
                dm,
                dv,
            )
            aux["loss_disc"] = d_loss
        else:
            aux.pop("g_t", None)
        return (sp, m, v, t, dp, dm, dv), aux

    if disc_params is None:
        disc_params = {}
    state0 = (
        packed,
        jnp.zeros_like(packed),
        jnp.zeros_like(packed),
        jnp.zeros((), jnp.float32),
        disc_params,
        jax.tree.map(jnp.zeros_like, disc_params),
        jax.tree.map(jnp.zeros_like, disc_params),
    )
    return step_fn, state0
