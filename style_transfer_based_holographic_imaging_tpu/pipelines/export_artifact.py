"""AOT-exported serving artifacts: one self-contained StableHLO program.

The reference deploys by shipping Python source plus three torch
checkpoints and a style vector that the entry script re-assembles at
startup (test_field_retrieval_mnist.py:70-102). This module adds a
deployment path with no reference analogue: freeze the WHOLE retrieval
program — weights, style vector and the static refocus distance baked in
as constants, sqrt → VGG encode → AdaIN → decode → distance head → ASM
refocus → DCT unwrap — into one serialized `jax.export` (StableHLO)
artifact. The artifact

* needs NO model code to run (``load_artifact`` + jax only — nothing from
  this package), so serving hosts never import the framework;
* is multi-platform: lowered for every platform named at export time
  (default cpu+tpu), the same file runs on a dev machine and a TPU pod;
* skips Python tracing at load (the dominant host-side cold-start cost);
  XLA compiles the pre-lowered StableHLO directly, and that compile hits
  the persistent compilation cache across process restarts;
* pins the numerics: a release artifact can be re-validated bit-for-bit
  years later regardless of model-code drift.

The default export uses the XLA ASM backend (``asm_backend="xla"``):
StableHLO serialization of Mosaic ``tpu_custom_call`` payloads ties the
artifact to one TPU generation, defeating portability. The int8
(``quant_scales``) and bf16 serving paths export fine — they are pure XLA
ops. ``asm_backend="pallas"`` opts into a TPU-only artifact that embeds
the fused Mosaic ASM kernel (the live server's fast path); export it ON
the target TPU host so Mosaic lowers for the right chip generation.

File format: ``HSTXPRT1`` magic, 8-byte little-endian header length, JSON
header (shape/platform/provenance metadata), then the `jax.export` blob.

CLI: ``holostyle export --checkpoint ... --out model.hstx`` to freeze
(add ``--check`` for a golden-suite score of the written file) and
``holostyle serve --artifact model.hstx`` to serve it.
"""

from __future__ import annotations

import functools
import json
import struct
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig

__all__ = [
    "export_retrieval",
    "save_artifact",
    "load_artifact",
    "ArtifactRetrieval",
]

_MAGIC = b"HSTXPRT1"
# The serving result contract. pipelines/server.py imports this — the frozen
# artifact's outputs and the live server's response keys must stay identical.
_RESULT_KEYS = ("amp_foc", "ph_foc", "distance_pred", "amp_field", "ph_field")


def export_retrieval(
    params,
    style_vector: Tuple[np.ndarray, np.ndarray],
    config: Optional[ExperimentConfig] = None,
    *,
    batch_size: int = 32,
    dtype=None,
    quant_scales: Optional[Dict[str, float]] = None,
    style_distance: Optional[float] = None,
    platforms: Optional[Tuple[str, ...]] = ("cpu", "tpu"),
    asm_backend: str = "xla",
) -> Tuple[bytes, dict]:
    """Export the fixed-shape retrieval program; returns (blob, metadata).

    Mirrors ``pipelines.server.RetrievalService``'s program exactly (same
    static style distance in network units, same NCHW contract), but with
    params + style vector embedded as program constants. ``platforms=None``
    exports for the current backend only.

    ``asm_backend="pallas"`` embeds the fused Mosaic ASM kernel (the live
    server's fast path — measured 42.4k vs 25.5k holo/s on the int8 ultra
    tier at b=512 on v5e). The Mosaic payload is compiled for ONE TPU
    generation, so this forces ``platforms=("tpu",)`` and trades away the
    cpu portability of the default XLA export.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from style_transfer_based_holographic_imaging_tpu.models.net import (
        StyleTransferNet,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        retrieval_step,
    )

    cfg = config or ExperimentConfig()
    image_size = int(cfg.model.image_size)
    d_s_mm = (
        cfg.data.style_distances[0] if style_distance is None else style_distance
    )
    d_style = float(cfg.physics.to_network_units(d_s_mm))

    # Host copies: closed-over numpy embeds directly as StableHLO constants
    # (a closed-over DEVICE array would be fetched at lowering — the jit
    # closure-constant trap in CLAUDE.md).
    params_h = jax.device_get(params)
    sm = np.asarray(style_vector[0], np.float32)
    ss = np.asarray(style_vector[1], np.float32)

    if asm_backend not in ("xla", "pallas"):
        raise ValueError(f"asm_backend must be 'xla' or 'pallas', got {asm_backend!r}")
    kw = {}
    if asm_backend == "pallas":
        platforms = ("tpu",)
        kw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    from style_transfer_based_holographic_imaging_tpu.models.net import (
        has_phase_decoder,
    )

    net = StyleTransferNet(
        dtype=dtype or jnp.float32,
        width=cfg.model.width,
        with_phase_decoder=has_phase_decoder(params),
    )
    step = functools.partial(
        retrieval_step,
        physics=cfg.physics,
        alpha=cfg.eval.alpha,
        net=net,
        quant_scales=quant_scales,
        quant_dtype=dtype or jnp.bfloat16,
        asm_backend=asm_backend,
    )

    def fn(holo):
        out = step(params_h, holo, sm, ss, d_style)
        return {k: out[k] for k in _RESULT_KEYS if k in out}

    spec = jax.ShapeDtypeStruct((batch_size, 1, image_size, image_size), jnp.float32)
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kw)(spec)
    meta = {
        "batch_size": batch_size,
        "image_size": image_size,
        "platforms": list(exported.platforms),
        "style_distance_mm": float(d_s_mm),
        "quantized": quant_scales is not None,
        "dtype": str(np.dtype(dtype).name) if dtype is not None else "float32",
        "width": cfg.model.width,
        "asm_backend": asm_backend,
        "result_keys": list(_RESULT_KEYS),
        "config": cfg.to_json(),
    }
    return exported.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    header = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)


def run_chunked(
    holo: np.ndarray, batch_size: int, image_size: int, run
) -> Dict[str, np.ndarray]:
    """Validate (B, 1, S, S) holograms, pad the ragged tail with its last
    frame, run ``run`` per compiled-batch chunk, trim and concatenate.

    The ONE batching contract shared by the live server (RetrievalService)
    and frozen artifacts (ArtifactRetrieval) — a single implementation so
    the wire-visible padding/chunking semantics cannot diverge.
    """
    holo = np.asarray(holo, np.float32)
    if holo.ndim == 3:
        holo = holo[:, None]
    if (
        holo.ndim != 4
        or holo.shape[0] == 0
        or holo.shape[1] != 1
        or holo.shape[2:] != (image_size, image_size)
    ):
        raise ValueError(
            f"expected (B>=1, 1, {image_size}, {image_size}) intensity "
            f"holograms, got {holo.shape}"
        )
    n = holo.shape[0]
    outs = []
    for lo in range(0, n, batch_size):
        chunk = holo[lo : lo + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
            )
        out = run(chunk)
        if pad:
            out = {k: v[: batch_size - pad] for k, v in out.items()}
        outs.append(out)
    if len(outs) == 1:
        return outs[0]
    return {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}


@dataclass
class ArtifactRetrieval:
    """A loaded artifact: ``meta`` + a padded/chunked ``retrieve``."""

    meta: dict
    _exported: object

    def __call__(self, holo):
        """Raw call at the compiled batch size (device arrays in/out)."""
        return self._exported.call(holo)

    def retrieve(self, holo: np.ndarray) -> Dict[str, np.ndarray]:
        """Run (B, 1, S, S) intensity holograms for any B >= 1, padding and
        chunking to the compiled batch (same contract as the server)."""
        import jax

        return run_chunked(
            holo,
            int(self.meta["batch_size"]),
            int(self.meta["image_size"]),
            lambda chunk: {
                k: np.asarray(v)
                for k, v in jax.device_get(self._exported.call(chunk)).items()
            },
        )


def load_artifact(path: str) -> ArtifactRetrieval:
    """Load a ``save_artifact`` file. Requires only jax — no model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a retrieval artifact (bad magic)")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    return ArtifactRetrieval(meta, jexport.deserialize(blob))
