"""High-throughput streaming reconstruction (the red-blood-cell mode).

The reference's RBC test split streams 100-300 frames per distance
(utils/Data_loader.py:106-110) — the "dynamically flowing red blood cells,
real-time" use case of its README. No dedicated script survives in its
snapshot (SURVEY.md §3.4); here it is a first-class pipeline: a prefetched
host->HBM input stream feeding one compiled retrieval program, emitting
reconstructed fields batch by batch with throughput accounting.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.data.prefetch import prefetch_to_device
from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
    make_retrieval_fn,
)

__all__ = ["stream_retrieval", "StreamStats"]


class StreamStats:
    def __init__(self):
        self.n_frames = 0
        self.t_start = time.perf_counter()

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t_start

    @property
    def frames_per_sec(self) -> float:
        return self.n_frames / max(self.elapsed, 1e-9)


def stream_retrieval(
    params,
    batches: Iterable[Dict[str, np.ndarray]],
    style_vector: Tuple[np.ndarray, np.ndarray],
    config: Optional[ExperimentConfig] = None,
    *,
    style_distance: float | None = None,
    sharding: Optional[jax.sharding.Sharding] = None,
    dtype=None,
    stats: Optional[StreamStats] = None,
    refine_steps: int = 0,
    quant_scales: Optional[Dict[str, float]] = None,
) -> Iterator[Dict[str, jax.Array]]:
    """Stream batches of intensity holograms through field retrieval.

    Each input batch is a dict with ``holo`` (B, 1, H, W); batches are
    prefetched to HBM while the previous batch computes. Yields the
    retrieval outputs (device arrays — convert lazily to overlap) per
    compiled-size chunk: every batch is padded up / chunked down to the
    FIRST batch's size so one program serves the whole stream, so a batch
    larger than the first yields several output dicts.

    ``refine_steps > 0`` appends physics-consistent refinement of the
    refocused field against each measured frame (joint amp+phase — the
    experimental domains have no known-amplitude prior).

    ``quant_scales`` (models.quant.calibrate_scales) serves the int8 conv
    path — measured ~27% more holograms/s at width 1.0 on v5e.
    """
    config = config or ExperimentConfig()
    # DP-sharded streams can use the Pallas propagator too: the kernel
    # registers a custom_partitioning (kernels/asm_pallas.py) that shards its
    # batch dim with the operands, so "auto" backend selection is safe under
    # a mesh.
    asm_backend = None
    from style_transfer_based_holographic_imaging_tpu.models.net import (
        has_phase_decoder,
    )

    fn = make_retrieval_fn(
        config.physics,
        dtype=dtype,
        width=config.model.width,
        with_phase_decoder=has_phase_decoder(params),
        quant_scales=quant_scales,
        asm_backend=asm_backend,
    )
    sm = jnp.asarray(style_vector[0])
    ss = jnp.asarray(style_vector[1])
    # style_distances / style_distance are millimetres; the network consumes
    # normalized units (mm/normalize - const) — same conversion as the
    # training synthesizer (data/synth.py) and domain_eval.
    d_s_mm = (
        config.data.style_distances[0] if style_distance is None else style_distance
    )
    d_s = config.physics.to_network_units(d_s_mm)

    # Normalize every batch to the FIRST batch's size host-side: a new input
    # shape would retrace + recompile the whole retrieval program for one
    # batch (minutes on a remote TPU). Smaller batches (e.g. the stream's
    # ragged tail) are padded up with their last frame; LARGER ones are
    # chunked down. Outputs are trimmed back after.
    valid_counts: list[int] = []

    def padded(src):
        first_b = None
        for batch in src:
            b = next(iter(batch.values())).shape[0]
            if first_b is None:
                first_b = b
            for lo in range(0, b, first_b):
                chunk = {k: v[lo : lo + first_b] for k, v in batch.items()}
                cb = next(iter(chunk.values())).shape[0]
                if cb < first_b:
                    pad = first_b - cb
                    chunk = {
                        k: np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)], axis=0
                        )
                        for k, v in chunk.items()
                    }
                valid_counts.append(cb)
                yield chunk

    for batch in prefetch_to_device(padded(batches), sharding=sharding):
        holo = batch["holo"]
        b_valid = valid_counts.pop(0)
        b = holo.shape[0]
        # d_s is a Python float on purpose — the retrieval fn hoists it into
        # a static jit arg (trace-time-constant refocus distance).
        out = fn(params, holo, sm, ss, d_s)
        if refine_steps:
            from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
                physics_refine,
            )

            refined = physics_refine(
                out["amp_foc"],
                out["ph_foc"],
                out["distance_pred"],
                jnp.sqrt(jnp.asarray(holo, jnp.float32)),
                config.physics,
                steps=refine_steps,
                asm_backend=asm_backend,
            )
            out = dict(
                out, amp_foc=refined["amp"], ph_foc=refined["phase"]
            )
        if b_valid < b:
            out = {k: v[:b_valid] for k, v in out.items()}
        if stats is not None:
            stats.n_frames += b_valid
        yield out
