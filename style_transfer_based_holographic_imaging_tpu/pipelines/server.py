"""HTTP serving daemon around the retrieval pipeline.

The reference has no serving story at all (its one entry point is a batch
demo script, test_field_retrieval_mnist.py); production deployment of this
framework wants a long-lived process that keeps the compiled program and
the weights resident and answers retrieval requests over the wire. This is
that process, TPU-first in the ways that matter:

* **Compile once, fixed shapes.** The retrieval program is jitted for ONE
  static batch shape (B, 1, H, W) at startup. Requests of any size are
  padded up / chunked to that shape — no shape-polymorphic recompiles ever
  hit the serving path.
* **One device owner.** A single lock serializes device work (one chip =
  one compute stream); the stdlib ThreadingHTTPServer handles sockets and
  (de)serialization concurrently outside the lock.
* **npz in, npz out.** Requests carry a ``holo`` array (B, 1, H, W)
  intensity holograms; responses carry ``amp_foc``/``ph_foc``/
  ``distance_pred`` (+ raw fields). Everything stdlib + numpy.

Endpoints:
  GET  /healthz   -> JSON status (device, batch shape, quant/refine config)
  POST /retrieve  -> npz body with ``holo`` -> npz response

Start from the CLI::

  python -m style_transfer_based_holographic_imaging_tpu.cli serve \
      --checkpoint checkpoints/ultra/release --quant --port 8100
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.pipelines.export_artifact import (
    _RESULT_KEYS,
)
from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
    make_retrieval_fn,
)

__all__ = [
    "RetrievalService",
    "ArtifactService",
    "serve_forever",
    "retrieve_remote",
]


class ArtifactService:
    """Serve a frozen export artifact (pipelines/export_artifact.py).

    Same ``retrieve``/``health`` surface as `RetrievalService` (so
    `serve_forever` takes either), but the program, weights, style vector
    and refocus distance all come from ONE ``.hstx`` file — the serving
    host needs jax and this package's serving layer only, no checkpoint
    tree and no model code. Padding/chunking to the compiled batch lives
    in ``ArtifactRetrieval.retrieve``.
    """

    def __init__(self, path: str):
        from style_transfer_based_holographic_imaging_tpu.pipelines.export_artifact import (
            load_artifact,
        )

        self.path = path
        self._art = load_artifact(path)
        self.meta = self._art.meta
        self.batch_size = int(self.meta["batch_size"])
        self.image_size = int(self.meta["image_size"])
        self._lock = threading.Lock()
        self.n_served = 0

    def warmup(self) -> None:
        """Trigger the one-time XLA compile before the first request."""
        self.retrieve(
            np.full((1, 1, self.image_size, self.image_size), 0.1, np.float32)
        )
        self.n_served = 0

    def retrieve(self, holo: np.ndarray) -> Dict[str, np.ndarray]:
        with self._lock:
            out = self._art.retrieve(holo)
            self.n_served += next(iter(out.values())).shape[0]
        return out

    def health(self) -> Dict:
        import jax

        return {
            "status": "ok",
            "device": str(jax.devices()[0]),
            "artifact": self.path,
            "platforms": self.meta.get("platforms"),
            "batch_size": self.batch_size,
            "image_size": self.image_size,
            "width": self.meta.get("width"),
            "quantized": self.meta.get("quantized"),
            "refine_steps": 0,
            "n_served": self.n_served,
        }


class RetrievalService:
    """Compiled retrieval program + weights, behind a device lock."""

    def __init__(
        self,
        params,
        style_vector: Tuple[np.ndarray, np.ndarray],
        config: Optional[ExperimentConfig] = None,
        *,
        batch_size: int = 32,
        dtype=None,
        quant_scales: Optional[Dict[str, float]] = None,
        refine_steps: int = 0,
        style_distance: Optional[float] = None,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.config = config or ExperimentConfig()
        self.batch_size = int(batch_size)
        # Batch data-parallel serving: shard the compiled batch over the mesh
        # (params/style replicated, XLA partitions the program — the same DP
        # layout as pipelines/streaming). batch_size must divide by the mesh.
        self.mesh = mesh
        self._in_sharding = None
        if mesh is not None:
            from style_transfer_based_holographic_imaging_tpu.parallel import (
                DATA_AXIS,
                batch_sharding,
                replicated,
            )

            # batch_sharding shards over the 'data' axis only — a 2-D
            # (data x model) serving mesh needs divisibility by that axis,
            # not the total device count.
            if DATA_AXIS not in mesh.shape:
                raise ValueError(
                    f"serving mesh axes {tuple(mesh.axis_names)} lack the "
                    f"batch axis {DATA_AXIS!r}"
                )
            if self.batch_size % mesh.shape[DATA_AXIS]:
                raise ValueError(
                    f"batch_size {self.batch_size} must be divisible by the "
                    f"'{DATA_AXIS}' mesh axis size ({mesh.shape[DATA_AXIS]})"
                )
            self._in_sharding = batch_sharding(mesh)
            params = jax.device_put(params, replicated(mesh))
        self.image_size = int(self.config.model.image_size)
        self.refine_steps = int(refine_steps)
        self.quantized = quant_scales is not None
        self.params = params
        self._sm = jnp.asarray(style_vector[0])
        self._ss = jnp.asarray(style_vector[1])
        # millimetres -> network units (mm/normalize - const), matching the
        # training synthesizer — critical for domain configs where
        # distance_normalize != 1.
        d_s_mm = (
            self.config.data.style_distances[0]
            if style_distance is None
            else style_distance
        )
        # Kept as a Python float: the retrieval fn hoists scalar style
        # distances into a static jit argument (trace-time-constant refocus —
        # const-H ASM kernel / XLA-folded transfer function), and a float
        # needs no per-request hoist fetch or mesh placement.
        self._d_style = float(self.config.physics.to_network_units(d_s_mm))
        if self._in_sharding is not None:
            from style_transfer_based_holographic_imaging_tpu.parallel import (
                replicated,
            )

            self._sm = jax.device_put(self._sm, replicated(mesh))
            self._ss = jax.device_put(self._ss, replicated(mesh))
        # Mesh-sharded serving can use the Pallas propagator: the kernel
        # registers a custom_partitioning (kernels/asm_pallas.py) that shards
        # its batch dim with the operands, so "auto" selection is safe.
        self._asm_backend = None
        from style_transfer_based_holographic_imaging_tpu.models.net import (
            has_phase_decoder,
        )

        self._fn = make_retrieval_fn(
            self.config.physics,
            alpha=self.config.eval.alpha,
            dtype=dtype,
            width=self.config.model.width,
            with_phase_decoder=has_phase_decoder(params),
            quant_scales=quant_scales,
            asm_backend=self._asm_backend,
        )
        self._lock = threading.Lock()
        self.n_served = 0

    def warmup(self) -> None:
        """Trigger the one-time compile before the first request."""
        dummy = np.full(
            (self.batch_size, 1, self.image_size, self.image_size), 0.1, np.float32
        )
        self.retrieve(dummy)
        self.n_served = 0

    def _run_one(self, holo_np: np.ndarray) -> Dict[str, np.ndarray]:
        jax, jnp = self._jax, self._jnp
        holo_dev = (
            jax.device_put(np.asarray(holo_np, np.float32), self._in_sharding)
            if self._in_sharding is not None
            else jnp.asarray(holo_np)
        )
        out = self._fn(self.params, holo_dev, self._sm, self._ss, self._d_style)
        if self.refine_steps:
            from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
                physics_refine,
            )

            # Reuse the already-transferred (and mesh-sharded) hologram —
            # sqrt(intensity) on device is the measured amplitude.
            refined = physics_refine(
                out["amp_foc"],
                out["ph_foc"],
                out["distance_pred"],
                jnp.sqrt(holo_dev.astype(jnp.float32)),
                self.config.physics,
                steps=self.refine_steps,
                asm_backend=self._asm_backend,
            )
            out = dict(out, amp_foc=refined["amp"], ph_foc=refined["phase"])
        return {k: np.asarray(jax.device_get(out[k])) for k in _RESULT_KEYS if k in out}

    def retrieve(self, holo: np.ndarray) -> Dict[str, np.ndarray]:
        """Run retrieval on (B, 1, H, W) intensity holograms, any B >= 1.

        Chunks/pads to the compiled batch size; returns host numpy arrays
        trimmed back to the request's B.
        """
        from style_transfer_based_holographic_imaging_tpu.pipelines.export_artifact import (
            run_chunked,
        )

        with self._lock:
            out = run_chunked(
                holo, self.batch_size, self.image_size, self._run_one
            )
            self.n_served += next(iter(out.values())).shape[0]
        return out

    def health(self) -> Dict:
        return {
            "status": "ok",
            "device": str(self._jax.devices()[0]),
            "batch_size": self.batch_size,
            "image_size": self.image_size,
            "width": self.config.model.width,
            "quantized": self.quantized,
            "refine_steps": self.refine_steps,
            "n_devices": (
                1
                if self.mesh is None
                else int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            ),
            "n_served": self.n_served,
        }


def _make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path in ("/healthz", "/health", "/"):
                self._send_json(200, service.health())
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/retrieve":
                self._send_json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                with np.load(io.BytesIO(self.rfile.read(length))) as z:
                    if "holo" not in z:
                        raise ValueError("npz must contain a 'holo' array")
                    holo = z["holo"]
            except Exception as e:  # noqa: BLE001 — malformed request
                self._send_json(400, {"error": str(e)})
                return
            try:
                out = service.retrieve(holo)
            except ValueError as e:  # bad shapes etc. — client's fault
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — server-side failure
                self._send_json(500, {"error": str(e)})
                return
            buf = io.BytesIO()
            np.savez_compressed(buf, **out)
            self._send(200, buf.getvalue(), "application/octet-stream")

    return Handler


def retrieve_remote(
    url: str, holo: np.ndarray, timeout: float = 120.0
) -> Dict[str, np.ndarray]:
    """Client helper: POST (B, 1, H, W) intensity holograms to a running
    `cli serve` daemon and return its arrays. Stdlib-only."""
    import urllib.request

    buf = io.BytesIO()
    np.savez_compressed(buf, holo=np.asarray(holo, np.float32))
    req = urllib.request.Request(
        url.rstrip("/") + "/retrieve", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return dict(np.load(io.BytesIO(r.read())))


def serve_forever(
    service: RetrievalService, host: str = "127.0.0.1", port: int = 8100
) -> ThreadingHTTPServer:
    """Start the HTTP server (blocking). Returns only on shutdown()."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    httpd.serve_forever()
    return httpd
