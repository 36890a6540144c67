"""Measure grouped-grid variants of the Pallas ASM kernel.

The shipped kernel runs ONE image per grid step: ~8 us of MXU (DFT matmuls)
plus ~8 us of VPU (cos/sin of the transfer phase, complex elementwise) that
appear to serialize — propagate measures ~4.0 ms at b=256 vs a ~2.1 ms MXU
roofline. Processing G images per step (unrolled in-kernel loop) gives
Mosaic's scheduler independent VPU/MXU instruction streams to interleave.

Times propagate-only at b=2048 (large enough to dwarf the ~2 ms remote
dispatch floor) for G in {1, 2, 4, 8}, plus the XLA fft2 path for reference.
Parity is asserted on-device against the XLA path before timing.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--groups", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas
    from style_transfer_based_holographic_imaging_tpu.ops import asm

    physics = PhysicsConfig()
    kw = dict(wavelength=physics.wavelength, pixel_size=physics.pixel_size)
    rng = np.random.default_rng(0)
    b = args.batch
    # Complex arrays must be formed ON DEVICE (a host->device complex64
    # transfer wedges the axon transport).
    field = jax.jit(jax.lax.complex)(
        jnp.asarray(rng.random((b, 1, 128, 128), np.float32)),
        jnp.asarray(rng.random((b, 1, 128, 128), np.float32)),
    )
    d = jnp.asarray(rng.uniform(2e-4, 9e-4, (b, 1, 1, 1)).astype(np.float32))

    ref = jax.jit(lambda f, dd: asm._propagate_xla(f, dd, **kw))(field, d)
    ref_mag = float(jax.device_get(jnp.max(jnp.abs(ref))))

    def timeit(fn, label):
        out = fn(field, d)
        rel = float(
            jax.device_get(jnp.max(jnp.abs(out - ref))) / ref_mag
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                out = fn(field, d)
                s = jnp.sum(jnp.abs(out[0, 0, :2, :2]))
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{label}: {best*1e3:.2f} ms/propagate (rel-err {rel:.1e})",
              flush=True)
        return best

    timeit(jax.jit(lambda f, dd: asm._propagate_xla(f, dd, **kw)), "xla fft2")
    for g in args.groups:
        if b % g:
            continue
        asm_pallas.set_group_size(g)
        fn = jax.jit(lambda f, dd: asm_pallas.propagate_pallas(f, dd, **kw))
        try:
            timeit(fn, f"pallas G={g}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas G={g} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    asm_pallas.set_group_size(1)


if __name__ == "__main__":
    main()
