"""DFT-matmul precision trade for the Pallas ASM kernel (dev tool).

Measures, at 'highest' (fp32 = 6-pass bf16) vs 'high' (3-pass bf16):
* propagate parity vs the fp32 XLA fft2 path (max rel err),
* golden physics parity (synthesized holograms vs the bundled recorded
  intensities, PSNR),
* isolated refocus time and full int8 e2e throughput.

Usage: python scripts/exp_asm_precision.py [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    red = lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32))
    out = fn(*args)
    float(jax.device_get(red(out)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = red(fn(*args))
            acc = s if acc is None else acc + s
        float(jax.device_get(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.ops import asm, holo_forward
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    b = args.batch
    rng = np.random.default_rng(0)
    physics = PhysicsConfig()
    print(f"devices: {jax.devices()}  batch={b}", flush=True)

    # All comparisons stay on-device (axon cannot fetch large/complex
    # arrays); only scalar metrics are transferred.
    # Complex arrays are formed ON DEVICE from two fp32 planes: a
    # host->device transfer of a complex64 array wedges the axon transport
    # (every later fetch fails UNIMPLEMENTED — measured 2026-08-18).
    field = jax.jit(jax.lax.complex)(
        jnp.asarray(rng.random((b, 1, 128, 128), np.float32)),
        jnp.asarray(rng.random((b, 1, 128, 128), np.float32)),
    )
    d = jnp.full((b, 1, 1, 1), 4e-4, jnp.float32)
    kw = dict(wavelength=physics.wavelength, pixel_size=physics.pixel_size)

    g = load_golden_suite()
    amp = jnp.asarray(g.gt_amplitude[0])
    ph = jnp.asarray(g.gt_phase[0])
    dc = jnp.asarray(g.distance_content[0])
    recorded = jnp.asarray(g.content_holo[0])

    variables = init_net_params(jax.random.key(0))
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
    ds = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)
    content = jnp.transpose(jnp.sqrt(holo), (0, 2, 3, 1))
    scales = calibrate_scales(variables, [content], sm, ss)
    asm.set_asm_backend("pallas")

    for prec in ("highest", "high", "bf16"):
        asm_pallas.set_dft_precision(prec)
        prop = jax.jit(
            lambda f, dd: asm_pallas.propagate_pallas(f, dd, **kw)
        )

        def _rel(f, dd):
            a = asm_pallas.propagate_pallas(f, dd, **kw)
            r = asm._propagate_xla(f, dd, **kw)
            return jnp.max(jnp.abs(a - r)) / jnp.max(jnp.abs(r))

        rel = float(jax.device_get(jax.jit(_rel)(field, d)))

        def _golden_psnr(a, p, dd, rec):
            synth = holo_forward(a, p, dd, physics)
            mse = jnp.mean((synth - rec) ** 2)
            return 10.0 * jnp.log10(jnp.max(rec) ** 2 / mse)

        psnr = float(jax.device_get(jax.jit(_golden_psnr)(amp, ph, dc, recorded)))

        t_prop = timeit(prop, field, d)
        fn = make_retrieval_fn(physics, dtype=jnp.bfloat16, quant_scales=scales)
        t_e2e = timeit(fn, variables, holo, sm, ss, ds)
        print(
            f"{prec:>8}: rel-err vs xla {rel:.2e} | golden synth {psnr:6.1f} dB"
            f" | propagate {t_prop:6.2f} ms | e2e {t_e2e:6.2f} ms"
            f" ({b/t_e2e*1e3:7.0f} holo/s)",
            flush=True,
        )
    # --- unwrap DCT precision (ops.unwrap.set_dct_precision) ---------------
    # Congruent unwrap snaps to exact 2*pi multiples of the input, so "high"
    # should agree bit-for-bit unless a rounding boundary flips; measure the
    # disagreement fraction and the e2e time with both knobs at "high".
    from style_transfer_based_holographic_imaging_tpu.ops import unwrap

    yy = jnp.linspace(-1.0, 1.0, 128)
    smooth = 9.0 * jnp.exp(-(yy[:, None] ** 2 + yy[None, :] ** 2) * 3.0)
    smooth = smooth[None, None] * jnp.asarray(
        rng.random((b, 1, 1, 1), np.float32) + 0.5
    )
    wrapped = unwrap.wrap_phase(smooth)

    unwrap.set_dct_precision("highest")
    ref_u = jax.jit(unwrap.unwrap_phase)(wrapped)
    unwrap.set_dct_precision("high")
    hi_u = jax.jit(unwrap.unwrap_phase)(wrapped)
    frac = float(jax.device_get(jnp.mean((jnp.abs(ref_u - hi_u) > 1e-3).astype(jnp.float32))))
    asm_pallas.set_dft_precision("high")
    fn = make_retrieval_fn(physics, dtype=jnp.bfloat16, quant_scales=scales)
    t_both = timeit(fn, variables, holo, sm, ss, ds)
    print(
        f"dct=high: unwrap disagree frac {frac:.2e} | e2e asm+dct high "
        f"{t_both:6.2f} ms ({b/t_both*1e3:7.0f} holo/s)",
        flush=True,
    )

    unwrap.set_dct_precision("highest")
    asm_pallas.set_dft_precision("highest")
    asm.set_asm_backend("xla")


if __name__ == "__main__":
    main()
