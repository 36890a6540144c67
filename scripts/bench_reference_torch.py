"""Measure the torch reference's end-to-end inference throughput on this
host's CPU — the measured anchor for bench.py's RTX4090 baseline estimate
(VERDICT r4 #6: make ``vs_baseline`` traceable to a measurement).

Imports the actual reference from /root/reference (read-only; used as a
black box, nothing copied) and times its demo inference path
(test_field_retrieval_mnist.py:123-126): Net.field_retrieval (VGG encode ->
AdaIN -> decode -> distance head) + Holo_Generator ASM refocus. Weights are
random — the snapshot ships none (.MISSING_LARGE_BLOBS) — which changes no
FLOPs. The skimage phase unwrap is EXCLUDED (not installed here), which
only favors the reference: its per-sample host unwrap loop is a pure add-on
cost, while our TPU pipeline's in-graph DCT unwrap is always included.

Also reports the implied effective GFLOP/s against bench.py's ~19.6
GFLOP/image analytic model, which sanity-checks that model: if the implied
rate is a plausible fraction of this core's peak, the per-image FLOP count
(and hence the 40 TFLOP/s -> ~2000 holo/s RTX4090 estimate) is anchored.

Usage:  python scripts/bench_reference_torch.py [--batch 5] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

REF = "/root/reference"
GFLOP_PER_IMAGE = 19.6  # bench.py's analytic model (VGG ~8.9 + decoder ~10.7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5,
                    help="test_data batch size used by the reference demo")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not os.path.isfile(os.path.join(REF, "net.py")):
        sys.exit("reference snapshot not available at /root/reference")

    import numpy as np
    import torch

    sys.path.insert(0, REF)
    import function as _  # noqa: F401 (net.py imports from it)
    import net as ref_net

    sys.path.pop(0)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_asm", os.path.join(REF, "utils", "Angular_Spectrum_Method.py")
    )
    ref_asm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_asm)

    torch.manual_seed(0)
    # The demo's model build (test_field_retrieval_mnist.py:76-93): encoder
    # truncated to relu4_1, amp/phase decoder, distance MLP.
    vgg = torch.nn.Sequential(*list(ref_net.vgg.children())[:31])
    decoder = ref_net.decoder
    distance_g = ref_net.Distance_G()
    net = ref_net.Net(vgg, decoder, decoder_ph=None, distance_g=distance_g).eval()

    b = args.batch
    rng = np.random.default_rng(0)
    content = torch.from_numpy(rng.random((b, 1, 128, 128), np.float32) * 0.8 + 0.03)
    style_vec = torch.from_numpy(rng.random((2, 512, 1, 1), np.float32) + 0.25)
    d_style = 0.2e-3

    def one_pass():
        with torch.no_grad():
            # Net.field_retrieval (net.py:228-260) via the single-style branch
            amp, ph, d_pred = net.field_retrieval(
                content, style_vec, alpha=1.0, unknown_distance=True
            )
            # physics refocus by -d_style (test_field_retrieval_mnist.py:126),
            # distance de-norm done here directly (Forward_model.py:18 does
            # ((d+c)*k)*1e-3; identity normalization in the MNIST demo)
            field = amp * torch.exp(1j * ph)
            out = ref_asm.ASM(
                field, 532e-9, -d_style, 1.5e-6,
                requires_grad=False, zero_padding=True,
            )
            return torch.abs(out), torch.angle(out), d_pred

    one_pass()  # warm-up (allocator, conv algo selection)
    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            one_pass()
        dt = time.perf_counter() - t0
        best = max(best, b * args.iters / dt)

    gflops = best * GFLOP_PER_IMAGE
    print(
        json.dumps(
            {
                "metric": "torch reference end-to-end inference, this host CPU "
                f"(batch {b}, {torch.get_num_threads()} thread(s), no unwrap)",
                "value": round(best, 2),
                "unit": "holograms/sec",
                "implied_gflops": round(gflops, 1),
                "analytic_gflop_per_image": GFLOP_PER_IMAGE,
            }
        )
    )


if __name__ == "__main__":
    main()
