"""Generate the committed measured-.mat-tree fixture (RBC layout).

The environment has no real interferograms (the reference's .mat datasets are
not in its snapshot), so the measured-data code path is demonstrated on a
small PHYSICALLY CONSISTENT tree: biconcave-disc phase objects from
``data.synth.rbc_bank`` propagated with the real ASM physics
(``ops.holo_forward``) at the RBC domain distances, written in the exact
reference Holo_loader layout (utils/Data_loader.py:104-139 train split,
:143-179 test split with gt_amplitude/gt_phase .mat files) — so
`cli train --mat-root` -> `cli extract-style --mat-root` -> `cli eval
--mat-root` runs the full reference workflow end to end
(tests/test_mat_e2e.py).

Deterministic: re-running reproduces the committed tree bit-for-bit.

    python scripts/make_mat_fixture.py --out tests/fixtures/rbc_mat_tree
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 4242          # disjoint from training (0), eval (7919), calib (1234)
TRAIN_DISTANCES = (4.0, 5.0, 6.0, 7.0, 8.0)   # mm, the RBC preset's content set
TEST_DISTANCES = (4.0, 6.0, 8.0)
N_TRAIN_PER_D = 3
N_TEST_OBJECTS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/rbc_mat_tree")
    ap.add_argument("--size", type=int, default=128,
                    help="frame side (>= any eval/train patch size)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.io as sio

    from style_transfer_based_holographic_imaging_tpu.config import DOMAIN_PRESETS
    from style_transfer_based_holographic_imaging_tpu.data.synth import rbc_bank
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

    cfg = DOMAIN_PRESETS["red_blood_cell"]()
    physics = cfg.physics
    size = args.size
    root = os.path.join(args.out, "red_blood_cell")  # basename selects the layout

    bank = rbc_bank(n=N_TRAIN_PER_D * len(TRAIN_DISTANCES) + N_TEST_OBJECTS,
                    seed=SEED)
    tile = bank.shape[-1]
    pad = (size - tile) // 2

    def place(obj):
        """Center the phase tile on the frame canvas."""
        return np.pad(obj, ((pad, size - tile - pad),) * 2)

    amp = jnp.full((1, 1, size, size), cfg.data.amplitude, jnp.float32)

    def intensity(phase, d_mm):
        d_net = float(physics.to_network_units(float(d_mm)))
        holo = holo_forward(amp, jnp.asarray(phase)[None, None], d_net, physics)
        return np.asarray(jax.device_get(holo))[0, 0].astype(np.float32)

    def save(path, key, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        sio.savemat(path, {key: arr}, do_compression=True)

    # Train split: N frames per distance, each its own object.
    k = 0
    for d in TRAIN_DISTANCES:
        for j in range(N_TRAIN_PER_D):
            ph = place(bank[k]); k += 1
            save(
                os.path.join(root, "train", "holography", "%1.1f" % d,
                             f"h{j}.mat"),
                "holography",
                intensity(ph, d),
            )

    # Test split: one object per j, its hologram recorded at EVERY test
    # distance (reference RBC layout: holography{j}.mat per distance dir
    # shares the j-th GT pair).
    for j in range(1, N_TEST_OBJECTS + 1):
        ph = place(bank[k]); k += 1
        save(os.path.join(root, "test", "gt_amplitude", f"holography{j}.mat"),
             "gt_amplitude", np.full((size, size), cfg.data.amplitude, np.float32))
        save(os.path.join(root, "test", "gt_phase", f"holography{j}.mat"),
             "gt_phase", ph.astype(np.float32))
        for d in TEST_DISTANCES:
            save(
                os.path.join(root, "test", "holography", "%1.1f" % d,
                             f"holography{j}.mat"),
                "holography",
                intensity(ph, d),
            )

    n_files = sum(len(fs) for _, _, fs in os.walk(root))
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
    )
    print(f"fixture tree: {root} — {n_files} files, {total / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
