"""Build a large offline digit bank for the bank-diversity lever.

The reference trains on the full torchvision MNIST train split — tens of
thousands of distinct digits (utils/Data_loader.py:14-15) — while this
repo's default mixed bank has 1,847 distinct base shapes (sklearn 1,797 +
50 golden-train digits). This tool expands both sources with affine /
strong-elastic / stroke-thickness morphs (data/synth.morphed_digit_bank)
into an ``--n``-shape bank, preserving the mixed bank's ~50% golden-train
share, and writes a uint8 ``.npz`` consumable by
``mint_checkpoint.py --digit-bank`` / ``cli train --digit-bank``.

Only TRAIN-split golden digits (0..49) are used — the held-out half of the
golden suite stays unseen, so HELDOUT metrics stay uncontaminated.

Usage:
    python scripts/make_big_bank.py --n 20000 --out banks/big_bank_20k.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000, help="total bank size")
    ap.add_argument("--golden-frac", type=float, default=0.5,
                    help="share of the bank derived from golden-train digits")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="banks/big_bank_20k.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.data.goldens import (
        load_golden_suite,
    )
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        GOLDEN_TRAIN_DIGITS,
        golden_digit_bank,
        morphed_digit_bank,
        sklearn_digit_bank,
    )

    n_golden = int(round(args.n * args.golden_frac))
    n_sklearn = args.n - n_golden

    golden = golden_digit_bank(load_golden_suite(), subset=GOLDEN_TRAIN_DIGITS)
    sk = sklearn_digit_bank()
    print(f"base shapes: sklearn {len(sk)}, golden-train {len(golden)}")

    big_golden = morphed_digit_bank(golden, n_golden, seed=args.seed)
    big_sklearn = morphed_digit_bank(sk, n_sklearn, seed=args.seed + 1)
    bank = np.concatenate([big_golden, big_sklearn], axis=0)
    rng = np.random.default_rng(args.seed)
    rng.shuffle(bank, axis=0)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # uint8 keeps the 20k-shape bank ~80 MB; load_digit_bank rescales /255.
    np.savez_compressed(args.out, bank=np.round(bank * 255.0).astype(np.uint8))
    print(
        f"wrote {args.out}: {bank.shape[0]} digits "
        f"({n_golden} golden-derived, {n_sklearn} sklearn-derived), "
        f"{os.path.getsize(args.out) / 1e6:.1f} MB"
    )


if __name__ == "__main__":
    main()
