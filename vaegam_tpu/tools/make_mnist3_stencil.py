"""Derive the 13x13 binarized MNIST-'3' stencil per the reference recipe.

The reference's shape != 'simple' control signal (add_control_signal.py:
89-123) is built from the MNIST train set:

  1. iterate the torchvision MNIST train set; among the first 11 samples
     (``i <= 10``) keep images whose label is 0 or 3 — the train set's first
     labels are [5,0,4,1,9,2,1,3,1,4,3], so the kept indices are 1 (a '0'),
     7 (a '3') and 10 (a '3');
  2. take ``imgs[1]`` — MNIST train index 7, the first '3' (:106);
  3. PIL ``resize((13, 13))`` — mode 'L', so PIL's default BICUBIC filter
     (:106);
  4. divide by 255, threshold at mean + 0.85*std (population std, numpy
     default ddof=0) to a 0/1 mask (:109-113).

This environment has no network and no torchvision, so the TRUE digit
pixels cannot be fetched here; the tool therefore accepts the raw 28x28
digit via --raw_digit (a uint8 .npy, e.g. dumped offline with
``np.save(p, np.asarray(datasets.MNIST(root, train=True)[7][0]))``) and
falls back to torchvision when it IS importable.  Steps 3-4 — everything
after the download — run identically either way, so a user with the real
digit bytes regenerates the reference's exact mask with:

  python -m vaegam_tpu.tools.make_mnist3_stencil \
      --raw_digit mnist_train_idx7.npy --out mnist3_stencil.npy

The committed golden (tests/golden/mnist3_binary_stencil.npy) is this
recipe applied to the committed stand-in digit
tests/golden/raw_digit3_28x28.npy; tests/test_utils.py locks the recipe to
it and locks the --stencil_file injection path voxel-for-voxel against an
independent transcription of the reference's placement math (:117-123).
"""

from __future__ import annotations

import argparse

import numpy as np


def binarize_digit(raw_28x28: np.ndarray) -> np.ndarray:
    """Steps 3-4 of the reference recipe (add_control_signal.py:106-113).

    raw_28x28: uint8 grayscale digit as PIL would hand it to np.asarray
    (row-major, 0..255).  Returns the 13x13 int 0/1 mask (pre-rotation —
    the injector applies the -90 deg rotation, :117).
    """
    from PIL import Image

    if raw_28x28.shape != (28, 28):
        raise ValueError(f"expected a 28x28 digit, got {raw_28x28.shape}")
    img = Image.fromarray(np.asarray(raw_28x28, np.uint8), mode="L")
    # PIL resize default filter for mode 'L' is BICUBIC (the reference
    # passes no resample argument, :106)
    three = np.asarray(img.resize((13, 13)))
    norm_three = three / 255
    sig_mean = np.mean(norm_three.flatten())
    sig_std = np.std(norm_three.flatten())  # population (ddof=0), :110
    binary_sig = np.where(
        norm_three.flatten() > (sig_mean + 0.85 * sig_std), 1, 0
    ).reshape(norm_three.shape[0], norm_three.shape[1])
    return binary_sig


def fetch_digit_torchvision() -> np.ndarray:
    """Steps 1-2: MNIST train imgs[1] == train index 7 (needs torchvision
    + network or a local MNIST root)."""
    import torchvision.datasets as datasets

    mnist = datasets.MNIST(root="./data", train=True, download=True,
                           transform=None)
    imgs = []
    for i, sample in enumerate(mnist):
        if i <= 10 and sample[1] in (0, 3):
            imgs.append(sample[0])
    return np.asarray(imgs[1])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--raw_digit", type=str, default="",
                   help="28x28 uint8 .npy of MNIST train index 7 "
                   "(skips the torchvision download)")
    p.add_argument("--out", type=str, required=True,
                   help="output .npy path for the 13x13 0/1 stencil")
    args = p.parse_args(argv)

    if args.raw_digit:
        raw = np.load(args.raw_digit)
    else:
        raw = fetch_digit_torchvision()
    stencil = binarize_digit(raw)
    np.save(args.out, stencil.astype(np.uint8))
    print(f"wrote {args.out}: {int(stencil.sum())}/169 voxels on")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
