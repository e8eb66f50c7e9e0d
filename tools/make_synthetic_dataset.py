"""Deterministic synthetic segmentation corpus (shapes-on-texture).

Stands in for the polyp datasets (Kvasir-SEG layout: image dir + binary
mask dir with stem-matched PNGs, reference datasets/finetune_dataset.py:
150-172) on hosts with no medical data, so the quality gate — CP2
pretrain → finetune → test Dice (BASELINE.json north star) — can run end
to end through the real CLIs.

Design goals:
* fully deterministic (per-index seeds) — two hosts generate bit-equal
  corpora;
* not color-separable: foreground blobs reuse the background palette with
  a different spatial frequency and a small offset, so a useful model
  must learn texture/shape, leaving headroom for pretraining to matter;
* polyp-ish geometry: 1-3 smooth star-convex blobs (Fourier-perturbed
  ellipses) per image.

Layout: ``<root>/images/{train,val,test}_<i>.png`` +
``<root>/masks/...`` — stems carry the split so both the FILENAME
pretrain discovery and the FILENAME finetune split see the same
partition.

Usage: ``python tools/make_synthetic_dataset.py --out /tmp/syn --size 160
--n_train 400 --n_val 60 --n_test 80``
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _smooth_noise(rng: np.random.RandomState, size: int, grid: int,
                  channels: int = 3) -> np.ndarray:
    """Low-frequency texture: coarse random grid bilinearly upsampled."""
    coarse = rng.rand(grid, grid, channels).astype(np.float32)
    img = Image.fromarray((coarse * 255).astype(np.uint8))
    return np.asarray(
        img.resize((size, size), Image.BILINEAR), dtype=np.float32
    ) / 255.0


def _blob_mask(rng: np.random.RandomState, size: int) -> np.ndarray:
    """One star-convex blob: ellipse radius modulated by a few Fourier
    harmonics (smooth, polyp-like outline)."""
    cy, cx = rng.uniform(0.25, 0.75, 2) * size
    r0 = rng.uniform(0.10, 0.22) * size
    aspect = rng.uniform(0.6, 1.4)
    theta0 = rng.uniform(0, 2 * np.pi)
    n_harm = 3
    amps = rng.uniform(0.0, 0.18, n_harm)
    phases = rng.uniform(0, 2 * np.pi, n_harm)

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    dy, dx = yy - cy, xx - cx
    # rotate into the ellipse frame
    ry = dy * np.cos(theta0) - dx * np.sin(theta0)
    rx = dy * np.sin(theta0) + dx * np.cos(theta0)
    ang = np.arctan2(ry, rx * aspect)
    rad = np.sqrt((rx * aspect) ** 2 + ry**2)
    r_theta = r0 * (1.0 + sum(
        a * np.sin((k + 2) * ang + p)
        for k, (a, p) in enumerate(zip(amps, phases))
    ))
    return rad <= r_theta


def make_sample(seed: int, size: int) -> tuple:
    rng = np.random.RandomState(seed)
    bg = _smooth_noise(rng, size, grid=rng.randint(4, 8))
    # fine-grained background detail
    bg = np.clip(bg + rng.randn(size, size, 3).astype(np.float32) * 0.04,
                 0, 1)

    mask = np.zeros((size, size), bool)
    n_blobs = rng.randint(1, 4)
    fg = np.zeros_like(bg)
    for _ in range(n_blobs):
        m = _blob_mask(rng, size)
        # foreground texture: same palette family, higher frequency,
        # small brightness offset — learnable but not a color threshold
        tex = _smooth_noise(rng, size, grid=rng.randint(12, 24))
        tex = np.clip(
            0.65 * tex + 0.35 * bg + rng.uniform(-0.12, 0.12, 3), 0, 1
        )
        fg = np.where(m[..., None], tex, fg)
        mask |= m

    img = np.where(mask[..., None], fg, bg)
    img = np.clip(img + rng.randn(size, size, 3).astype(np.float32) * 0.02,
                  0, 1)
    return (img * 255).astype(np.uint8), mask.astype(np.uint8) * 255


def generate(out: str, size: int, counts: dict, seed: int = 0) -> None:
    img_dir = os.path.join(out, "images")
    mask_dir = os.path.join(out, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    offsets = {"train": 0, "val": 1_000_000, "test": 2_000_000}
    for split, n in counts.items():
        for i in range(n):
            img, mask = make_sample(seed + offsets[split] + i, size)
            stem = f"{split}_{i:04d}.png"
            Image.fromarray(img).save(os.path.join(img_dir, stem))
            Image.fromarray(mask).save(os.path.join(mask_dir, stem))


def generate_unlabeled(out: str, size: int, n: int, seed: int = 0) -> str:
    """Pretrain-only pool: images WITHOUT masks, in a sibling dir.

    Mirrors the reference's pretraining regime — a large unlabeled pool
    disjoint from the labeled finetune set (reference pretrains on the
    full Kvasir/CVC image pools, datasets/pretrain_dataset.py, while the
    finetune split subsamples the labeled set).  Stems carry ``train`` so
    FILENAME pretrain discovery picks them up; the directory is outside
    ``images/`` so the finetune CLIs never see them.
    """
    un_dir = os.path.join(out, "unlabeled")
    os.makedirs(un_dir, exist_ok=True)
    for i in range(n):
        img, _ = make_sample(seed + 3_000_000 + i, size)
        Image.fromarray(img).save(
            os.path.join(un_dir, f"train_u{i:05d}.png")
        )
    return un_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--n_val", type=int, default=60)
    p.add_argument("--n_test", type=int, default=80)
    p.add_argument("--n_unlabeled", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    generate(
        args.out, args.size,
        {"train": args.n_train, "val": args.n_val, "test": args.n_test},
        args.seed,
    )
    if args.n_unlabeled:
        generate_unlabeled(args.out, args.size, args.n_unlabeled, args.seed)
    print(f"wrote {args.n_train}+{args.n_val}+{args.n_test}"
          f"+{args.n_unlabeled}u "
          f"{args.size}x{args.size} samples to {args.out}")


if __name__ == "__main__":
    main()
