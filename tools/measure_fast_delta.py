#!/usr/bin/env python3
"""Measure the fast-mode color-harmony score delta (docs/SCORING.md).

Fast mode (processing.fast_color_harmony) computes the H-S joint entropy
from a stride-4 pixel subsample. This script quantifies the score impact:
for a corpus of synthetic images spanning the texture spectrum (smooth
gradients, filtered photographic noise, high-frequency color patterns,
low-saturation scenes, mixtures), it computes the EXACT entropy and the
stride-4 entropy with the same reference formula (numpy bincount — the
device kernels are parity-pinned against this oracle elsewhere) and
reports the distribution of the color-harmony score delta
(score = min(10, entropy * 10 / 15.5), reference analyzers/technical.py:
79-113).

Usage: python tools/measure_fast_delta.py [--n 12] [--h 1024] [--w 1536]
"""

import argparse

import numpy as np


def rgb_to_hs(rgb):
    """cv2-parity H (0..179) / S (0..255) bins, uint8 RGB input."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    diff = mx - mn

    # exact rational rounding: round(a/b) == floor((2a+b)/(2b))
    def rnd(a, d):
        d = np.maximum(d, 1)
        return (2 * a + d) // (2 * d)

    h = np.where(
        mx == mn, 0,
        np.where(mx == r, rnd(30 * (g - b), diff),
                 np.where(mx == g, 60 + rnd(30 * (b - r), diff),
                          120 + rnd(30 * (r - g), diff))))
    h = np.mod(h, 180)
    s = np.where(mx == 0, 0, rnd(255 * diff, mx))
    return h.astype(np.int64), s.astype(np.int64)


def entropy_bits(h, s):
    counts = np.bincount((h * 256 + s).ravel(), minlength=180 * 256)
    tot = counts.sum()
    p = counts[counts > 0] / tot
    return float(-(p * np.log2(p)).sum())


def harmony_score(e):
    return min(10.0, e * 10.0 / 15.5)


def smooth_noise(rng, h, w, scale):
    """Low-pass filtered noise via box blurs (no scipy)."""
    x = rng.random((h, w), np.float64)
    k = max(1, scale)
    for _ in range(3):
        c = np.cumsum(x, axis=0)
        x = (np.vstack([c[k:], np.tile(c[-1], (k, 1))]) -
             np.vstack([np.zeros((k, w)), c[:-k]])) / k
        c = np.cumsum(x, axis=1)
        x = (np.hstack([c[:, k:], np.tile(c[:, -1:], (1, k))]) -
             np.hstack([np.zeros((h, k)), c[:, :-k]])) / k
    x -= x.min()
    return x / max(x.max(), 1e-9)


def corpus(rng, n, h, w):
    imgs = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        kind = i % 6
        if kind == 0:        # smooth two-color gradient (low entropy)
            a = rng.integers(0, 256, 3)
            b = rng.integers(0, 256, 3)
            t = ((xx + yy) / (h + w))[..., None]
            img = (a * (1 - t) + b * t)
        elif kind == 1:      # filtered color noise (photographic texture)
            img = np.stack([smooth_noise(rng, h, w, 9) * 255
                            for _ in range(3)], axis=-1)
        elif kind == 2:      # high-frequency colorful pattern (high entropy)
            img = rng.integers(0, 256, (h, w, 3))
        elif kind == 3:      # low-saturation near-gray scene
            g = smooth_noise(rng, h, w, 17) * 255
            img = np.stack([g, g, g], -1) + rng.normal(0, 6, (h, w, 3))
        elif kind == 4:      # sky + textured foreground mixture
            sky = np.array([135, 160, 220]) + 40 * smooth_noise(
                rng, h, w, 33)[..., None]
            fg = np.stack([smooth_noise(rng, h, w, 5) * 255
                           for _ in range(3)], -1)
            mask = (yy > h * 0.45)[..., None]
            img = np.where(mask, fg, sky)
        else:                # posterized blobs (mid entropy, few hues)
            img = np.zeros((h, w, 3))
            for _ in range(12):
                cx, cy = rng.integers(0, w), rng.integers(0, h)
                rad = rng.integers(40, 300)
                col = rng.integers(0, 256, 3)
                m = (xx - cx) ** 2 + (yy - cy) ** 2 < rad ** 2
                img[m] = col
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=12)
    parser.add_argument("--h", type=int, default=1024)
    parser.add_argument("--w", type=int, default=1536)
    parser.add_argument("--stride", type=int, default=4)
    args = parser.parse_args()
    rng = np.random.default_rng(7)

    rows = []
    for img in corpus(rng, args.n, args.h, args.w):
        hh, ss = rgb_to_hs(img)
        hf, sf = hh.ravel(), ss.ravel()
        e_exact = entropy_bits(hf, sf)
        e_fast = entropy_bits(hf[::args.stride], sf[::args.stride])
        rows.append((e_exact, e_fast,
                     harmony_score(e_exact), harmony_score(e_fast)))
    deltas = np.array([abs(r[3] - r[2]) for r in rows])
    e_deltas = np.array([r[1] - r[0] for r in rows])
    print(f"n={len(rows)} images {args.h}x{args.w}, stride {args.stride}")
    print("kind cycle: gradient, filtered-noise, uniform-noise, near-gray, "
          "sky+texture, posterized")
    for i, (ee, ef, se, sf_) in enumerate(rows):
        print(f"  img{i:02d}  exact {ee:7.4f} bits -> {se:6.4f}   "
              f"fast {ef:7.4f} -> {sf_:6.4f}   score delta {sf_ - se:+.4f}")
    print(f"entropy delta (fast-exact): mean {e_deltas.mean():+.4f} bits, "
          f"range [{e_deltas.min():+.4f}, {e_deltas.max():+.4f}]")
    print(f"|score delta| (0-10 scale): mean {deltas.mean():.4f}  "
          f"p95 {np.percentile(deltas, 95):.4f}  max {deltas.max():.4f}")


if __name__ == "__main__":
    main()
