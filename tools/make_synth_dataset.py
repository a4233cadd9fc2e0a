"""Procedural unaligned image-translation dataset (zero-egress stand-in).

The environment has no network access, so the reference's horse2zebra
download scripts cannot run.  This generates a structurally similar
unaligned task for exercising the FULL pipeline end to end (teacher train ->
real-stat -> shrink -> distill -> evaluate -> export) with a non-trivial
translation: domain A contains smooth colour-gradient blobs on textured
backgrounds; domain B contains the same kind of scenes where every blob is
striped.  The A->B translation ("add stripes") is learnable by a small
generator yet not an identity map, so FID trajectories are meaningful.

Layout matches the reference datasets/ contract (unaligned mode):
  <out>/trainA, trainB, valA, valB

Usage: python tools/make_synth_dataset.py --out /path [--n 400] [--size 256]
"""

import argparse
import os

import numpy as np


def _texture(rng, size, base):
    """Low-frequency textured background around a base colour."""
    g = rng.normal(0, 1, (size // 16, size // 16, 3))
    # bilinear upsample to full size (np only)
    idx = np.linspace(0, g.shape[0] - 1, size)
    x0 = np.floor(idx).astype(int)
    x1 = np.minimum(x0 + 1, g.shape[0] - 1)
    f = idx - x0
    rows = g[x0] * (1 - f[:, None, None]) + g[x1] * f[:, None, None]
    cols = rows[:, x0] * (1 - f[None, :, None]) + rows[:, x1] * f[None, :, None]
    img = base[None, None] + 18.0 * cols
    return img


def _scene(rng, size, striped):
    base = rng.uniform(60, 180, 3)
    img = _texture(rng, size, base)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(rng.integers(2, 5)):
        cx, cy = rng.uniform(0.2, 0.8, 2) * size
        ax, ay = rng.uniform(0.08, 0.22, 2) * size
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        u = ((xx - cx) * ct + (yy - cy) * st) / ax
        v = (-(xx - cx) * st + (yy - cy) * ct) / ay
        mask = (u * u + v * v) < 1.0
        colour = rng.uniform(40, 215, 3)
        fill = np.broadcast_to(colour, (size, size, 3)).copy()
        # period drawn unconditionally so the plain/striped renders of one
        # seed consume identical RNG streams (paired mode)
        period = rng.uniform(6, 14)
        if striped:
            stripes = (np.sin(2 * np.pi * u * ax / period) > 0).astype(np.float32)
            dark = colour * 0.25
            fill = stripes[..., None] * colour + (1 - stripes[..., None]) * dark
        img = np.where(mask[..., None], fill, img)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_split(out, name, n, size, striped, seed):
    os.makedirs(os.path.join(out, name), exist_ok=True)
    from PIL import Image

    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = _scene(rng, size, striped)
        Image.fromarray(arr).save(os.path.join(out, name, f"{name}_{i:05d}.png"))


def write_pairs(out, name, n, size, seed):
    """Aligned (pix2pix) format: A|B side-by-side composites in <name>/,
    plus the raw B halves in <name>B/ (FID real statistics)."""
    from PIL import Image

    os.makedirs(os.path.join(out, name), exist_ok=True)
    os.makedirs(os.path.join(out, name + "B"), exist_ok=True)
    for i in range(n):
        a = _scene(np.random.default_rng(seed * 1009 + i), size, False)
        b = _scene(np.random.default_rng(seed * 1009 + i), size, True)
        Image.fromarray(np.concatenate([a, b], axis=1)).save(
            os.path.join(out, name, f"{name}_{i:05d}.png"))
        Image.fromarray(b).save(os.path.join(out, name + "B", f"{name}_{i:05d}.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--n_val", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--paired", action="store_true",
                    help="aligned pix2pix format (train/, val/ AB composites "
                         "with identical geometry per pair) instead of the "
                         "unaligned trainA/trainB split")
    args = ap.parse_args()
    if args.paired:
        write_pairs(args.out, "train", args.n, args.size, args.seed)
        write_pairs(args.out, "val", args.n_val, args.size, args.seed + 1)
        print(f"wrote {args.n} train + {args.n_val} val AB pairs at "
              f"{args.size}px to {args.out}")
        return
    write_split(args.out, "trainA", args.n, args.size, False, args.seed)
    write_split(args.out, "trainB", args.n, args.size, True, args.seed + 1)
    write_split(args.out, "valA", args.n_val, args.size, False, args.seed + 2)
    write_split(args.out, "valB", args.n_val, args.size, True, args.seed + 3)
    print(f"wrote {args.n}x trainA/B + {args.n_val}x valA/B at {args.size}px to {args.out}")


if __name__ == "__main__":
    main()
