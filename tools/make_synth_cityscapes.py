"""Procedural cityscapes-format dataset (zero-egress stand-in for GauGAN).

Generates the gtFine/leftImg8bit tree the SPADE stack consumes
(cat_tpu/data/cityscapes.py): label maps of axis-aligned "sky / ground /
building / object" regions, instance maps with per-object ids (so the
edge channel is non-trivial), and photos rendered from the labels with a
fixed per-class palette plus texture — a learnable semantics->photo
mapping, so FID trajectories during GauGAN training are meaningful.

Layout:
  <out>/gtFine/<phase>/synth/*_gtFine_labelIds.png, *_gtFine_instanceIds.png
  <out>/leftImg8bit/<phase>/synth/*_leftImg8bit.png

Usage: python tools/make_synth_cityscapes.py --out /path [--n 200]
       [--n_val 32] [--height 128] [--width 256] [--classes 8]
"""

import argparse
import os

import numpy as np
from PIL import Image


def _scene(rng, h, w, n_classes):
    """(label, instance) int maps: horizon split + random rectangles."""
    label = np.zeros((h, w), np.uint8)
    inst = np.zeros((h, w), np.int32)
    horizon = int(h * rng.uniform(0.3, 0.6))
    label[horizon:] = 1  # ground below the horizon; sky = 0
    next_id = 2
    for _ in range(rng.randint(3, 8)):
        cls = rng.randint(2, n_classes)
        bw = rng.randint(w // 10, w // 3)
        bh = rng.randint(h // 8, h // 2)
        x = rng.randint(0, w - bw)
        y = rng.randint(max(0, horizon - bh // 2), h - bh)
        label[y:y + bh, x:x + bw] = cls
        inst[y:y + bh, x:x + bw] = next_id
        next_id += 1
    return label, inst


def _render(rng, label, palette):
    """Photo from labels: palette colour + low-frequency texture + noise."""
    h, w = label.shape
    img = palette[label].astype(np.float64)
    g = rng.normal(0, 1, (max(h // 16, 1), max(w // 16, 1), 3))
    ys = np.linspace(0, g.shape[0] - 1, h).astype(int)
    xs = np.linspace(0, g.shape[1] - 1, w).astype(int)
    img += 14.0 * g[ys][:, xs]
    img += rng.normal(0, 4.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--n_val", type=int, default=32)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    palette = rng.randint(30, 225, (args.classes, 3))
    for phase, count in (("train", args.n), ("val", args.n_val)):
        lab_dir = os.path.join(args.out, "gtFine", phase, "synth")
        img_dir = os.path.join(args.out, "leftImg8bit", phase, "synth")
        os.makedirs(lab_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)
        for i in range(count):
            label, inst = _scene(rng, args.height, args.width, args.classes)
            photo = _render(rng, label, palette)
            base = f"synth_{i:06d}_000019"
            Image.fromarray(label).save(
                os.path.join(lab_dir, f"{base}_gtFine_labelIds.png"))
            Image.fromarray(inst.astype(np.int32), mode="I").save(
                os.path.join(lab_dir, f"{base}_gtFine_instanceIds.png"))
            Image.fromarray(photo).save(
                os.path.join(img_dir, f"{base}_leftImg8bit.png"))
    print(f"wrote {args.n} train + {args.n_val} val cityscapes-format scenes "
          f"({args.height}x{args.width}, {args.classes} classes) to {args.out}")


if __name__ == "__main__":
    main()
