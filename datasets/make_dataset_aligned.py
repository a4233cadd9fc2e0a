#!/usr/bin/env python
"""Combine unaligned A/B folders into pix2pix-style side-by-side images.

Takes a CycleGAN-layout dataset (trainA/trainB/testA/testB with pairwise
matching files) and writes train/ and test/ folders where each image is the
A|B pair pasted horizontally — the format AlignedDataset consumes.

Reference: datasets/make_dataset_aligned.py (same CLI contract).
"""

import argparse
import os

from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(folder):
    """Sorted image files directly inside ``folder`` (no recursion)."""
    if not os.path.isdir(folder):
        return []
    return [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.lower().endswith(IMG_EXTS)
    ]


def align_pairs(a_paths, b_paths, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for i, (pa, pb) in enumerate(zip(a_paths, b_paths)):
        a = Image.open(pa).convert("RGB")
        b = Image.open(pb).convert("RGB")
        if a.size != b.size:
            raise SystemExit(f"size mismatch: {pa} {a.size} vs {pb} {b.size}")
        pair = Image.new("RGB", (a.size[0] * 2, a.size[1]))
        pair.paste(a, (0, 0))
        pair.paste(b, (a.size[0], 0))
        pair.save(os.path.join(out_dir, f"{i:04d}.jpg"))
    print(f"wrote {min(len(a_paths), len(b_paths))} pairs to {out_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dataset-path", dest="dataset_path", required=True,
        help="folder with trainA/trainB/testA/testB subfolders",
    )
    args = parser.parse_args()
    root = args.dataset_path
    for split in ("test", "train"):
        a = list_images(os.path.join(root, split + "A"))
        b = list_images(os.path.join(root, split + "B"))
        if len(a) != len(b):
            raise SystemExit(f"{split}: {len(a)} A images vs {len(b)} B images")
        if a:
            align_pairs(a, b, os.path.join(root, split))


if __name__ == "__main__":
    main()
