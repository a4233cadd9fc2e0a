#!/usr/bin/env python
"""Prepare the pix2pix-style cityscapes dataset + evaluation table.

Reference: datasets/prepare_cityscapes_dataset.py — for each split, pair the
gtFine color label render with the leftImg8bit photo, resize both to
256x256, save them side-by-side (A = color labels, B = photo), and write
datasets/table.txt mapping sample name -> (label path, photo path) for the
mIoU judge.
"""

import argparse
import glob
import os

from PIL import Image


def load_resized(path, size=(256, 256)):
    return Image.open(path).convert("RGB").resize(size, Image.BICUBIC)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gtFine_dir", required=True)
    parser.add_argument("--leftImg8bit_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--table_path", default="datasets/table.txt")
    args = parser.parse_args()

    table_lines = []
    for phase, out_phase in (("train", "train"), ("val", "val")):
        color_paths = sorted(
            glob.glob(os.path.join(args.gtFine_dir, phase, "*", "*_color.png"))
        )
        photo_paths = sorted(
            glob.glob(os.path.join(args.leftImg8bit_dir, phase, "*", "*_leftImg8bit.png"))
        )
        assert len(color_paths) == len(photo_paths), (
            f"{phase}: {len(color_paths)} labels vs {len(photo_paths)} photos"
        )
        out_dir = os.path.join(args.output_dir, out_phase)
        os.makedirs(out_dir, exist_ok=True)
        for i, (cp, pp) in enumerate(zip(color_paths, photo_paths)):
            a = load_resized(cp)
            b = load_resized(pp)
            ab = Image.new("RGB", (512, 256))
            ab.paste(a, (0, 0))
            ab.paste(b, (256, 0))
            name = f"{i + 1}"
            ab.save(os.path.join(out_dir, f"{name}.jpg"))
            if phase == "val":
                label_path = cp.replace("_color.png", "_labelIds.png")
                table_lines.append(f"{name} {label_path} {pp}")
        print(f"{phase}: wrote {len(color_paths)} AB pairs to {out_dir}")

    os.makedirs(os.path.dirname(args.table_path) or ".", exist_ok=True)
    with open(args.table_path, "w") as f:
        f.write("\n".join(table_lines) + "\n")
    print(f"wrote evaluation table ({len(table_lines)} rows) to {args.table_path}")


if __name__ == "__main__":
    main()
