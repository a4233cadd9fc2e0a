#!/usr/bin/env python
"""Join two aligned image folders side-by-side into pix2pix AB images
(reference datasets/combine_A_and_B.py)."""

import argparse
import os

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fold_A", required=True)
    parser.add_argument("--fold_B", required=True)
    parser.add_argument("--fold_AB", required=True)
    args = parser.parse_args()

    for phase in sorted(os.listdir(args.fold_A)):
        dir_a = os.path.join(args.fold_A, phase)
        dir_b = os.path.join(args.fold_B, phase)
        if not os.path.isdir(dir_a):
            continue
        dir_ab = os.path.join(args.fold_AB, phase)
        os.makedirs(dir_ab, exist_ok=True)
        names = sorted(os.listdir(dir_a))
        for name in names:
            pa, pb = os.path.join(dir_a, name), os.path.join(dir_b, name)
            if not os.path.exists(pb):
                continue
            a = np.asarray(Image.open(pa).convert("RGB"))
            b = np.asarray(Image.open(pb).convert("RGB"))
            ab = np.concatenate([a, b], axis=1)
            Image.fromarray(ab).save(os.path.join(dir_ab, name))
        print(f"{phase}: combined {len(names)} pairs")


if __name__ == "__main__":
    main()
