#!/usr/bin/env python
"""Convert cityscapes labelIds maps to 19-class trainIds maps for mIoU
(reference datasets/get_trainIds.py).  Void classes map to 255."""

import argparse
import glob
import os

import numpy as np
from PIL import Image

# cityscapes id -> trainId (the standard mapping; 255 = ignore)
ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def convert(label: np.ndarray) -> np.ndarray:
    out = np.full_like(label, 255)
    for lid, tid in ID_TO_TRAINID.items():
        out[label == lid] = tid
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gtFine_dir", required=True)
    parser.add_argument("--output_dir", default=None,
                        help="defaults to writing *_trainIds.png next to inputs")
    args = parser.parse_args()

    paths = sorted(glob.glob(os.path.join(args.gtFine_dir, "**", "*_labelIds.png"),
                             recursive=True))
    for p in paths:
        label = np.asarray(Image.open(p))
        train_ids = convert(label)
        out = p.replace("_labelIds.png", "_trainIds.png")
        if args.output_dir:
            out = os.path.join(args.output_dir, os.path.basename(out))
            os.makedirs(args.output_dir, exist_ok=True)
        Image.fromarray(train_ids.astype(np.uint8)).save(out)
    print(f"converted {len(paths)} label maps")


if __name__ == "__main__":
    main()
