#!/usr/bin/env python
"""Standalone KID CLI (reference metric/kid_score.py): polynomial-kernel MMD
between two image directories, mean +/- std over 100 subsets of 100."""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_dir(path, size=None):
    from cat_tpu.data.datasets import make_dataset

    ims = []
    for p in make_dataset(path):
        img = Image.open(p).convert("RGB")
        if size:
            img = img.resize(size, Image.BICUBIC)
        ims.append(np.asarray(img, dtype=np.uint8))
    if not ims:
        raise SystemExit(f"no images found in {path!r}")
    return np.stack(ims)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--real", type=str, required=True)
    parser.add_argument("--fake", type=str, required=True)
    parser.add_argument("--inception_path", type=str,
                        default="pt_inception-2015-12-05.pth")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--n_subsets", type=int, default=100)
    parser.add_argument("--subset_size", type=int, default=100)
    parser.add_argument("--ret_var", action="store_true",
                        help="also report the per-subset U-statistic "
                             "variance estimate of MMD^2 (reference "
                             "kid_score.py:205-283; never printed by the "
                             "reference's shipped flows)")
    args = parser.parse_args()

    from cat_tpu.metrics.fid import get_activations
    from cat_tpu.metrics.inception import load_inception
    from cat_tpu.metrics.kid import kid_score

    model, variables = load_inception(args.inception_path)
    real = load_dir(args.real)
    fake = load_dir(args.fake, size=(real.shape[2], real.shape[1]))
    act_r = get_activations(real, model, variables, args.batch_size)
    act_f = get_activations(fake, model, variables, args.batch_size)
    if args.ret_var:
        mean, std, var_ests = kid_score(
            act_f, act_r, args.n_subsets, args.subset_size, ret_var=True)
        print(f"KID: {mean:.6f} +/- {std:.6f} "
              f"(U-stat var estimate: {var_ests.mean():.6g}, "
              f"+/-sqrt: {np.sqrt(max(var_ests.mean(), 0.0)):.6f})")
    else:
        mean, std = kid_score(act_f, act_r, args.n_subsets, args.subset_size)
        print(f"KID: {mean:.6f} +/- {std:.6f}")


if __name__ == "__main__":
    main()
