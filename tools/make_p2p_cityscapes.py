"""Build a pix2pix-style aligned dataset + mIoU table from synthetic
cityscapes.

Mirrors the reference's datasets/prepare_cityscapes_dataset.py: from a
cityscapes-format tree (tools/make_synth_cityscapes.py) it writes

  <out>/train/*.png, <out>/val/*.png   A|B composites at <size>x<size> per
                                       half (A = photo, B = label render;
                                       the reference squashes aspect the
                                       same way, load_resized_img:20-21)
  <out>/valA/*.png                     photos alone (FID real-stat input)
  <out>/valB/*.png                     label renders alone
  <out>/table.txt                      "<i> <trainId label> <photo>" rows
                                       (reference datasets/table.txt
                                       format, consumed by MIoUEvaluator)

Composite base names keep the *_leftImg8bit stem so the evaluator's table
pairing (item[2] photo-path suffix match) resolves them.  With
--direction BtoA the generator maps label renders -> photos, and mIoU of
those photos under a DRN judge is the reference's cityscapes metric
(metric/mIoU_score.py:209-247).

Usage: python tools/make_p2p_cityscapes.py --data <synth_cityscapes> \
           --out <workdir>/p2p_cityscapes [--size 256] [--classes 8]
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image


def label_palette(n_classes: int) -> np.ndarray:
    """Deterministic, well-separated label colours (render of the B side).
    Independent of the photo palette so the mapping must be learned."""
    rs = np.random.RandomState(1234)
    return rs.randint(0, 256, (n_classes, 3)).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="synthetic cityscapes root")
    ap.add_argument("--out", required=True,
                    help="output dataroot (give it a 'cityscapes' name — "
                         "the mIoU guard checks the dataroot string)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--classes", type=int, default=8)
    args = ap.parse_args()

    pal = label_palette(args.classes)
    size = (args.size, args.size)
    table = []
    for phase in ("train", "val"):
        comp_dir = os.path.join(args.out, phase)
        os.makedirs(comp_dir, exist_ok=True)
        if phase == "val":
            os.makedirs(os.path.join(args.out, "valA"), exist_ok=True)
            os.makedirs(os.path.join(args.out, "valB"), exist_ok=True)
        labs = sorted(glob.glob(os.path.join(
            args.data, "gtFine", phase, "*", "*_gtFine_labelIds.png")))
        for i, lp in enumerate(labs):
            city = os.path.basename(os.path.dirname(lp))
            stem = os.path.basename(lp)[: -len("_gtFine_labelIds.png")]
            pp = os.path.join(args.data, "leftImg8bit", phase, city,
                              f"{stem}_leftImg8bit.png")
            photo = Image.open(pp).resize(size, Image.BICUBIC)
            label = np.asarray(Image.open(lp))
            render = Image.fromarray(pal[label]).resize(size, Image.NEAREST)
            comp = Image.new("RGB", (2 * args.size, args.size))
            comp.paste(photo, (0, 0))
            comp.paste(render, (args.size, 0))
            name = f"{stem}_leftImg8bit.png"
            comp.save(os.path.join(comp_dir, name))
            if phase == "val":
                photo.save(os.path.join(args.out, "valA", name))
                render.save(os.path.join(args.out, "valB", name))
                # labelIds ARE trainIds for the synthetic task (classes
                # 0..n-1, no void remap needed)
                table.append(
                    f"{len(table)} "
                    f"gtFine/val/{city}/{stem}_gtFine_labelIds.png "
                    f"leftImg8bit/val/{city}/{stem}_leftImg8bit.png"
                )
        print(f"{phase}: {len(labs)} composites")
    with open(os.path.join(args.out, "table.txt"), "w") as f:
        f.write("\n".join(table) + "\n")
    print(f"wrote {len(table)} table rows to {args.out}/table.txt")


if __name__ == "__main__":
    main()
