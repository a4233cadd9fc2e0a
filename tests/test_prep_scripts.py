"""Smoke tests for the dataset prep scripts (reference datasets/*).

Each script is driven as a __main__ module over a tiny synthetic
cityscapes-layout tree, asserting the reference's output contract:
prepare_cityscapes writes 512x256 AB jpegs + table.txt (val rows only),
get_trainIds maps labelIds -> 19-class trainIds (void = 255),
combine_A_and_B joins aligned folders side by side.
"""

import os
import runpy
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, "datasets", script),
                       run_name="__main__")
    finally:
        sys.argv = old


def _make_cityscapes(tmp_path, n=2):
    gt = tmp_path / "gtFine"
    left = tmp_path / "leftImg8bit"
    rng = np.random.RandomState(0)
    for phase in ("train", "val"):
        (gt / phase / "cityA").mkdir(parents=True)
        (left / phase / "cityA").mkdir(parents=True)
        for i in range(n):
            stem = f"cityA_{i:06d}_000019"
            color = rng.randint(0, 256, (64, 128, 3)).astype(np.uint8)
            Image.fromarray(color).save(
                gt / phase / "cityA" / f"{stem}_gtFine_color.png")
            ids = rng.choice([0, 7, 11, 26, 255], (64, 128)).astype(np.uint8)
            Image.fromarray(ids, "L").save(
                gt / phase / "cityA" / f"{stem}_gtFine_labelIds.png")
            photo = rng.randint(0, 256, (64, 128, 3)).astype(np.uint8)
            Image.fromarray(photo).save(
                left / phase / "cityA" / f"{stem}_leftImg8bit.png")
    return gt, left


def test_prepare_cityscapes_dataset(tmp_path):
    gt, left = _make_cityscapes(tmp_path)
    out = tmp_path / "cityscapes_ab"
    table = tmp_path / "table.txt"
    _run("prepare_cityscapes_dataset.py", [
        "--gtFine_dir", str(gt), "--leftImg8bit_dir", str(left),
        "--output_dir", str(out), "--table_path", str(table),
    ])
    for phase in ("train", "val"):
        files = sorted(os.listdir(out / phase))
        assert files == ["1.jpg", "2.jpg"]
        im = Image.open(out / phase / "1.jpg")
        assert im.size == (512, 256)
    rows = open(table).read().strip().split("\n")
    assert len(rows) == 2  # val rows only (reference writes the val table)
    name, label_path, photo_path = rows[0].split(" ")
    assert name == "1"
    assert label_path.endswith("_labelIds.png") and os.path.exists(label_path)
    assert photo_path.endswith("_leftImg8bit.png") and os.path.exists(photo_path)


def test_get_trainIds(tmp_path):
    gt, _ = _make_cityscapes(tmp_path, n=1)
    _run("get_trainIds.py", ["--gtFine_dir", str(gt)])
    src = next((gt / "val" / "cityA").glob("*_labelIds.png"))
    dst = str(src).replace("_labelIds.png", "_trainIds.png")
    assert os.path.exists(dst)
    ids = np.asarray(Image.open(src))
    tids = np.asarray(Image.open(dst))
    # standard cityscapes mapping: 7->0 (road), 11->2, 26->13; void -> 255
    assert set(np.unique(tids[ids == 7])) == {0}
    assert set(np.unique(tids[ids == 11])) == {2}
    assert set(np.unique(tids[ids == 26])) == {13}
    assert set(np.unique(tids[(ids == 0) | (ids == 255)])) == {255}


def test_combine_A_and_B(tmp_path):
    rng = np.random.RandomState(1)
    for side in ("A", "B"):
        (tmp_path / side / "train").mkdir(parents=True)
    a = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(a).save(tmp_path / "A" / "train" / "x.png")
    Image.fromarray(b).save(tmp_path / "B" / "train" / "x.png")
    # unmatched A-side file is skipped, not an error
    Image.fromarray(a).save(tmp_path / "A" / "train" / "lonely.png")
    _run("combine_A_and_B.py", [
        "--fold_A", str(tmp_path / "A"), "--fold_B", str(tmp_path / "B"),
        "--fold_AB", str(tmp_path / "AB"),
    ])
    files = sorted(os.listdir(tmp_path / "AB" / "train"))
    assert files == ["x.png"]
    ab = np.asarray(Image.open(tmp_path / "AB" / "train" / "x.png"))
    assert ab.shape == (16, 32, 3)
    np.testing.assert_array_equal(ab[:, :16], a)
    np.testing.assert_array_equal(ab[:, 16:], b)
