"""Data pipeline: shared transform params, loaders, cityscapes tree."""

import os

import numpy as np
import pytest
from PIL import Image

from cat_tpu.data.datasets import (
    AlignedDataset,
    SingleDataset,
    UnalignedDataset,
    create_eval_dataloader,
    make_dataset,
    natural_sort,
)
from cat_tpu.data.loader import DataLoader
from cat_tpu.data.transforms import TransformSpec, apply_transform, get_params


def write_images(directory, n, size=(40, 40), rng=None):
    os.makedirs(directory, exist_ok=True)
    rng = rng or np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(directory, f"img_{i}.png"))


def test_natural_sort():
    assert natural_sort(["a10.png", "a2.png", "a1.png"]) == [
        "a1.png", "a2.png", "a10.png",
    ]


def test_aligned_shares_transform_params(tmp_path):
    # A|B where both halves are identical: any crop/flip must keep A == B
    root = tmp_path / "db" / "train"
    os.makedirs(root)
    rng = np.random.RandomState(0)
    for i in range(3):
        half = rng.randint(0, 255, size=(40, 40, 3), dtype=np.uint8)
        Image.fromarray(np.concatenate([half, half], axis=1)).save(
            root / f"{i}.png"
        )
    spec = TransformSpec(preprocess="resize_and_crop", load_size=36, crop_size=32)
    ds = AlignedDataset(str(tmp_path / "db"), "train", spec, seed=0)
    for i in range(3):
        item = ds[i]
        np.testing.assert_allclose(item["A"], item["B"])
        assert item["A"].shape == (32, 32, 3)
        assert item["A"].min() >= -1.0 and item["A"].max() <= 1.0


def test_unaligned_serial_and_random(tmp_path):
    rng = np.random.RandomState(0)
    write_images(tmp_path / "db" / "trainA", 4, rng=rng)
    write_images(tmp_path / "db" / "trainB", 4, rng=rng)
    spec = TransformSpec(preprocess="none", no_flip=True)
    ds = UnalignedDataset(str(tmp_path / "db"), "train", spec,
                          serial_batches=True, seed=0)
    item = ds[1]
    assert item["B_paths"].endswith("img_1.png")  # serial pairing


def test_loader_drop_last_and_prefetch(tmp_path):
    rng = np.random.RandomState(0)
    write_images(tmp_path / "imgs", 5, rng=rng)
    spec = TransformSpec(preprocess="none", no_flip=True)
    ds = SingleDataset(str(tmp_path / "imgs"), "", spec)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 5 images, last partial batch dropped
    assert all(b["A"].shape == (2, 40, 40, 3) for b in batches)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    assert len(list(loader)) == 3


def test_loader_multiworker_matches_serial(tmp_path):
    """Thread-pool decode must preserve batch order and contents."""
    rng = np.random.RandomState(0)
    write_images(tmp_path / "imgs", 9, rng=rng)
    spec = TransformSpec(preprocess="none", no_flip=True)
    ds = SingleDataset(str(tmp_path / "imgs"), "", spec)
    serial = list(DataLoader(ds, 2, shuffle=False, num_workers=0))
    pooled = list(DataLoader(ds, 2, shuffle=False, num_workers=4, prefetch=3))
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a["A"], b["A"])
        assert a["A_paths"] == b["A_paths"]


def test_device_prefetch_order_and_depth(tmp_path):
    from cat_tpu.data.loader import device_prefetch

    puts = []
    out = []
    it = iter([{"x": np.full((1,), i)} for i in range(5)])
    for b in device_prefetch(it, lambda d: (puts.append(len(puts)), d)[1], depth=2):
        out.append(int(b["x"][0]))
    assert out == [0, 1, 2, 3, 4]
    assert len(puts) == 5  # every batch went through put_fn exactly once


def test_eval_loader_no_flip_single_mode(tmp_path):
    rng = np.random.RandomState(0)
    write_images(tmp_path / "db" / "valA", 2, rng=rng)
    write_images(tmp_path / "db" / "valB", 2, rng=rng)
    spec = TransformSpec(preprocess="none")
    loader = create_eval_dataloader("unaligned", str(tmp_path / "db"), 1, spec, "AtoB")
    batches = list(loader)
    assert len(batches) == 2
    assert "A" in batches[0] and "B" not in batches[0]  # single-mode eval


def test_cityscapes_dataset(tmp_path):
    from cat_tpu.data.cityscapes import CityscapesDataset

    rng = np.random.RandomState(0)
    city = tmp_path / "gtFine" / "train" / "cityA"
    photos = tmp_path / "leftImg8bit" / "train" / "cityA"
    os.makedirs(city)
    os.makedirs(photos)
    for i in range(2):
        base = f"cityA_{i:06d}_000019"
        lab = rng.randint(0, 34, size=(64, 128), dtype=np.uint8)
        Image.fromarray(lab).save(city / f"{base}_gtFine_labelIds.png")
        Image.fromarray(lab).save(city / f"{base}_gtFine_instanceIds.png")
        img = rng.randint(0, 255, size=(64, 128, 3), dtype=np.uint8)
        Image.fromarray(img).save(photos / f"{base}_leftImg8bit.png")
    ds = CityscapesDataset(str(tmp_path), "train", load_size=64, aspect_ratio=2.0)
    assert len(ds) == 2
    item = ds[0]
    assert item["label"].shape == (32, 64)
    assert item["image"].shape == (32, 64, 3)
    assert item["instance"].shape == (32, 64)
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0


def test_scale_width_preprocess(tmp_path):
    rng = np.random.RandomState(0)
    write_images(tmp_path / "imgs", 1, size=(80, 40), rng=rng)
    spec = TransformSpec(preprocess="scale_width", load_size=64, crop_size=16,
                         no_flip=True)
    img = Image.open(os.path.join(tmp_path, "imgs", "img_0.png"))
    arr = apply_transform(img, spec, None)
    assert arr.shape[1] == 64  # width scaled
    assert arr.shape[0] == 32  # aspect kept


def test_worker_backends_bit_identical(tmp_path):
    """RNG-bearing transforms (random crop/flip/B-pairing): thread and
    fork-process backends must produce the exact serial sample stream —
    randomness is drawn serially in prepare(), workers only decode."""
    import numpy as np
    from PIL import Image

    from cat_tpu.data.datasets import UnalignedDataset
    from cat_tpu.data.loader import DataLoader
    from cat_tpu.data.transforms import TransformSpec

    rs = np.random.RandomState(5)
    for side, n in (("trainA", 6), ("trainB", 5)):
        d = tmp_path / side
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                rs.randint(0, 256, (40, 36, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")

    spec = TransformSpec(preprocess="resize_and_crop", load_size=36,
                         crop_size=32, no_flip=False)

    def stream(worker_mode, num_workers):
        ds = UnalignedDataset(str(tmp_path), "train", spec, seed=3)
        loader = DataLoader(ds, 2, shuffle=True, seed=9, drop_last=True,
                            num_workers=num_workers, worker_mode=worker_mode)
        out = list(loader)
        loader.close()
        return out

    ref = stream("thread", 0)  # serial
    for mode, nw in (("thread", 4), ("process", 3)):
        got = stream(mode, nw)
        assert len(got) == len(ref)
        for bg, br in zip(got, ref):
            assert bg["A_paths"] == br["A_paths"]
            assert bg["B_paths"] == br["B_paths"]
            np.testing.assert_array_equal(bg["A"], br["A"])
            np.testing.assert_array_equal(bg["B"], br["B"])
