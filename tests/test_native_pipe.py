"""Native C++ image pipeline: decode/resize/augment parity with the PIL path.

The native path (cat_tpu/native/image_pipe.cpp) implements the same
antialiased separable filters PIL uses (triangle / Catmull-Rom a=-0.5) but
accumulates in float instead of PIL's fixed point, so resized pixels may
differ by a couple of 8-bit levels; decode itself (libjpeg/libpng — the
same codecs PIL wraps) is expected bit-exact."""

import os

import numpy as np
import pytest
from PIL import Image

from cat_tpu.native import load_pipe, native_filter_for, pipe_error

pipe = load_pipe()
pytestmark = pytest.mark.skipif(
    pipe is None, reason=f"native pipeline unavailable: {pipe_error()}")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    arr = rs.randint(0, 256, (47, 61, 3), dtype=np.uint8)
    png = str(tmp / "a.png")
    Image.fromarray(arr).save(png)
    jpg = str(tmp / "a.jpg")
    Image.fromarray(arr).save(jpg, quality=92)
    gray_png = str(tmp / "g.png")
    Image.fromarray(arr[:, :, 0]).save(gray_png)
    pal_png = str(tmp / "p.png")
    Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(pal_png)
    return {"png": png, "jpg": jpg, "gray": gray_png, "pal": pal_png, "arr": arr}


def test_png_decode_bit_exact(images):
    """Identity resize (load == source size is not square here, so compare
    via PIL resize to the same square) — use a square source for the
    bit-exact decode check."""
    sq = np.random.RandomState(1).randint(0, 256, (32, 32, 3), dtype=np.uint8)
    p = os.path.join(os.path.dirname(images["png"]), "sq.png")
    Image.fromarray(sq).save(p)
    got = pipe.decode_resize(p, 32)
    np.testing.assert_array_equal(got, sq)


@pytest.mark.parametrize("key", ["png", "jpg", "gray", "pal"])
@pytest.mark.parametrize("pil_method", [Image.BILINEAR, Image.BICUBIC])
def test_resize_close_to_pil(images, key, pil_method):
    filt = native_filter_for(pil_method)
    got = pipe.decode_resize(images[key], 40, filter=filt)
    ref = np.asarray(
        Image.open(images[key]).convert("RGB").resize((40, 40), pil_method),
        np.uint8)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 3, f"max diff {diff.max()} vs PIL"
    assert diff.mean() < 1.0


def test_fetch_batch_matches_manual(images):
    """Batch fetch == decode_resize + crop/flip/normalise done by hand."""
    paths = [images["png"], images["jpg"]]
    cx = np.array([3, 7], np.int32)
    cy = np.array([5, 1], np.int32)
    fl = np.array([0, 1], np.uint8)
    out = pipe.fetch_batch(paths, 36, 20, cx, cy, fl, nthreads=2)
    assert out.shape == (2, 20, 20, 3) and out.dtype == np.float32
    for i, p in enumerate(paths):
        full = pipe.decode_resize(p, 36)
        patch = full[cy[i]:cy[i] + 20, cx[i]:cx[i] + 20]
        if fl[i]:
            patch = patch[:, ::-1]
        ref = patch.astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


def test_missing_file_raises(images):
    with pytest.raises(IOError):
        pipe.decode_resize("/nonexistent/x.png", 16)
    with pytest.raises(IOError):
        pipe.fetch_batch(["/nonexistent/x.png"], 16, 8,
                         np.zeros(1, np.int32), np.zeros(1, np.int32),
                         np.zeros(1, np.uint8))


def test_fill_bank(images):
    bank = pipe.fill_bank([images["png"], images["jpg"], images["png"]], 24)
    assert bank.shape == (3, 24, 24, 3) and bank.dtype == np.uint8
    np.testing.assert_array_equal(bank[0], bank[2])


def test_unaligned_native_batch_matches_python(tmp_path):
    """Same seed => native_batch and serial __getitem__ draw identical
    paths/crops/flips; pixel values agree to resize-rounding tolerance."""
    from cat_tpu.data.datasets import UnalignedDataset
    from cat_tpu.data.loader import DataLoader, collate
    from cat_tpu.data.transforms import TransformSpec

    rs = np.random.RandomState(3)
    for side, n in (("trainA", 5), ("trainB", 4)):
        d = tmp_path / side
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                rs.randint(0, 256, (50, 44, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")

    spec = TransformSpec(preprocess="resize_and_crop", load_size=36,
                         crop_size=32)
    mk = lambda: UnalignedDataset(str(tmp_path), "train", spec, seed=11)
    ds_native, ds_py = mk(), mk()
    idx = [0, 3, 1]
    got = ds_native.native_batch(idx, pipe, nthreads=2)
    ref = collate([ds_py[i] for i in idx])
    assert got["A_paths"] == list(ref["A_paths"])
    assert got["B_paths"] == list(ref["B_paths"])
    for side in ("A", "B"):
        assert got[side].shape == ref[side].shape
        # same crop/flip params => differences only from resize rounding
        diff = np.abs(got[side] - ref[side])
        assert diff.max() <= 6.0 / 255.0, float(diff.max())

    # the DataLoader-level native mode yields the same stream
    loader = DataLoader(mk(), 2, shuffle=False, seed=0, drop_last=True,
                        num_workers=2, worker_mode="native")
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["A"].shape == (2, 32, 32, 3)
