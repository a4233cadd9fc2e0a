"""Tests for the HTML page writer and the generic SPADE dataset base."""

import os

import numpy as np
import pytest
from PIL import Image

from cat_tpu.data.spade_generic import SPADEDataset, TemplateDataset
from cat_tpu.data.transforms import TransformSpec
from cat_tpu.utils.html import HTML


def test_html_page(tmp_path):
    web = str(tmp_path / "web")
    page = HTML(web, "results & more", refresh=5)
    assert page.get_image_dir() == os.path.join(web, "images")
    assert os.path.isdir(page.get_image_dir())
    page.add_header("epoch <1>")
    page.add_images(["a.png", "b.png"], ["real", "fake"], ["a.png", "b.png"],
                    width=200)
    path = page.save()
    assert path == os.path.join(web, "index.html")
    text = open(path).read()
    assert "<title>results &amp; more</title>" in text
    assert 'http-equiv="refresh" content="5"' in text
    assert "<h3>epoch &lt;1&gt;</h3>" in text
    assert text.count("<td") == 2
    assert 'src="images/a.png"' in text and 'width:200px' in text


def test_write_eval_index(tmp_path):
    from cat_tpu.train.evaluation import write_eval_index

    d = tmp_path / "eval" / "100"
    for cat in ("input", "Sfake", "Tfake"):
        (d / cat).mkdir(parents=True)
        for name in ("a.png", "b.png"):
            if cat == "Tfake" and name == "b.png":
                continue  # ragged row: Tfake missing for b
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(d / cat / name)
    path = write_eval_index(str(d), "fid eval @ step 100")
    text = open(path).read()
    assert "<h3>fid eval @ step 100</h3>" in text
    assert 'src="input/a.png"' in text and 'src="Tfake/a.png"' in text
    assert 'src="Sfake/b.png"' in text and 'Tfake/b.png' not in text
    # empty dir -> no page
    assert write_eval_index(str(tmp_path / "nothing")) is None


def _make_spade_root(tmp_path, n=3, mismatch=False, instances=True):
    root = tmp_path / "data"
    for sub in ("train_labels", "train_images") + (
            ("train_instances",) if instances else ()):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        lab = rng.randint(0, 5, (12, 16)).astype(np.uint8)
        lab[0, 0] = 255  # dontcare pixel
        Image.fromarray(lab, "L").save(root / "train_labels" / f"s{i}.png")
        img = rng.randint(0, 256, (12, 16, 3)).astype(np.uint8)
        name = f"s{i + 10}.png" if mismatch else f"s{i}.png"
        Image.fromarray(img).save(root / "train_images" / name)
        if instances:
            Image.fromarray(lab, "L").save(
                root / "train_instances" / f"s{i}.png")
    return str(root)


def test_template_dataset_items(tmp_path):
    root = _make_spade_root(tmp_path)
    spec = TransformSpec(preprocess="resize_and_crop", load_size=16,
                         crop_size=8, no_flip=True)
    ds = TemplateDataset(root, "train", spec=spec, input_nc=5, seed=0,
                         load_in_memory=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["label"].shape == (8, 8)
    assert item["label"].dtype == np.float32
    assert item["image"].shape == (8, 8, 3)
    assert item["instance"].dtype == np.int32
    # 255 'dontcare' remapped to input_nc; nothing above input_nc survives
    assert item["label"].max() <= 5.0
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    # load_in_memory caches the DECODED images only: repeated access
    # redraws the random crop (augmentation must not freeze after epoch 1 —
    # reference spade_dataset.py:41-66 redoes get_params per access), and
    # each access returns fresh arrays (no aliasing into the cache)
    assert ds[0] is not item
    crops = {tuple(np.asarray(ds[0]["label"]).ravel()) for _ in range(20)}
    assert len(crops) > 1, "random crop frozen by the in-memory cache"
    # the decode cache is real: the files can disappear after first access
    assert ds[1]["image"].shape == (8, 8, 3)  # primes the cache
    os.remove(os.path.join(root, "train_images", "s1.png"))
    assert ds[1]["image"].shape == (8, 8, 3)


def test_pairing_check_and_flags(tmp_path):
    root = _make_spade_root(tmp_path, mismatch=True, instances=False)
    spec = TransformSpec(preprocess="resize_and_crop", load_size=16,
                         crop_size=8, no_flip=True)
    with pytest.raises(AssertionError):
        TemplateDataset(root, "train", spec=spec, no_instance=True)
    ds = TemplateDataset(root, "train", spec=spec, no_instance=True,
                         pairing_check=False, max_size=2)
    assert len(ds) == 2
    assert "instance" not in ds[0]


def test_shared_params_label_image_alignment(tmp_path):
    """Label and image must get the same crop/flip (reference shares
    get_params between the two transforms)."""
    root = tmp_path / "data"
    (root / "train_labels").mkdir(parents=True)
    (root / "train_images").mkdir(parents=True)
    # encode the column index in both label and image so any geometric
    # divergence between the two pipelines shows up as a value mismatch
    col = np.tile(np.arange(32, dtype=np.uint8), (32, 1))
    Image.fromarray(col, "L").save(root / "train_labels" / "a.png")
    Image.fromarray(np.stack([col] * 3, -1)).save(
        root / "train_images" / "a.png")
    spec = TransformSpec(preprocess="resize_and_crop", load_size=32,
                         crop_size=16, no_flip=False)
    ds = TemplateDataset(str(root), "train", spec=spec, no_instance=True,
                         seed=3)
    for _ in range(4):  # several draws -> several random crop/flip params
        item = ds[0]
        lab_cols = item["label"][0]
        img_cols = (item["image"][0, :, 0] + 1.0) * 127.5
        np.testing.assert_allclose(img_cols, lab_cols, atol=0.75)


def test_spade_dataset_is_abstract(tmp_path):
    with pytest.raises(NotImplementedError):
        SPADEDataset(str(tmp_path))
