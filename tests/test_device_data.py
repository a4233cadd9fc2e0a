"""Device-resident dataset: sampling semantics and value correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cat_tpu.data.device_data import DeviceData, _sample_side, stack_resized_uint8


def _bank(n=5, s=12, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (n, s, s, 3), dtype=np.uint8)


def test_sample_shapes_range_dtype():
    dd = DeviceData(_bank(), _bank(seed=1), crop_size=8)
    b = dd.sample(jax.random.PRNGKey(0), 6)
    assert b["A"].shape == (6, 8, 8, 3) and b["B"].shape == (6, 8, 8, 3)
    assert b["A"].dtype == jnp.float32
    assert float(b["A"].min()) >= -1.0 and float(b["A"].max()) <= 1.0


def test_patches_are_true_crops():
    """Every sampled patch (no flip) must be a contiguous crop of a bank image."""
    bank = _bank(n=3, s=10)
    dd = DeviceData(bank, None, crop_size=4, no_flip=True)
    b = dd.sample(jax.random.PRNGKey(1), 8)
    got = np.asarray((b["A"] + 1.0) * 127.5).round().astype(np.uint8)
    for patch in got:
        found = False
        for img in bank:
            for y in range(7):
                for x in range(7):
                    if np.array_equal(img[y:y + 4, x:x + 4], patch):
                        found = True
        assert found, "sampled patch is not a crop of any bank image"


def test_flip_produces_mirrored_crops():
    bank = _bank(n=1, s=6)
    out = _sample_side(jnp.asarray(bank), jax.random.PRNGKey(3), 64, 4, False)
    got = np.asarray((out + 1.0) * 127.5).round().astype(np.uint8)
    img = bank[0]
    crops = {  # all crops and their mirrors
        arr.tobytes()
        for y in range(3) for x in range(3)
        for arr in (img[y:y + 4, x:x + 4], img[y:y + 4, x:x + 4][:, ::-1])
    }
    n_flipped = 0
    for patch in got:
        assert patch.tobytes() in crops
        mirrored_only = {
            img[y:y + 4, x:x + 4][:, ::-1].tobytes()
            for y in range(3) for x in range(3)
        } - {img[y:y + 4, x:x + 4].tobytes() for y in range(3) for x in range(3)}
        if patch.tobytes() in mirrored_only:
            n_flipped += 1
    assert n_flipped > 0, "no flipped samples in 64 draws"


def test_determinism_per_key():
    dd = DeviceData(_bank(), _bank(seed=1), crop_size=8)
    a = dd.sample(jax.random.PRNGKey(7), 4)
    b = dd.sample(jax.random.PRNGKey(7), 4)
    assert np.allclose(a["A"], b["A"]) and np.allclose(a["B"], b["B"])


def _image_dirs(tmp_path):
    from PIL import Image

    for side in ("trainA", "trainB"):
        d = tmp_path / side
        d.mkdir()
        rs = np.random.RandomState(hash(side) % 100)
        for i in range(4):
            Image.fromarray(
                rs.randint(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")


def test_from_unaligned_bank(tmp_path):
    """Image dir -> HBM bank -> sampled batch (the slow twin below feeds
    the batch through a full distill step)."""
    _image_dirs(tmp_path)
    dd, n = DeviceData.from_unaligned(str(tmp_path), "train", load_size=36,
                                      crop_size=32)
    assert n == 4
    batch = dd.sample(jax.random.PRNGKey(0), 2)
    assert batch["A"].shape == (2, 32, 32, 3)
    assert batch["B"].shape == (2, 32, 32, 3)
    for k in ("A", "B"):
        v = np.asarray(batch[k])
        assert v.min() >= -1.0 - 1e-6 and v.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_from_unaligned_and_distill_step(tmp_path):
    """End to end: image dir -> HBM bank -> sampled batch -> distill step."""
    _image_dirs(tmp_path)

    # crop >= 32: the ndf-64 3-layer patch discriminator reduces 16px
    # inputs to zero spatial output (empty-mean NaN), as the reference's
    # torch geometry does
    dd, n = DeviceData.from_unaligned(str(tmp_path), "train", load_size=36,
                                      crop_size=32)
    assert n == 4
    batch = dd.sample(jax.random.PRNGKey(0), 2)

    from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
    from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller

    mk = lambda ngf: InceptionGeneratorConfig.make(
        ngf=ngf, channels=None, channels_reduction_factor=6, kernel_sizes=(1, 3),
        n_blocks=2, norm=NormConfig(kind="instance", affine=True,
                                    track_running_stats=False),
    )
    hp = DistillHParams(dataset_mode="unaligned", gan_mode="lsgan",
                        distill_loss_type="ka", mapping_layers=("encode",))
    dist = InceptionDistiller(mk(8), mk(4), hp=hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), 32, 32, tv)
    state, metrics = dist.train_step(state, tv, batch, 2e-4)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
