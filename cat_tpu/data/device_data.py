"""Device-resident dataset: images live in HBM; augmentation runs on-chip.

An image-translation dataset at CycleGAN scale is tiny next to HBM
(horse2zebra: 2401 images x 286x286x3 uint8 = 590 MB of a v5e's 16 GB),
while host->device bandwidth is the scarcest resource in the system (PCIe
on real hosts; a measured ~20 MB/s relay in the tunneled bench harness —
a 100 MB f32 batch costs 5 s there, capping ANY host-fed step at ~25
img/s).  So: upload the decoded+resized uint8 image bank ONCE, and draw
random crop/flip/normalised batches from it inside jit — zero
steady-state host involvement; input can never starve the chip.

This replaces the reference's torch DataLoader *for training* on small
datasets (reference data/__init__.py:68-98); the host loader
(cat_tpu.data.loader.DataLoader) remains the general path for datasets
that do not fit in HBM and for evaluation sweeps.

Sampling semantics: independent uniform index draws per side (A, B) —
the distribution CycleGAN's unaligned loader converges to (random B
pairing, reference data/unaligned_dataset.py:47-72) — with per-sample
random crop position and horizontal flip, matching TransformSpec
``resize_and_crop`` + flip.  Epoch bookkeeping uses
``len(dataset) // batch`` steps per epoch as the host loader does.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def stack_resized_uint8(paths: Sequence[str], load_size: int, method=None,
                        nthreads: int = 4) -> np.ndarray:
    """Decode + resize every image once on host -> (N, S, S, 3) uint8.

    Uses the C++ pipeline (cat_tpu/native, multithreaded GIL-free decode)
    when available; PIL otherwise."""
    from PIL import Image

    method = method or Image.BICUBIC

    from cat_tpu.native import load_pipe, native_filter_for

    pipe = load_pipe()
    filt = native_filter_for(method)
    if pipe is not None and filt is not None:
        try:
            return pipe.fill_bank(paths, load_size, nthreads=nthreads,
                                  filter=filt)
        except IOError:
            pass  # unsupported container (e.g. webp): PIL fallback

    out = np.empty((len(paths), load_size, load_size, 3), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((load_size, load_size), method)
        out[i] = np.asarray(img, np.uint8)
    return out


def _sample_side(
    imgs: jnp.ndarray, key: jax.Array, n: int, crop: int, no_flip: bool,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """n random (crop x crop) patches, random flip, [-1, 1] ``dtype``."""
    N, H, W, C = imgs.shape
    ki, ky, kx, kf = jax.random.split(key, 4)
    idx = jax.random.randint(ki, (n,), 0, N)
    ys = jax.random.randint(ky, (n,), 0, H - crop + 1)
    xs = jax.random.randint(kx, (n,), 0, W - crop + 1)
    flip = (
        jnp.zeros((n,), bool) if no_flip else jax.random.bernoulli(kf, 0.5, (n,))
    )

    def one(i, y, x, f):
        patch = jax.lax.dynamic_slice(imgs, (i, y, x, 0), (1, crop, crop, C))[0]
        return jax.lax.cond(f, lambda p: p[:, ::-1, :], lambda p: p, patch)

    patches = jax.vmap(one)(idx, ys, xs, flip)
    # transforms.finish_transform formula x/255*2-1, clamped: XLA rewrites
    # the division into a reciprocal multiply, which can land 1e-7 outside
    # [-1, 1] at the endpoints
    scaled = patches.astype(dtype) / jnp.asarray(255.0, dtype) * 2.0 - 1.0
    return jnp.clip(scaled, -1.0, 1.0)


class DeviceData:
    """Unaligned (A, B) image banks in HBM with jitted batch sampling."""

    def __init__(
        self,
        images_a: np.ndarray,
        images_b: Optional[np.ndarray],
        crop_size: int,
        no_flip: bool = False,
        dtype: str = "float32",
        sharding=None,
    ):
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self.imgs_a = put(np.ascontiguousarray(images_a))
        self.imgs_b = put(np.ascontiguousarray(images_b)) if images_b is not None else None
        self.crop = crop_size
        self.no_flip = no_flip
        self.dtype = jnp.dtype(dtype)
        self._sample = jax.jit(self._sample_impl, static_argnums=(1,))

    @classmethod
    def from_unaligned(cls, dataroot: str, phase: str, load_size: int,
                       crop_size: int, no_flip: bool = False,
                       dtype: str = "float32", max_size: int = -1, sharding=None):
        import os

        from cat_tpu.data.datasets import make_dataset

        pa = make_dataset(os.path.join(dataroot, phase + "A"), max_size)
        pb = make_dataset(os.path.join(dataroot, phase + "B"), max_size)
        return cls(
            stack_resized_uint8(pa, load_size),
            stack_resized_uint8(pb, load_size),
            crop_size, no_flip, dtype, sharding,
        ), max(len(pa), len(pb))

    def _sample_impl(self, key: jax.Array, n: int) -> Dict[str, jnp.ndarray]:
        ka, kb = jax.random.split(key)
        out = {"A": _sample_side(self.imgs_a, ka, n, self.crop, self.no_flip, self.dtype)}
        if self.imgs_b is not None:
            out["B"] = _sample_side(self.imgs_b, kb, n, self.crop, self.no_flip, self.dtype)
        return out

    def sample(self, key: jax.Array, batch: int) -> Dict[str, jnp.ndarray]:
        return self._sample(key, batch)

    def batches(self, seed: int, batch: int, steps: int):
        """``steps`` sampled batches (one epoch of the host-loader pacing)."""
        key = jax.random.PRNGKey(seed)
        for s in range(steps):
            yield self.sample(jax.random.fold_in(key, s), batch)


class DeviceDataLoader:
    """Trainer-compatible facade over ``DeviceData``.

    ``__len__`` paces epochs like the host loader (len(dataset) // batch
    steps); every epoch draws from a fresh fold of the seed.  Batches are
    already on device — the Trainer's device_put_fn sees jax arrays and
    ``device_prefetch`` degenerates to a cheap passthrough.
    """

    def __init__(self, dd: DeviceData, batch: int, steps_per_epoch: int,
                 seed: int = 0):
        self.dd = dd
        self.batch = batch
        self.steps = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return self.steps

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        yield from self.dd.batches(self.seed + 1000 * epoch, self.batch, self.steps)
