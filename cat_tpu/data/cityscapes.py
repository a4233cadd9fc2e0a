"""Cityscapes dataset for GauGAN/SPADE training.

Reference: data/cityscapes_dataset.py — gtFine labelIds + instanceIds +
leftImg8bit photos; labels are nearest-resized and kept as raw integer ids;
photos are normalised to [-1, 1].  Defaults: scale_width 512, aspect 2,
input_nc 35 (reference :21-47).

Output per item: {'label': (H,W) float32 ids, 'instance': (H,W) int32,
'image': (H,W,3) float32 in [-1,1], 'path': str}.  One-hot scatter + edge
maps happen on device (cat_tpu.train.spade_model.preprocess_input).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from cat_tpu.data.datasets import make_dataset, natural_sort
from cat_tpu.data.loader import DataLoader


def _pair_key(path: str, suffix: str) -> str:
    name = os.path.basename(path)
    return name.replace(suffix, "")


class CityscapesDataset:
    def __init__(
        self,
        dataroot: str,
        phase: str = "train",
        load_size: int = 512,
        crop_size: int = 512,
        aspect_ratio: float = 2.0,
        no_instance: bool = False,
        pairing_check: bool = True,
        max_size: int = -1,
        load_in_memory: bool = False,
    ):
        label_dir = os.path.join(dataroot, "gtFine", phase)
        image_dir = os.path.join(dataroot, "leftImg8bit", phase)
        labels = [p for p in make_dataset(label_dir) if p.endswith("_labelIds.png")]
        instances = [p for p in make_dataset(label_dir) if p.endswith("_instanceIds.png")]
        images = make_dataset(image_dir)
        self.label_paths = natural_sort(labels)
        self.instance_paths = natural_sort(instances)
        self.image_paths = natural_sort(images)
        if max_size > 0:
            self.label_paths = self.label_paths[:max_size]
            self.instance_paths = self.instance_paths[:max_size]
            self.image_paths = self.image_paths[:max_size]
        if pairing_check:
            for lp, ip in zip(self.label_paths, self.image_paths):
                a = _pair_key(lp, "_gtFine_labelIds.png")
                b = _pair_key(ip, "_leftImg8bit.png")
                assert a == b, (
                    f"label-image pairing broken: {lp} vs {ip} "
                    "(use pairing_check=False to skip)"
                )
        self.no_instance = no_instance
        self.load_size = load_size
        self.aspect_ratio = aspect_ratio
        self.cache: Optional[List[Dict]] = [] if load_in_memory else None
        if self.cache is not None:
            self.cache = [None] * len(self.label_paths)

    def __len__(self):
        return len(self.label_paths)

    def _target_size(self, img: Image.Image):
        w = self.load_size
        h = int(self.load_size / self.aspect_ratio)
        return (w, h)

    def __getitem__(self, index: int) -> Dict:
        if self.cache is not None and self.cache[index] is not None:
            return self.cache[index]
        lp = self.label_paths[index]
        ip = self.image_paths[index]
        label = Image.open(lp)
        label = label.resize(self._target_size(label), Image.NEAREST)
        image = Image.open(ip).convert("RGB")
        image = image.resize(self._target_size(image), Image.BICUBIC)
        item = {
            "label": np.asarray(label, dtype=np.float32),
            "image": np.asarray(image, dtype=np.float32) / 127.5 - 1.0,
            "path": ip,
        }
        if not self.no_instance:
            inst = Image.open(self.instance_paths[index])
            inst = inst.resize(self._target_size(inst), Image.NEAREST)
            item["instance"] = np.asarray(inst, dtype=np.int32)
        if self.cache is not None:
            self.cache[index] = item
        return item


def create_cityscapes_dataloader(
    dataroot: str,
    batch_size: int,
    phase: str = "train",
    shuffle: bool = True,
    seed: Optional[int] = None,
    drop_last: bool = True,
    process_shard=None,
    **kwargs,
) -> DataLoader:
    ds = CityscapesDataset(dataroot, phase, **kwargs)
    return DataLoader(ds, batch_size, shuffle=shuffle, seed=seed,
                      drop_last=drop_last, process_shard=process_shard)
