"""Generic SPADE dataset base + custom-dataset template.

Reference: data/spade_dataset.py (abstract ``SPADEDataset``: subclasses
provide ``get_paths``/``paths_match``; base handles natural sorting, the
label-image pairing check, label/instance/image transforms with shared
random params, in-memory caching, and the 255 -> input_nc 'unknown' remap)
and data/template_dataset.py (the documented starting point for custom
datasets).  CityscapesDataset (data/cityscapes.py) predates this base and
stays standalone; new SPADE-style datasets should subclass
``SPADEDataset`` instead.

Output contract per item (same as the reference and as
cat_tpu.data.cityscapes): ``{'label': (H,W) float32 raw ids,
'instance': (H,W) int32, 'image': (H,W,3) float32 in [-1,1],
'path': str}`` — one-hot scatter and edge maps happen on device
(cat_tpu.train.spade_model.preprocess_input).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from cat_tpu.data.datasets import make_dataset, natural_sort
from cat_tpu.data.transforms import (
    TransformParams, TransformSpec, get_params, resize_image,
)


class SPADEDataset:
    """Abstract label+image(+instance) dataset for SPADE-family training.

    Subclasses implement ``get_paths`` (and usually ``paths_match``); the
    base mirrors reference data/spade_dataset.py: natural-sorts the three
    path lists, optionally checks label-image pairing, applies a shared
    random crop/flip to label (NEAREST, raw ids), instance (NEAREST) and
    image (BICUBIC, [-1,1]), remaps the 255 'dontcare' label to
    ``input_nc``, and caches with ``load_in_memory``.

    The cache holds the DECODED (and deterministically resized) PIL images
    only — the random crop/flip/normalise tail is redrawn on every access,
    matching the reference (spade_dataset.py:41-66); caching the
    transformed item would freeze augmentation after epoch 1.
    """

    def __init__(
        self,
        dataroot: str,
        phase: str = "train",
        spec: Optional[TransformSpec] = None,
        input_nc: int = 35,
        no_instance: bool = False,
        pairing_check: bool = True,
        contain_dontcare_label: bool = True,
        max_size: int = -1,
        load_in_memory: bool = False,
        seed: Optional[int] = None,
    ):
        self.dataroot = dataroot
        self.phase = phase
        self.spec = spec or TransformSpec(
            preprocess="scale_width_and_crop", load_size=512, crop_size=512
        )
        self.input_nc = input_nc
        self.no_instance = no_instance
        self.contain_dontcare_label = contain_dontcare_label
        self._rng = random.Random(seed) if seed is not None else None

        label_paths, image_paths, instance_paths = self.get_paths()
        label_paths = natural_sort(list(label_paths))
        image_paths = natural_sort(list(image_paths))
        instance_paths = natural_sort(list(instance_paths or []))
        if max_size > 0:
            label_paths = label_paths[:max_size]
            image_paths = image_paths[:max_size]
            instance_paths = instance_paths[:max_size]
        if pairing_check:
            for lp, ip in zip(label_paths, image_paths):
                assert self.paths_match(lp, ip), (
                    f"label-image pair ({lp}, {ip}) do not look paired; "
                    "override paths_match or pass pairing_check=False"
                )
        if not no_instance and len(instance_paths) != len(label_paths):
            raise ValueError(
                f"no_instance=False but {len(instance_paths)} instance maps "
                f"were found for {len(label_paths)} labels — provide a "
                "matching instance set (e.g. <phase>_instances) or pass "
                "no_instance=True"
            )
        self.label_paths = label_paths
        self.image_paths = image_paths
        self.instance_paths = instance_paths
        self.cache: Optional[List[Optional[Tuple]]] = (
            [None] * len(label_paths) if load_in_memory else None
        )

    # -- subclass hooks ---------------------------------------------------
    def get_paths(self) -> Tuple[List[str], List[str], List[str]]:
        """Return (label_paths, image_paths, instance_paths)."""
        raise NotImplementedError

    def paths_match(self, label_path: str, image_path: str) -> bool:
        """Default: same basename stem (reference subclasses override)."""
        import os

        s1 = os.path.splitext(os.path.basename(label_path))[0]
        s2 = os.path.splitext(os.path.basename(image_path))[0]
        return s1 == s2

    def postprocess(self, item: Dict) -> Dict:
        """Hook for subclasses to adjust the final item (reference :131)."""
        return item

    # -- pipeline ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.label_paths)

    def _tail(self, img: Image.Image, params: TransformParams) -> Image.Image:
        """Shared-params random tail: crop -> flip (PIL ops return new
        objects, so cached images are never mutated)."""
        spec = self.spec
        if "crop" in spec.preprocess:
            x, y = params.crop_pos
            img = img.crop((x, y, x + spec.crop_size, y + spec.crop_size))
        if params.flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return img

    def _decode(self, index: int) -> Tuple:
        """Deterministic decode + resize (cacheable across epochs); the
        resize logic is transforms.resize_image — label/instance planes
        NEAREST without colourspace conversion, photos BICUBIC RGB."""
        label = Image.open(self.label_paths[index])
        orig_size = label.size  # get_params keys off the ORIGINAL size
        label = resize_image(label, self.spec, Image.NEAREST, convert=False)
        image = Image.open(self.image_paths[index]).convert("RGB")
        image = resize_image(image, self.spec, Image.BICUBIC, convert=False)
        inst = None
        if not self.no_instance:
            inst = resize_image(Image.open(self.instance_paths[index]),
                                self.spec, Image.NEAREST, convert=False)
        return orig_size, label, image, inst

    def __getitem__(self, index: int) -> Dict:
        if self.cache is not None:
            entry = self.cache[index]
            if entry is None:
                entry = self._decode(index)
                self.cache[index] = entry
        else:
            entry = self._decode(index)
        orig_size, label, image, inst = entry
        # redraw the random crop/flip on EVERY access (also for cached
        # items — reference spade_dataset.py redoes get_params per access)
        params = get_params(self.spec, orig_size, self._rng)

        lab = np.asarray(self._tail(label, params), dtype=np.float32)
        if self.contain_dontcare_label:
            # reference spade_dataset.py:56-58: 'unknown' is input_nc
            lab = np.where(lab == 255.0, float(self.input_nc), lab)
        img = np.asarray(self._tail(image, params),
                         dtype=np.float32) / 127.5 - 1.0

        item: Dict = {"label": lab, "image": img,
                      "path": self.image_paths[index]}
        if inst is not None:
            item["instance"] = np.asarray(self._tail(inst, params),
                                          dtype=np.int32)
        return self.postprocess(item)


class TemplateDataset(SPADEDataset):
    """Custom-dataset starting point (reference data/template_dataset.py).

    Expects ``<dataroot>/<phase>_labels`` and ``<dataroot>/<phase>_images``
    with identically-stemmed files (plus optional ``<phase>_instances``).
    Copy this class, point ``get_paths`` at your layout, and override
    ``paths_match``/``postprocess`` as needed.
    """

    def get_paths(self):
        import os

        root, phase = self.dataroot, self.phase
        labels = make_dataset(os.path.join(root, f"{phase}_labels"))
        images = make_dataset(os.path.join(root, f"{phase}_images"))
        inst_dir = os.path.join(root, f"{phase}_instances")
        instances = make_dataset(inst_dir) if os.path.isdir(inst_dir) else []
        return labels, images, instances
