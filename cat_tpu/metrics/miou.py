"""Cityscapes mIoU scoring utilities.

Reference: metric/mIoU_score.py (fast_hist 174-177, 19-class mean IoU
209-247, cityscapes normalisation constants 72-82).  The DRN-D-105
segmentation judge lives in cat_tpu/metrics/drn.py; this module is the
judge-agnostic scoring math.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

N_CLASSES = 19

# ImageNet-style normalisation the DRN judge was trained with
# (reference mIoU_score.py:72-82)
CITYSCAPES_MEAN = np.array([0.29010095242892997, 0.32808144844279574, 0.28696394422942517])
CITYSCAPES_STD = np.array([0.1829540508368939, 0.18656561047509476, 0.18447508988480435])


def fast_hist(pred: np.ndarray, label: np.ndarray, n: int = N_CLASSES) -> np.ndarray:
    """n x n confusion matrix from flattened prediction/label id arrays;
    labels >= n (ignore/void) are dropped."""
    pred = np.asarray(pred).ravel()
    label = np.asarray(label).ravel()
    k = (label >= 0) & (label < n)
    return np.bincount(n * label[k].astype(int) + pred[k], minlength=n**2).reshape(n, n)


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    denom = hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / denom


def mean_iou(hist: np.ndarray) -> float:
    """Mean IoU in percent over classes present (nanmean, reference
    mIoU_score.py:236-246)."""
    ious = per_class_iou(hist) * 100.0
    return float(np.nanmean(ious))


def median_iou(hist: np.ndarray) -> float:
    """Median per-class IoU (reference get_mIoU_new median variant)."""
    ious = per_class_iou(hist) * 100.0
    return float(np.nanmedian(ious))


def accumulate_hist(
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]], n: int = N_CLASSES
) -> np.ndarray:
    hist = np.zeros((n, n), dtype=np.int64)
    for pred, label in pairs:
        hist += fast_hist(pred, label, n)
    return hist


def normalize_for_drn(images01: np.ndarray) -> np.ndarray:
    """[0,1] float NHWC -> judge input (cityscapes mean/std)."""
    return (images01 - CITYSCAPES_MEAN) / CITYSCAPES_STD
