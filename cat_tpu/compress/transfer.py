"""Magnitude-based channel-subset weight transfer from a wide pretrained
generator to a narrower student.

Reference: utils/weight_transfer.py:8-288.  At every conv, the output
channels with the largest |kernel| L1 mass (computed *after* slicing the
input channels) are kept, and the selected index vector threads through the
following norm / conv as their input index — exactly torch.topk order
(magnitude-descending), which permutes channels.

Documented deviation: inside depthwise branches the reference re-selects a
top-k *within the already-sliced* channel set and then slices the following
norm with those local indices against the *unsliced* tensor
(weight_transfer.py:8-53 via transfer_InvertedResidualChannels:122-132),
which mis-aligns the norm statistics.  Since a depthwise conv cannot change
channel identity, we keep the 1x1 conv's selection unchanged through the
depthwise stage — the coherent semantics.  (In the shipped flow transferred
weights are discarded when the student is re-initialised after shrink, so
this path only matters with --prune_continue-style resumes.)

All arithmetic is host-side numpy over flax param pytrees (HWIO kernels).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from cat_tpu.core.config import InceptionGeneratorConfig


def _topk_desc(q: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest entries, in descending-value order
    (matches torch.topk)."""
    order = np.argsort(-q, kind="stable")
    return order[:k]


def _transfer_conv(src: Dict, n_out: int, in_idx: Optional[np.ndarray],
                   out_idx: Optional[np.ndarray] = None) -> (Dict, np.ndarray):
    """Slice an HWIO conv param dict; returns (new params, out indices)."""
    kernel = np.asarray(src["kernel"])
    if in_idx is not None:
        kernel = kernel[:, :, in_idx, :]
    if out_idx is None:
        q = np.abs(kernel).sum(axis=(0, 1, 2))
        out_idx = _topk_desc(q, n_out)
    new = {"kernel": kernel[:, :, :, out_idx]}
    if "bias" in src:
        new["bias"] = np.asarray(src["bias"])[out_idx]
    return new, out_idx


def _transfer_dw_conv(src: Dict, idx: np.ndarray) -> Dict:
    """Depthwise conv: kernel (kh, kw, 1, channels); channel identity is fixed."""
    kernel = np.asarray(src["kernel"])[:, :, :, idx]
    new = {"kernel": kernel}
    if "bias" in src:
        new["bias"] = np.asarray(src["bias"])[idx]
    return new


def _transfer_norm(src: Dict, idx: np.ndarray) -> Dict:
    return {k: np.asarray(v)[idx] for k, v in src.items()}


def transfer_generator_params(
    src_params: Dict,
    src_cfg: InceptionGeneratorConfig,
    dst_cfg: InceptionGeneratorConfig,
) -> Dict:
    """Build student params from a wider pretrained generator's params.

    (reference: load_pretrained_weight, weight_transfer.py:240-268)
    """
    out: Dict = {}
    idx: Optional[np.ndarray] = None  # input-channel indices into src space

    # --- downsampling trunk ---------------------------------------------
    names = ["stem"] + [f"down{j}" for j in range(len(src_cfg.ds_channels) - 1)]
    for name, n_out in zip(names, dst_cfg.ds_channels):
        conv, idx2 = _transfer_conv(src_params[name]["conv"], n_out, idx)
        node = {"conv": conv}
        if "norm" in src_params[name]:
            node["norm"] = _transfer_norm(src_params[name]["norm"], idx2)
        out[name] = node
        idx = idx2

    block_in_idx = idx

    # --- inception blocks -------------------------------------------------
    for i, (sb, db) in enumerate(zip(src_cfg.blocks, dst_cfg.blocks)):
        sp = src_params[f"block{i}"]
        nb: Dict = {}
        for (bs, _, _), (bd, mid_d, _) in zip(sb.active_res, db.active_res):
            conv, mid_idx = _transfer_conv(sp[f"res{bs}_in"]["conv"], mid_d, block_in_idx)
            nb[f"res{bd}_in"] = {
                "conv": conv,
                "norm": _transfer_norm(sp[f"res{bs}_in"]["norm"], mid_idx),
            }
            conv_out, _ = _transfer_conv(
                sp[f"res{bs}_out"], db.dim, mid_idx, out_idx=block_in_idx
            )
            nb[f"res{bd}_out"] = conv_out
        for (bs, _, _), (bd, mid_d, _) in zip(sb.active_dw, db.active_dw):
            conv, mid_idx = _transfer_conv(sp[f"dw{bs}_in"]["conv"], mid_d, block_in_idx)
            nb[f"dw{bd}_in"] = {
                "conv": conv,
                "norm": _transfer_norm(sp[f"dw{bs}_in"]["norm"], mid_idx),
            }
            nb[f"dw{bd}_mid"] = {
                "conv": _transfer_dw_conv(sp[f"dw{bs}_mid"]["conv"], mid_idx),
                "norm": _transfer_norm(sp[f"dw{bs}_mid"]["norm"], mid_idx),
            }
            conv_out, _ = _transfer_conv(
                sp[f"dw{bs}_out"], db.dim, mid_idx, out_idx=block_in_idx
            )
            nb[f"dw{bd}_out"] = conv_out
        if "pw_norm" in sp:
            nb["pw_norm"] = _transfer_norm(sp["pw_norm"], block_in_idx)
        out[f"block{i}"] = nb

    # --- upsampling trunk --------------------------------------------------
    for j, n_out in enumerate(dst_cfg.us_channels):
        src_conv = src_params[f"up{j}_conv"]
        kernel = np.asarray(src_conv["kernel"])  # (kh, kw, in, out)
        kernel = kernel[:, :, idx, :]
        q = np.abs(kernel).sum(axis=(0, 1, 2))
        out_idx = _topk_desc(q, n_out)
        node = {"kernel": kernel[:, :, :, out_idx]}
        if "bias" in src_conv:
            node["bias"] = np.asarray(src_conv["bias"])[out_idx]
        out[f"up{j}_conv"] = node
        out[f"up{j}_norm"] = _transfer_norm(src_params[f"up{j}_norm"], out_idx)
        idx = out_idx

    # --- head: output channels are the image channels, only slice inputs ---
    head = {"kernel": np.asarray(src_params["head"]["kernel"])[:, :, idx, :]}
    if "bias" in src_params["head"]:
        head["bias"] = np.asarray(src_params["head"]["bias"])
    out["head"] = head
    return out
