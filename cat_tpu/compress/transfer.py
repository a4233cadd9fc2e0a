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
from cat_tpu.core.spade_config import SPADEGeneratorConfig


def _topk_desc(q: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest entries, in descending-value order
    (matches torch.topk)."""
    order = np.argsort(-q, kind="stable")
    return order[:k]


def _pair_branches(src_active, dst_active, what: str):
    """Match student branches to source branches by ORIGINAL branch index.

    Our configs keep pruned-away branches at their original positions
    (width 0), so module names (``res{i}_*`` / ``dw{i}_*``) carry the
    original index.  Zipping the *active* lists positionally — as the
    reference does over its compacted ModuleLists — would mis-pair
    branches whenever the student dropped a leading branch (e.g. teacher
    kernels (1, 3, 5) with student branch 0 pruned would write the 3x3
    teacher kernel into the student's 5x5 slot).  Match by index instead
    and assert the kernels agree."""
    src_kernels = {i: k for i, _, k in src_active}
    pairs = []
    for bd, cd, kd in dst_active:
        if bd not in src_kernels:
            raise KeyError(
                f"{what}: student branch {bd} (k={kd}) has no active "
                f"source branch to transfer from"
            )
        if src_kernels[bd] != kd:
            # explicit raise (not assert): this is the only check that the
            # paired teacher branch has the right kernel size, and it must
            # survive python -O
            raise ValueError(
                f"{what}: branch {bd} kernel mismatch — source k="
                f"{src_kernels[bd]} vs student k={kd}"
            )
        pairs.append((bd, bd, cd))
    return pairs


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
        for bs, bd, mid_d in _pair_branches(sb.active_res, db.active_res,
                                            f"block{i}.res"):
            conv, mid_idx = _transfer_conv(sp[f"res{bs}_in"]["conv"], mid_d, block_in_idx)
            nb[f"res{bd}_in"] = {
                "conv": conv,
                "norm": _transfer_norm(sp[f"res{bs}_in"]["norm"], mid_idx),
            }
            conv_out, _ = _transfer_conv(
                sp[f"res{bs}_out"], db.dim, mid_idx, out_idx=block_in_idx
            )
            nb[f"res{bd}_out"] = conv_out
        for bs, bd, mid_d in _pair_branches(sb.active_dw, db.active_dw,
                                            f"block{i}.dw"):
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


# ---------------------------------------------------------------------------
# SPADE (inception_spade) transfer
# ---------------------------------------------------------------------------


def _conv_node(src: Dict, n_out: int, in_idx, out_idx=None):
    """PlainConv / ConvNormActZ conv child: params live under 'conv'."""
    new, idx = _transfer_conv(src["conv"], n_out, in_idx, out_idx)
    return {"conv": new}, idx


def _transfer_spade_mlp(src: Dict, src_layer, dst_layer, idx: np.ndarray) -> Dict:
    """InceptionSPADE (the γ/β-producing net over the segmap).

    Reference transfer_InceptionSPADE (utils/weight_transfer.py:186-213):
    per branch, the first ConvSyncBNReLU is transferred with an identity
    input index (the segmap channels are shared) and a top-k output
    selection; the final conv maps the branch back to (γ‖β).

    Documented deviations from the reference, both in the direction of
    coherent math:
      * the reference slices the final conv's output rows with the block's
        input index alone (`transfer(layer1, layer2, idxs, input_index)`),
        which has length norm_nc — but that conv emits 2*norm_nc rows
        (γ concatenated with β), so torch silently assigns a wrong-shaped
        tensor.  We select the matching γ AND β rows:
        out_idx = [idx, idx + norm_nc_src].
      * inside dw branches we keep the first conv's top-k selection through
        the depthwise stage instead of re-selecting (same deviation as the
        inception path, see module docstring).
    """
    nb: Dict = {}
    assert len(idx) == dst_layer.norm_nc, (len(idx), dst_layer.norm_nc)
    out_idx = np.concatenate([idx, np.asarray(idx) + src_layer.norm_nc])
    for bs, bd, mid_d in _pair_branches(src_layer.active_res,
                                        dst_layer.active_res, "spade.res"):
        node, mid_idx = _conv_node(src[f"res{bs}_in"], mid_d, None)
        node["norm"] = _transfer_norm(src[f"res{bs}_in"]["norm"], mid_idx)
        nb[f"res{bd}_in"] = node
        conv, _ = _transfer_conv(src[f"res{bs}_out"], 2 * dst_layer.norm_nc,
                                 mid_idx, out_idx=out_idx)
        nb[f"res{bd}_out"] = conv
    for bs, bd, mid_d in _pair_branches(src_layer.active_dw,
                                        dst_layer.active_dw, "spade.dw"):
        node, mid_idx = _conv_node(src[f"dw{bs}_in"], mid_d, None)
        node["norm"] = _transfer_norm(src[f"dw{bs}_in"]["norm"], mid_idx)
        nb[f"dw{bd}_in"] = node
        mid = {"conv": _transfer_dw_conv(src[f"dw{bs}_mid"]["conv"], mid_idx)}
        if "norm" in src[f"dw{bs}_mid"]:
            mid["norm"] = _transfer_norm(src[f"dw{bs}_mid"]["norm"], mid_idx)
        nb[f"dw{bd}_mid"] = mid
        conv, _ = _transfer_conv(src[f"dw{bs}_out"], 2 * dst_layer.norm_nc,
                                 mid_idx, out_idx=out_idx)
        nb[f"dw{bd}_out"] = conv
    return nb


def _transfer_spade_block(src: Dict, src_b, dst_b, idx: np.ndarray):
    """SPADEInvertedResidualChannels (weight_transfer.py:151-183).

    The block's output index: the reference returns the learned shortcut's
    top-k selection when fin != fout and the input index otherwise — the
    next block's input slicing follows it.  Documented deviation: the
    reference's branch loops test `isinstance(layer, ConvBNReLU/nn.Conv2d)`
    against branches built from ConvSyncBNReLU/Conv wrappers, so they match
    nothing and the branch convs silently keep their fresh init; we
    transfer them with the same semantics as the non-SPADE block (first
    conv top-k mid selection, final conv rows aligned to the block's output
    index) — the coherent residual math."""
    assert src_b.learned_shortcut == dst_b.learned_shortcut
    assert len(idx) == dst_b.fin, (len(idx), dst_b.fin)
    nb: Dict = {}
    if not dst_b.is_empty:  # an empty block is shortcut-only (SPADEBlock)
        spade_node = _transfer_spade_mlp(src["spade"], src_b.spade,
                                         dst_b.spade, idx)
        if spade_node:  # an empty γ/β net owns no params
            nb["spade"] = spade_node
    if src_b.learned_shortcut:
        nb["shortcut_norm"] = _transfer_norm(src["shortcut_norm"], idx)
        node, out_idx = _conv_node(src["shortcut_conv"], dst_b.fout, idx)
        nb["shortcut_conv"] = node
    else:
        out_idx = idx
    for bs, bd, mid_d in _pair_branches(src_b.active_res, dst_b.active_res,
                                        "block.res"):
        node, mid_idx = _conv_node(src[f"res{bs}_in"], mid_d, idx)
        node["norm"] = _transfer_norm(src[f"res{bs}_in"]["norm"], mid_idx)
        nb[f"res{bd}_in"] = node
        conv_out, _ = _conv_node(src[f"res{bs}_out"], dst_b.fout, mid_idx,
                                 out_idx=out_idx)
        nb[f"res{bd}_out"] = conv_out
    for bs, bd, mid_d in _pair_branches(src_b.active_dw, dst_b.active_dw,
                                        "block.dw"):
        node, mid_idx = _conv_node(src[f"dw{bs}_in"], mid_d, idx)
        node["norm"] = _transfer_norm(src[f"dw{bs}_in"]["norm"], mid_idx)
        nb[f"dw{bd}_in"] = node
        mid = {"conv": _transfer_dw_conv(src[f"dw{bs}_mid"]["conv"], mid_idx)}
        if "norm" in src[f"dw{bs}_mid"]:
            mid["norm"] = _transfer_norm(src[f"dw{bs}_mid"]["norm"], mid_idx)
        nb[f"dw{bd}_mid"] = mid
        conv_out, _ = _conv_node(src[f"dw{bs}_out"], dst_b.fout, mid_idx,
                                 out_idx=out_idx)
        nb[f"dw{bd}_out"] = conv_out
    return nb, out_idx


def transfer_spade_generator_params(
    src_params: Dict,
    src_cfg: SPADEGeneratorConfig,
    dst_cfg: SPADEGeneratorConfig,
) -> Dict:
    """Build SPADE-student params from a wider pretrained generator.

    Reference: load_pretrained_weight's 'inception_spade' chain
    (utils/weight_transfer.py:262-288): fc -> fc_norm -> head_0 ->
    G_middle_0/1 -> up_0..3 [-> up_4] -> conv_img, the selected channel
    index threading block to block.  Consumed by --restore_pretrained_G_path
    (spade_distiller_modules.py:33-46).  Params only — norm running stats
    keep their fresh init, matching transfer_Norm (weight_transfer.py:83-94).
    """
    assert src_cfg.num_upsampling_layers == dst_cfg.num_upsampling_layers
    assert src_cfg.semantic_nc == dst_cfg.semantic_nc
    out: Dict = {}
    fc, idx = _transfer_conv(src_params["fc"], dst_cfg.fc_channels, None)
    out["fc"] = fc
    out["fc_norm"] = _transfer_norm(src_params["fc_norm"], idx)
    for name, src_b, dst_b in zip(src_cfg.block_names, src_cfg.blocks,
                                  dst_cfg.blocks):
        node, idx = _transfer_spade_block(src_params[name], src_b, dst_b, idx)
        if node:  # identity block (empty, fin == fout) owns no params
            out[name] = node
    img = {"kernel": np.asarray(src_params["conv_img"]["kernel"])[:, :, idx, :]}
    if "bias" in src_params["conv_img"]:
        img["bias"] = np.asarray(src_params["conv_img"]["bias"])
    out["conv_img"] = img
    return out
