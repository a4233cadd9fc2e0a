"""Import reference (PyTorch) SPADE generator checkpoints.

Reference layout (models/modules/inception_modules.py:345-769,
inception_architecture/inception_spade_generator.py):

  fc / fc_norm / conv_img
  <block>.res_ops.{j} = [ConvSyncBNReLU(conv,norm), Conv(conv)]
  <block>.dw_ops.{j}  = [ConvSyncBNReLU, ConvSyncBNReLU(depthwise), Conv]
  <block>.shortcut    = [norm, Conv]           (when fin != fout)
  <block>.spade.param_free_norm                (affine-free, stats only)
  <block>.spade.res_ops.{j} = [ConvSyncBNReLU, nn.Conv2d]
  <block>.spade.dw_ops.{j}  = [ConvSyncBNReLU, ConvSyncBNReLU(dw), nn.Conv2d]

As with the ResNet importer, the architecture is recovered from tensor
shapes (pruned students included — utils/common.py:183-312), kernels
transpose OIHW->HWIO, norms split into params (scale/bias) and batch_stats
(mean/var).  ``num_upsampling_layers`` cannot be inferred from weights
(it moves an upsample, reference generator :84-87) and must be supplied.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from cat_tpu.core.spade_config import (
    SPADEBlockConfig,
    SPADEGeneratorConfig,
    SPADELayerConfig,
    spade_block_names,
)


def _np(v) -> np.ndarray:
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _conv(sd, key):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    p = {}
    s = {}
    if f"{key}.weight" in sd:
        p = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    if f"{key}.running_mean" in sd:
        s = {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])}
    return p or None, s or None


def _branch_spec(sd, prefix, first_conv_sub):
    """(channels, kernels) for res/dw branch lists under ``prefix``."""
    chans, kerns = [], []
    j = 0
    while f"{prefix}.{j}.{first_conv_sub}.weight" in sd:
        w = _np(sd[f"{prefix}.{j}.{first_conv_sub}.weight"])
        chans.append(int(w.shape[0]))
        kerns.append(int(w.shape[2]))
        j += 1
    return tuple(chans), tuple(kerns)


def recover_spade_config(
    sd: Dict[str, Any],
    num_upsampling_layers: str = "more",
    crop_size: int = 512,
    aspect_ratio: float = 2.0,
    param_free_norm: str = "syncbatch",
    spectral: bool = False,
) -> SPADEGeneratorConfig:
    fc = int(_np(sd["fc.weight"]).shape[0])
    semantic_nc = int(_np(sd["fc.weight"]).shape[1])
    names = spade_block_names(num_upsampling_layers)
    blocks = []
    f = fc
    for name in names:
        fin = f
        fout = f // 2 if name.startswith("up") else f
        f = fout
        # block branches: first conv of res_ops.{j} is [0].conv; depthwise
        # middle conv ([1].conv) carries the kernel size for dw branches
        res_c, res_k = _branch_spec(sd, f"{name}.res_ops", "0.conv")
        _, res_k2 = _branch_spec(sd, f"{name}.res_ops", "1.conv")
        if res_k2:
            res_k = res_k2  # the second conv kernel equals the branch kernel
        dw_c, _ = _branch_spec(sd, f"{name}.dw_ops", "0.conv")
        _, dw_k = _branch_spec(sd, f"{name}.dw_ops", "1.conv")
        sp_res_c, _ = _branch_spec(sd, f"{name}.spade.res_ops", "0.conv")
        _, sp_res_k = _branch_spec(sd, f"{name}.spade.res_ops", "1")
        sp_dw_c, _ = _branch_spec(sd, f"{name}.spade.dw_ops", "0.conv")
        _, sp_dw_k = _branch_spec(sd, f"{name}.spade.dw_ops", "1.conv")
        blocks.append(
            SPADEBlockConfig(
                fin=fin, fout=fout,
                res_channels=res_c, dw_channels=dw_c,
                res_kernels=res_k, dw_kernels=dw_k,
                spade=SPADELayerConfig(
                    norm_nc=fin, label_nc=semantic_nc,
                    res_channels=sp_res_c, dw_channels=sp_dw_c,
                    res_kernels=sp_res_k, dw_kernels=sp_dw_k,
                    param_free_norm=param_free_norm,
                ),
                spectral=spectral,
            )
        )
    return SPADEGeneratorConfig(
        semantic_nc=semantic_nc,
        fc_channels=fc,
        num_upsampling_layers=num_upsampling_layers,
        crop_size=crop_size,
        aspect_ratio=aspect_ratio,
        blocks=tuple(blocks),
        param_free_norm=param_free_norm,
        spectral=spectral,
    )


def import_spade_generator(
    sd: Dict[str, Any],
    cfg: Optional[SPADEGeneratorConfig] = None,
    **cfg_kwargs,
) -> Tuple[SPADEGeneratorConfig, Dict]:
    if cfg is None:
        cfg = recover_spade_config(sd, **cfg_kwargs)
    params: Dict[str, Any] = {}
    bstats: Dict[str, Any] = {}

    params["fc"] = _conv(sd, "fc")
    p, s = _norm(sd, "fc_norm")
    if p:
        params["fc_norm"] = p
    if s:
        bstats["fc_norm"] = s

    for name, bcfg in zip(cfg.block_names, cfg.blocks):
        nb: Dict[str, Any] = {}
        nbs: Dict[str, Any] = {}

        def add_cna(flax_name, conv_key, norm_key):
            nb[flax_name] = {"conv": _conv(sd, conv_key)}
            p, s = _norm(sd, norm_key)
            if p:
                nb[flax_name]["norm"] = p
            if s:
                nbs[flax_name] = {"norm": s}

        for pos, (b, _, _) in enumerate(bcfg.active_res):
            add_cna(f"res{b}_in", f"{name}.res_ops.{pos}.0.conv",
                    f"{name}.res_ops.{pos}.0.norm")
            nb[f"res{b}_out"] = {"conv": _conv(sd, f"{name}.res_ops.{pos}.1.conv")}
        for pos, (b, _, _) in enumerate(bcfg.active_dw):
            add_cna(f"dw{b}_in", f"{name}.dw_ops.{pos}.0.conv",
                    f"{name}.dw_ops.{pos}.0.norm")
            add_cna(f"dw{b}_mid", f"{name}.dw_ops.{pos}.1.conv",
                    f"{name}.dw_ops.{pos}.1.norm")
            nb[f"dw{b}_out"] = {"conv": _conv(sd, f"{name}.dw_ops.{pos}.2.conv")}
        if bcfg.learned_shortcut and f"{name}.shortcut.1.conv.weight" in sd:
            p, s = _norm(sd, f"{name}.shortcut.0")
            if p:
                nb["shortcut_norm"] = p
            if s:
                nbs["shortcut_norm"] = s
            nb["shortcut_conv"] = {"conv": _conv(sd, f"{name}.shortcut.1.conv")}

        # nested SPADE layer
        sp: Dict[str, Any] = {}
        sps: Dict[str, Any] = {}
        p, s = _norm(sd, f"{name}.spade.param_free_norm")
        if s:
            sps["param_free_norm"] = s
        for pos, (b, _, _) in enumerate(bcfg.spade.active_res):
            sp[f"res{b}_in"] = {"conv": _conv(sd, f"{name}.spade.res_ops.{pos}.0.conv")}
            pp, ss = _norm(sd, f"{name}.spade.res_ops.{pos}.0.norm")
            if pp:
                sp[f"res{b}_in"]["norm"] = pp
            if ss:
                sps[f"res{b}_in"] = {"norm": ss}
            sp[f"res{b}_out"] = _conv(sd, f"{name}.spade.res_ops.{pos}.1")
        for pos, (b, _, _) in enumerate(bcfg.spade.active_dw):
            sp[f"dw{b}_in"] = {"conv": _conv(sd, f"{name}.spade.dw_ops.{pos}.0.conv")}
            pp, ss = _norm(sd, f"{name}.spade.dw_ops.{pos}.0.norm")
            if pp:
                sp[f"dw{b}_in"]["norm"] = pp
            if ss:
                sps[f"dw{b}_in"] = {"norm": ss}
            sp[f"dw{b}_mid"] = {"conv": _conv(sd, f"{name}.spade.dw_ops.{pos}.1.conv")}
            pp, ss = _norm(sd, f"{name}.spade.dw_ops.{pos}.1.norm")
            if pp:
                sp[f"dw{b}_mid"]["norm"] = pp
            if ss:
                sps[f"dw{b}_mid"] = {"norm": ss}
            sp[f"dw{b}_out"] = _conv(sd, f"{name}.spade.dw_ops.{pos}.2")
        if sp:
            nb["spade"] = sp
        if sps:
            nbs["spade"] = sps
        params[name] = nb
        if nbs:
            bstats[name] = nbs

    params["conv_img"] = _conv(sd, "conv_img")
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    return cfg, variables


def load_torch_spade_generator(path: str, **kwargs):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_spade_generator(sd, **kwargs)
