"""Import reference (PyTorch) generator checkpoints.

The reference stores plain ``state_dict`` .pth files and reconstructs pruned
architectures from tensor shapes (utils/common.py:49-180).  This module does
the same shape-driven recovery and emits a (config, variables) pair for the
TPU-native generator — so teachers/students trained with the reference can
be evaluated or distilled here without retraining.

Layout conversions (verified numerically against torch):
  conv       OIHW (out,in,kh,kw)        -> HWIO kernel.transpose(2,3,1,0)
  depthwise  (ch,1,kh,kw), groups=ch    -> (kh,kw,1,ch)  same transpose
  convT      (in,out,kh,kw)             -> flip kh,kw then transpose(2,3,0,1)
             (torch ConvTranspose2d == input-dilated conv with flipped
              kernel and padding (k-1-p, k-1-p+output_padding); see
              cat_tpu.ops.nn.ConvTranspose2d)
  norm       weight/bias -> scale/bias; running stats -> batch_stats
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from cat_tpu.core.config import (
    InceptionBlockConfig,
    InceptionGeneratorConfig,
    NormConfig,
)


def _np(v) -> np.ndarray:
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _convt(sd, key) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])[:, :, ::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key) -> Tuple[Optional[Dict], Optional[Dict]]:
    params = {}
    stats = {}
    if f"{key}.weight" in sd:
        params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    if f"{key}.running_mean" in sd:
        stats = {
            "mean": _np(sd[f"{key}.running_mean"]),
            "var": _np(sd[f"{key}.running_var"]),
        }
    return (params or None), (stats or None)


def recover_generator_config(
    sd: Dict[str, Any],
    input_nc: int = 3,
    output_nc: int = 3,
    norm: NormConfig = NormConfig(kind="instance", affine=True),
    n_ds: int = 3,
    n_blocks: Optional[int] = None,
    padding_type: str = "reflect",
    active_fn: str = "relu",
    dropout_rate: float = 0.0,
) -> InceptionGeneratorConfig:
    """Architecture from checkpoint tensor shapes (reference
    utils/common.py:60-140: branch widths/kernels read off conv weights)."""
    ds = [int(_np(sd[f"down_sampling.{1 + 3 * j}.weight"]).shape[0]) for j in range(n_ds)]
    us_names = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"up_sampling\.(\d+)\.weight", k))
        }
    )
    # transposed convs come in (convT, norm, relu) triples; the final conv is
    # the head
    n_us = (len(us_names) - 1) // 2
    us = [int(_np(sd[f"up_sampling.{3 * j}.weight"]).shape[1]) for j in range(n_us)]

    if n_blocks is None:
        feat_ids = {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"features\.(\d+)\.", k))
        }
        n_blocks = (max(feat_ids) + 1) if feat_ids else 0

    blocks = []
    for i in range(n_blocks):
        res_c, res_k, dw_c, dw_k = [], [], [], []
        j = 0
        while f"features.{i}.res_ops.{j}.1.0.weight" in sd:
            w = _np(sd[f"features.{i}.res_ops.{j}.1.0.weight"])
            res_c.append(int(w.shape[0]))
            res_k.append(int(w.shape[2]))
            j += 1
        j = 0
        while f"features.{i}.dw_ops.{j}.2.0.weight" in sd:
            w = _np(sd[f"features.{i}.dw_ops.{j}.2.0.weight"])
            dw_c.append(int(w.shape[0]))
            dw_k.append(int(w.shape[2]))
            j += 1
        blocks.append(
            InceptionBlockConfig(
                dim=ds[-1],
                res_channels=tuple(res_c),
                dw_channels=tuple(dw_c),
                res_kernels=tuple(res_k),
                dw_kernels=tuple(dw_k),
            )
        )
    return InceptionGeneratorConfig(
        input_nc=input_nc,
        output_nc=output_nc,
        ds_channels=tuple(ds),
        us_channels=tuple(us),
        blocks=tuple(blocks),
        norm=norm,
        padding_type=padding_type,
        active_fn=active_fn,
        dropout_rate=dropout_rate,
    )


def import_inception_generator(
    sd: Dict[str, Any],
    cfg: Optional[InceptionGeneratorConfig] = None,
    **cfg_kwargs,
) -> Tuple[InceptionGeneratorConfig, Dict]:
    """(config, variables) from a reference generator state_dict."""
    if cfg is None:
        cfg = recover_generator_config(sd, **cfg_kwargs)
    params: Dict[str, Any] = {}
    bstats: Dict[str, Any] = {}

    def put(name, conv, norm_key):
        node = {"conv": conv}
        p, s = _norm(sd, norm_key)
        if p:
            node["norm"] = p
        if s:
            bstats.setdefault(name, {})["norm"] = s
        params[name] = node

    # downsampling trunk
    put("stem", _conv(sd, "down_sampling.1"), "down_sampling.2")
    for j in range(len(cfg.ds_channels) - 1):
        put(f"down{j}", _conv(sd, f"down_sampling.{4 + 3 * j}"), f"down_sampling.{5 + 3 * j}")

    # blocks: torch indexes branches by position among *existing* ops; config
    # recovered from the same checkpoint lists exactly the existing branches
    for i, bcfg in enumerate(cfg.blocks):
        nb: Dict[str, Any] = {}
        nbs: Dict[str, Any] = {}
        for pos, (b, _, _) in enumerate(bcfg.active_res):
            key = f"features.{i}.res_ops.{pos}"
            nb[f"res{b}_in"] = {"conv": _conv(sd, f"{key}.1.0")}
            p, s = _norm(sd, f"{key}.1.1")
            if p:
                nb[f"res{b}_in"]["norm"] = p
            if s:
                nbs[f"res{b}_in"] = {"norm": s}
            nb[f"res{b}_out"] = _conv(sd, f"{key}.4")
        for pos, (b, _, _) in enumerate(bcfg.active_dw):
            key = f"features.{i}.dw_ops.{pos}"
            nb[f"dw{b}_in"] = {"conv": _conv(sd, f"{key}.0.0")}
            p, s = _norm(sd, f"{key}.0.1")
            if p:
                nb[f"dw{b}_in"]["norm"] = p
            if s:
                nbs[f"dw{b}_in"] = {"norm": s}
            nb[f"dw{b}_mid"] = {"conv": _conv(sd, f"{key}.2.0")}
            p, s = _norm(sd, f"{key}.2.1")
            if p:
                nb[f"dw{b}_mid"]["norm"] = p
            if s:
                nbs[f"dw{b}_mid"] = {"norm": s}
            nb[f"dw{b}_out"] = _conv(sd, f"{key}.4")
        p, s = _norm(sd, f"features.{i}.pw_bn")
        if p:
            nb["pw_norm"] = p
        if s:
            nbs["pw_norm"] = s
        if nb:
            params[f"block{i}"] = nb
        if nbs:
            bstats[f"block{i}"] = nbs

    # upsampling trunk + head
    for j in range(len(cfg.us_channels)):
        params[f"up{j}_conv"] = _convt(sd, f"up_sampling.{3 * j}")
        p, s = _norm(sd, f"up_sampling.{3 * j + 1}")
        if p:
            params[f"up{j}_norm"] = p
        if s:
            bstats[f"up{j}_norm"] = s
    head_idx = 3 * len(cfg.us_channels) + 1
    params["head"] = _conv(sd, f"up_sampling.{head_idx}")

    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    return cfg, variables


def load_torch_generator(path: str, **kwargs) -> Tuple[InceptionGeneratorConfig, Dict]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_inception_generator(sd, **kwargs)
