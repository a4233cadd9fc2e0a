"""Collection of prunable norm-scale vectors from a generator's param tree.

The channel-pruning signal is |scale| of:
  * every norm in the downsampling trunk (stem + down{j}),
  * the *first* norm of every inception-block branch
    (block{i}/res{b}_in/norm, block{i}/dw{b}_in/norm),
  * every norm in the upsampling trunk (up{j}_norm).

(reference: utils/prune.py:5-61 + utils/common.py:330-343)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from cat_tpu.core.config import InceptionGeneratorConfig


def _gamma(params: Dict, *path: str) -> np.ndarray:
    node = params
    for p in path:
        node = node[p]
    return np.abs(np.asarray(node["scale"], dtype=np.float64))


@dataclass
class BlockGammas:
    res: List[np.ndarray]  # |scale| per active res branch (config order)
    dw: List[np.ndarray]


@dataclass
class PruneGammas:
    """All prunable |scale| vectors, in the reference's concatenation order."""

    ds: List[np.ndarray]
    blocks: List[BlockGammas]
    us: List[np.ndarray]

    def concat(self) -> np.ndarray:
        parts = list(self.ds)
        for b in self.blocks:
            parts.extend(b.res)
            parts.extend(b.dw)
        parts.extend(self.us)
        return np.concatenate(parts) if parts else np.zeros((0,))


def collect_prune_gammas(
    params: Dict, cfg: InceptionGeneratorConfig
) -> PruneGammas:
    if not cfg.norm.has_scale:
        raise ValueError(
            "channel pruning requires affine norm layers (γ scaling factors); "
            f"got norm={cfg.norm}"
        )
    ds = [_gamma(params, "stem", "norm")]
    for j in range(len(cfg.ds_channels) - 1):
        ds.append(_gamma(params, f"down{j}", "norm"))
    blocks = []
    for i, bcfg in enumerate(cfg.blocks):
        res = [
            _gamma(params, f"block{i}", f"res{b}_in", "norm")
            for b, _, _ in bcfg.active_res
        ]
        dw = [
            _gamma(params, f"block{i}", f"dw{b}_in", "norm")
            for b, _, _ in bcfg.active_dw
        ]
        blocks.append(BlockGammas(res=res, dw=dw))
    us = [_gamma(params, f"up{j}_norm") for j in range(len(cfg.us_channels))]
    return PruneGammas(ds=ds, blocks=blocks, us=us)
