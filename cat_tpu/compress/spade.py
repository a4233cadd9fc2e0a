"""SPADE generator: analytic profiling and FLOPs-targeted shrink.

Reference: utils/common.py:710-869 (shrink_spade_model) and
utils/model_profiling.py (SPADE accumulation 170-204).

Profiling parity notes: every norm in the SPADE stack is a running-stats
sync-batch-norm, which the reference counts as 0 MACs / 0 params
(model_profiling.py:116-125), so SPADE MACs are the convs only.

Shrink parity notes (utils/common.py:734-821):
  * the trunk width (fc_norm) is pruned in multiples of 16 (32 for
    ``num_upsampling_layers == 'most'``) with the prune_cin_lb/ub bounds
    applied to the multiple count,
  * per-block branch widths and the nested SPADE branch widths threshold
    independently with no floor,
  * block fin/fout follow the trunk: f, f, f, f/2, f/4, ... — the rebuild is
    architecture-only; student weights are freshly initialised
    (shrink_spade_model re-init semantics).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from cat_tpu.compress.shrink import PruneBounds
from cat_tpu.core.spade_config import (
    SPADEBlockConfig,
    SPADEGeneratorConfig,
    SPADELayerConfig,
)


# ---------------------------------------------------------------------------
# analytic profiling
# ---------------------------------------------------------------------------


def _conv_macs(cin, cout, k, h, w, groups=1):
    return cin * cout * k * k * h * w // groups


def _conv_params(cin, cout, k, groups=1, bias=True):
    return cin * cout * k * k // groups + (cout if bias else 0)


def profile_spade_block(cfg: SPADEBlockConfig, h: int, w: int) -> Tuple[int, int]:
    macs = params = 0
    if cfg.is_empty:
        if cfg.learned_shortcut:
            macs += _conv_macs(cfg.fin, cfg.fout, 1, h, w)
            params += _conv_params(cfg.fin, cfg.fout, 1, bias=False)
        return macs, params
    # SPADE layer: branches over the segmap at (h, w), two outputs (γ, β)
    sp = cfg.spade
    for _, mid, k in sp.active_res:
        macs += _conv_macs(sp.label_nc, mid, k, h, w)
        params += _conv_params(sp.label_nc, mid, k)
        macs += _conv_macs(mid, 2 * sp.norm_nc, k, h, w)
        params += _conv_params(mid, 2 * sp.norm_nc, k)
    for _, mid, k in sp.active_dw:
        macs += _conv_macs(sp.label_nc, mid, 1, h, w)
        params += _conv_params(sp.label_nc, mid, 1)
        macs += _conv_macs(mid, mid, k, h, w, groups=mid)
        params += _conv_params(mid, mid, k, groups=mid)
        macs += _conv_macs(mid, 2 * sp.norm_nc, 1, h, w)
        params += _conv_params(mid, 2 * sp.norm_nc, 1)
    # block branches
    for _, mid, k in cfg.active_res:
        macs += _conv_macs(cfg.fin, mid, k, h, w)
        params += _conv_params(cfg.fin, mid, k)
        macs += _conv_macs(mid, cfg.fout, k, h, w)
        params += _conv_params(mid, cfg.fout, k)
    for _, mid, k in cfg.active_dw:
        macs += _conv_macs(cfg.fin, mid, 1, h, w)
        params += _conv_params(cfg.fin, mid, 1)
        macs += _conv_macs(mid, mid, k, h, w, groups=mid)
        params += _conv_params(mid, mid, k, groups=mid)
        macs += _conv_macs(mid, cfg.fout, 1, h, w)
        params += _conv_params(mid, cfg.fout, 1)
    if cfg.learned_shortcut:
        macs += _conv_macs(cfg.fin, cfg.fout, 1, h, w)
        params += _conv_params(cfg.fin, cfg.fout, 1, bias=False)
    return macs, params


def profile_spade_generator(cfg: SPADEGeneratorConfig, height: int, width: int):
    """MACs/params at a given segmap size (batch 1)."""
    from cat_tpu.compress.profiling import GeneratorProfile

    prof = GeneratorProfile()
    sh, sw = cfg.latent_size()
    prof.add("fc", _conv_macs(cfg.semantic_nc, cfg.fc_channels, 3, sh, sw),
             _conv_params(cfg.semantic_nc, cfg.fc_channels, 3))
    # fc_norm is affine+tracked => 0 MACs/params (reference convention)
    h, w = sh, sw
    up_between = {"G_middle_0", "up_0", "up_1", "up_2", "up_3", "up_4"}
    if cfg.num_upsampling_layers in ("more", "most"):
        up_between.add("G_middle_1")
    for name, bcfg in zip(cfg.block_names, cfg.blocks):
        if name in up_between:
            h, w = h * 2, w * 2
        m, p = profile_spade_block(bcfg, h, w)
        prof.add(name, m, p)
    prof.add("conv_img", _conv_macs(cfg.blocks[-1].fout, cfg.output_nc, 3, h, w),
             _conv_params(cfg.blocks[-1].fout, cfg.output_nc, 3))
    return prof


# ---------------------------------------------------------------------------
# gamma collection
# ---------------------------------------------------------------------------


@dataclass
class SpadeBlockGammas:
    res: List[np.ndarray]
    dw: List[np.ndarray]
    sp_res: List[np.ndarray]
    sp_dw: List[np.ndarray]


@dataclass
class SpadeGammas:
    fc: np.ndarray
    blocks: List[SpadeBlockGammas]

    def concat(self) -> np.ndarray:
        parts = [self.fc]
        for b in self.blocks:
            parts.extend(b.res + b.dw + b.sp_res + b.sp_dw)
        return np.concatenate(parts)


def collect_spade_gammas(params: Dict, cfg: SPADEGeneratorConfig) -> SpadeGammas:
    """|scale| of fc_norm + block first norms + nested SPADE first norms
    (reference utils/prune.py:17-37 with spade=True)."""

    def g(*path):
        node = params
        for p in path:
            node = node[p]
        return np.abs(np.asarray(node["scale"], np.float64))

    fc = g("fc_norm")
    blocks = []
    for name, bcfg in zip(cfg.block_names, cfg.blocks):
        bp = params[name]
        blocks.append(
            SpadeBlockGammas(
                res=[g(name, f"res{b}_in", "norm") for b, _, _ in bcfg.active_res],
                dw=[g(name, f"dw{b}_in", "norm") for b, _, _ in bcfg.active_dw],
                sp_res=[
                    g(name, "spade", f"res{b}_in", "norm")
                    for b, _, _ in bcfg.spade.active_res
                ],
                sp_dw=[
                    g(name, "spade", f"dw{b}_in", "norm")
                    for b, _, _ in bcfg.spade.active_dw
                ],
            )
        )
    return SpadeGammas(fc=fc, blocks=blocks)


# ---------------------------------------------------------------------------
# shrink
# ---------------------------------------------------------------------------


@dataclass
class SpadeShrinkResult:
    config: SPADEGeneratorConfig
    threshold: float
    searched_macs: int


def _spade_candidate(
    cfg: SPADEGeneratorConfig, g: SpadeGammas, t: float, bounds: PruneBounds
) -> SPADEGeneratorConfig:
    ch_div = 32 if cfg.num_upsampling_layers == "most" else 16
    count = int((g.fc > t).sum())
    out = max(count // ch_div, bounds.cin_lb) * ch_div
    if bounds.cin_ub is not None:
        out = min(out // ch_div, bounds.cin_ub) * ch_div
    fc = out

    new_blocks = []
    f = fc
    for name, bcfg, bg in zip(cfg.block_names, cfg.blocks, g.blocks):
        fin = f
        fout = f // 2 if name.startswith("up") else f
        f = fout

        def remap(active, counts, full):
            vals = list(full)
            for (b, _, _), c in zip(active, counts):
                vals[b] = c
            return tuple(vals)

        res = remap(bcfg.active_res, [int((x > t).sum()) for x in bg.res],
                    bcfg.res_channels)
        dw = remap(bcfg.active_dw, [int((x > t).sum()) for x in bg.dw],
                   bcfg.dw_channels)
        sp_res = remap(bcfg.spade.active_res,
                       [int((x > t).sum()) for x in bg.sp_res],
                       bcfg.spade.res_channels)
        sp_dw = remap(bcfg.spade.active_dw,
                      [int((x > t).sum()) for x in bg.sp_dw],
                      bcfg.spade.dw_channels)
        new_blocks.append(
            dataclasses.replace(
                bcfg,
                fin=fin,
                fout=fout,
                res_channels=res,
                dw_channels=dw,
                spade=dataclasses.replace(
                    bcfg.spade, norm_nc=fin, res_channels=sp_res, dw_channels=sp_dw
                ),
            )
        )
    return dataclasses.replace(cfg, fc_channels=fc, blocks=tuple(new_blocks))


def shrink_spade_generator(
    cfg: SPADEGeneratorConfig,
    variables: Dict,
    target_macs: float,
    height: int,
    width: int,
    bounds: PruneBounds = PruneBounds(),
) -> SpadeShrinkResult:
    """Threshold search over sorted unique |scale| values (same limiting
    result as the reference's float binary search, computed exactly).
    Architecture-only: the caller freshly initialises the student."""
    g = collect_spade_gammas(variables["params"], cfg)
    values = np.unique(g.concat())

    def macs(t: float) -> int:
        return profile_spade_generator(_spade_candidate(cfg, g, t, bounds),
                                       height, width).macs

    if macs(float(values[-1])) > target_macs:
        raise ValueError(
            f"target_macs={target_macs:g} unreachable (floor leaves "
            f"{macs(float(values[-1])):,} MACs)"
        )
    lo, hi = 0, values.size - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if macs(float(values[mid])) <= target_macs:
            hi = mid
        else:
            lo = mid + 1
    t = float(values[lo])
    student = _spade_candidate(cfg, g, t, bounds)
    return SpadeShrinkResult(
        config=student,
        threshold=t,
        searched_macs=profile_spade_generator(student, height, width).macs,
    )
