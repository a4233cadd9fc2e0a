"""Analytic MAC/param counting vs golden numbers extracted from the
reference's hook-based profiler (utils/model_profiling.py), run once on CPU.
"""

import dataclasses

from cat_tpu.core.config import (
    InceptionBlockConfig,
    InceptionGeneratorConfig,
    NormConfig,
)
from cat_tpu.compress.profiling import profile_generator


def test_horse2zebra_teacher_macs():
    cfg = InceptionGeneratorConfig.make(
        ngf=64,
        channels=None,
        channels_reduction_factor=6,
        kernel_sizes=(1, 3, 5),
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )
    prof = profile_generator(cfg, 256, 256)
    assert prof.macs == 43_527_405_568
    assert prof.params == 8_154_255


def test_cityscapes_teacher_macs_batchnorm_tracked():
    cfg = InceptionGeneratorConfig.make(
        ngf=64,
        channels=None,
        channels_reduction_factor=6,
        kernel_sizes=(1, 3, 5),
        norm=NormConfig(kind="batch", affine=True, track_running_stats=True),
    )
    prof = profile_generator(cfg, 256, 256)
    assert prof.macs == 43_490_402_304
    assert prof.params == 8_123_697


def tiny_cfg(norm=None):
    return InceptionGeneratorConfig.make(
        ngf=8,
        channels=None,
        channels_reduction_factor=2,
        kernel_sizes=(1, 3),
        n_blocks=3,
        norm=norm
        or NormConfig(kind="instance", affine=True, track_running_stats=False),
    )


def test_tiny_macs():
    prof = profile_generator(tiny_cfg(), 64, 64)
    assert prof.macs == 31_195_136
    assert prof.params == 52_899


def test_pruned_nonuniform_macs():
    base = tiny_cfg()
    blocks = []
    branch_cfg = [([3, 0], [0, 5]), ([2, 4], [1, 0]), ([0, 0], [0, 0])]
    for res, dw in branch_cfg:
        blocks.append(
            InceptionBlockConfig(
                dim=17,
                res_channels=tuple(res),
                dw_channels=tuple(dw),
                res_kernels=(1, 3),
                dw_kernels=(1, 3),
            )
        )
    cfg = dataclasses.replace(
        base, ds_channels=(5, 9, 17), us_channels=(9, 6), blocks=tuple(blocks)
    )
    prof = profile_generator(cfg, 64, 64)
    assert prof.macs == 11_293_952
    assert prof.params == 7_263


def test_sections_sum_to_total():
    prof = profile_generator(tiny_cfg(), 64, 64)
    assert sum(prof.sections.values()) == prof.macs
    assert set(prof.sections) == {"down_sampling", "features", "up_sampling"}
