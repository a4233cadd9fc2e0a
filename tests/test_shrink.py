"""Pruning: gamma collection, FLOPs-targeted search, param slicing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.compress.profiling import profile_generator
from cat_tpu.compress.prune import collect_prune_gammas
from cat_tpu.compress.shrink import (
    PruneBounds,
    _final_masks,
    shrink_generator,
)
from cat_tpu.models.generator import InceptionGenerator


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


def init_gen(cfg, seed=0, size=32):
    # zero-XLA init (conftest.fast_init): shrink only reads shapes and the
    # norm scales (randomized below); the threefry stream is irrelevant here
    from tests.conftest import fast_init

    model = InceptionGenerator(cfg)
    variables = fast_init(model, jnp.zeros((1, size, size, 3)), seed=seed)
    return model, variables


def randomize_scales(variables, rng):
    """Spread norm scales so thresholds discriminate (training surrogate)."""

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "scale":
                out[k] = jnp.asarray(
                    rng.uniform(0.05, 2.0, size=np.asarray(v).shape), jnp.float32
                )
            else:
                out[k] = v
        return out

    return {**variables, "params": walk(variables["params"])}


def test_gamma_collection_order_and_sizes():
    cfg = tiny_cfg()
    _, variables = init_gen(cfg)
    g = collect_prune_gammas(variables["params"], cfg)
    assert [len(x) for x in g.ds] == [8, 16, 32]
    assert [len(x) for x in g.us] == [16, 8]
    assert len(g.blocks) == 3
    for bg in g.blocks:
        assert [len(x) for x in bg.res] == [16, 16]
        assert [len(x) for x in bg.dw] == [16, 16]
    # concatenation covers every prunable scale exactly once
    total = sum(len(x) for x in g.ds) + sum(len(x) for x in g.us)
    total += sum(sum(len(x) for x in bg.res + bg.dw) for bg in g.blocks)
    assert g.concat().shape == (total,)


def test_final_masks_floors():
    cfg = tiny_cfg()
    _, variables = init_gen(cfg)
    rng = np.random.RandomState(0)
    variables = randomize_scales(variables, rng)
    g = collect_prune_gammas(variables["params"], cfg)
    t = float(np.median(g.concat()))
    bounds = PruneBounds(cin_lb=4, ft_cin_lb=6)
    masks = _final_masks(g, t, bounds)
    for m in masks.ds:
        assert m.sum() >= 4
    assert masks.ds[-1].sum() >= 6
    for m in masks.us:
        assert m.sum() >= 4
    # block branch masks have no floor: strict threshold
    for bres, gam in zip(masks.block_res[0], g.blocks[0].res):
        assert bres.sum() == (gam > t).sum()


def test_shrink_end_to_end():
    cfg = tiny_cfg()
    _, variables = init_gen(cfg)
    rng = np.random.RandomState(1)
    variables = randomize_scales(variables, rng)
    full = profile_generator(cfg, 32, 32).macs
    target = full * 0.5
    res = shrink_generator(cfg, variables, target, 32, 32, PruneBounds(cin_lb=2))
    assert res.searched_macs <= target
    assert profile_generator(res.config, 32, 32).macs == res.searched_macs
    # student is meaningfully smaller but alive
    assert res.config.ds_channels[-1] >= 2
    # sliced params load into a freshly-built student: structure must match
    from tests.conftest import fast_init

    model = InceptionGenerator(res.config)
    ref_vars = fast_init(model, jnp.zeros((1, 32, 32, 3)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, res.variables["params"])
    assert ref_shapes == got_shapes
    # and the student forward runs with the sliced params
    y = model.apply({"params": res.variables["params"]}, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_shrink_threshold_is_minimal():
    """The chosen threshold is the smallest observed scale meeting the budget."""
    cfg = tiny_cfg()
    _, variables = init_gen(cfg)
    rng = np.random.RandomState(2)
    variables = randomize_scales(variables, rng)
    full = profile_generator(cfg, 32, 32).macs
    target = full * 0.6
    res = shrink_generator(cfg, variables, target, 32, 32)
    g = collect_prune_gammas(variables["params"], cfg)
    values = np.unique(g.concat())
    from cat_tpu.compress.shrink import macs_at_threshold

    below = values[values < res.threshold]
    if below.size:
        assert (
            macs_at_threshold(cfg, g, float(below[-1]), PruneBounds(), 32, 32) > target
        )


def test_shrink_unreachable_target_raises():
    cfg = tiny_cfg()
    _, variables = init_gen(cfg)
    with pytest.raises(ValueError):
        shrink_generator(cfg, variables, 1.0, 32, 32, PruneBounds(cin_lb=8))


def test_shrink_batchnorm_slices_batch_stats():
    cfg = tiny_cfg(norm=NormConfig(kind="batch", affine=True, track_running_stats=True))
    _, variables = init_gen(cfg)
    rng = np.random.RandomState(3)
    variables = randomize_scales(variables, rng)
    full = profile_generator(cfg, 32, 32).macs
    res = shrink_generator(cfg, variables, full * 0.6, 32, 32)
    assert "batch_stats" in res.variables
    from tests.conftest import fast_init

    model = InceptionGenerator(res.config)
    ref_vars = fast_init(model, jnp.zeros((1, 32, 32, 3)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["batch_stats"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, res.variables["batch_stats"])
    assert ref_shapes == got_shapes
