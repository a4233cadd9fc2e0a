"""Shrink-search equivalence: the breakpoint search must select the same
architecture as the reference's float binary search.

The reference bisects a float threshold until |ub-lb| <= 1e-3*lb and
flops <= target, rebuilding + profiling a candidate per iteration
(utils/common.py:345-441).  cat_tpu searches the sorted unique |γ| values
directly (shrink.py).  Since MACs(threshold) only changes at observed |γ|
values, both converge to the same channel counts; this test runs a faithful
transcription of the reference's loop (using the golden-tested analytic MAC
counter as the profiling oracle) against the breakpoint search on random
scale vectors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.compress.prune import collect_prune_gammas
from cat_tpu.compress.shrink import (
    PruneBounds,
    _candidate_config,
    _search_counts,
    shrink_generator,
)
from cat_tpu.compress.profiling import profile_generator
from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.models.generator import InceptionGenerator


def reference_binary_search(cfg, g, target, bounds, h, w):
    """Transcription of the reference's float bisection semantics."""
    allg = g.concat()
    lb, ub = float(allg.min()), float(allg.max())
    searched = float("inf")
    t = ub
    iters = 0
    while (abs(ub - lb) > 1e-3 * lb) or (searched > target):
        t = (lb + ub) / 2
        ds, blocks, us = _search_counts(g, t, bounds)
        cand = _candidate_config(cfg, ds, blocks, us)
        searched = profile_generator(cand, h, w).macs
        if searched > target:
            lb = t
        else:
            ub = t
        iters += 1
        assert iters < 10000, "reference search diverged"
    return t, _search_counts(g, t, bounds)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_breakpoint_search_matches_reference_bisection(seed):
    cfg = InceptionGeneratorConfig.make(
        ngf=8, channels=None, channels_reduction_factor=2,
        kernel_sizes=(1, 3), n_blocks=3,
        norm=NormConfig(kind="instance", affine=True),
    )
    variables = InceptionGenerator(cfg).init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3))
    )
    rng = np.random.RandomState(seed)
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jnp.asarray(rng.uniform(0.01, 2.0, x.shape), jnp.float32)
            if path[-1].key == "scale" else x
        ),
        variables,
    )
    g = collect_prune_gammas(variables["params"], cfg)
    full = profile_generator(cfg, 32, 32).macs
    bounds = PruneBounds(cin_lb=2)
    for frac in (0.4, 0.6, 0.8):
        target = full * frac
        t_ref, counts_ref = reference_binary_search(cfg, g, target, bounds, 32, 32)
        res = shrink_generator(cfg, variables, target, 32, 32, bounds)
        counts_mine = _search_counts(g, res.threshold, bounds)
        assert counts_mine == counts_ref, (
            f"seed {seed} frac {frac}: breakpoint search selected different "
            f"channel counts than the reference bisection"
        )
        assert res.searched_macs <= target
