"""Numerical equivalence with the reference architecture.

The fixture holds a reference-layout torch state_dict (random but healthy
weights), an input batch, and the reference model's output captured once at
fixture-generation time.  The import path (shape-driven config recovery +
layout conversion) must reproduce the reference output on our generator —
proving architecture parity end to end (convs, reflect padding, instance
norm, depthwise branches, torch-geometry transposed convs, tanh head).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.utils.torch_import import import_inception_generator

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "torch_gen_fixture.npz")


@pytest.fixture(scope="module")
def fixture():
    data = np.load(FIXTURE)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return data["x"], data["ref"], sd


def test_config_recovery(fixture):
    _, _, sd = fixture
    cfg, _ = import_inception_generator(sd)
    assert cfg.ds_channels == (8, 16, 32)
    assert cfg.us_channels == (16, 8)
    assert len(cfg.blocks) == 3
    assert cfg.blocks[0].res_kernels == (1, 3, 5)
    assert cfg.blocks[0].res_channels == (16, 16, 16)


def test_forward_matches_reference_output(fixture):
    x, ref, sd = fixture
    cfg, variables = import_inception_generator(sd)
    out = InceptionGenerator(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
