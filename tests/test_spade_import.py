"""SPADE generator: numerical equivalence with the reference architecture
(fixture-based, like tests/test_torch_import.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.models.spade import SPADEGenerator
from cat_tpu.utils.spade_import import import_spade_generator

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "torch_spade_fixture.npz")


@pytest.fixture(scope="module")
def fixture():
    data = np.load(FIXTURE)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return data["seg"], data["ref"], sd


def test_spade_config_recovery(fixture):
    _, _, sd = fixture
    cfg, _ = import_spade_generator(sd, num_upsampling_layers="normal",
                                    crop_size=32, aspect_ratio=1.0)
    assert cfg.fc_channels == 64
    assert cfg.semantic_nc == 5
    assert cfg.blocks[0].res_kernels == (1, 3)
    assert cfg.blocks[3].fin == 64 and cfg.blocks[3].fout == 32  # up_0 halves


@pytest.mark.slow
def test_spade_forward_matches_reference(fixture):
    seg, ref, sd = fixture
    cfg, variables = import_spade_generator(sd, num_upsampling_layers="normal",
                                            crop_size=32, aspect_ratio=1.0)
    out = SPADEGenerator(cfg).apply(variables, jnp.asarray(seg.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
