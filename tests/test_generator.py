"""Generator / discriminator forward-shape and structure tests."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from cat_tpu.core.config import (
    InceptionBlockConfig,
    InceptionGeneratorConfig,
    NLayerDiscriminatorConfig,
    NormConfig,
    PixelDiscriminatorConfig,
    config_from_json,
    config_to_json,
)
from cat_tpu.models.discriminators import NLayerDiscriminator, PixelDiscriminator
from cat_tpu.models.generator import InceptionGenerator


def tiny_cfg(**kw):
    defaults = dict(
        ngf=8,
        channels=None,
        channels_reduction_factor=2,
        kernel_sizes=(1, 3),
        n_blocks=3,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )
    defaults.update(kw)
    return InceptionGeneratorConfig.make(**defaults)


def test_forward_shape_and_taps():
    cfg = tiny_cfg()
    model = InceptionGenerator(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y, acts = model.apply(variables, x, taps=("encode", "block1"))
    assert y.shape == (2, 64, 64, 3)
    assert acts["encode"].shape == (2, 16, 16, 32)
    assert acts["block1"].shape == (2, 16, 16, 32)
    assert jnp.all(jnp.abs(y) <= 1.0)  # tanh head


def test_param_tree_names():
    cfg = tiny_cfg()
    variables = InceptionGenerator(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    params = variables["params"]
    assert set(params) == {
        "stem",
        "down0",
        "down1",
        "block0",
        "block1",
        "block2",
        "up0_conv",
        "up0_norm",
        "up1_conv",
        "up1_norm",
        "head",
    }
    b0 = params["block0"]
    assert set(b0) == {
        "res0_in",
        "res0_out",
        "res1_in",
        "res1_out",
        "dw0_in",
        "dw0_mid",
        "dw0_out",
        "dw1_in",
        "dw1_mid",
        "dw1_out",
        "pw_norm",
    }
    # first norm of each branch carries the prunable scale
    assert b0["res0_in"]["norm"]["scale"].shape == (16,)
    # instance norm => conv has bias
    assert "bias" in b0["res0_in"]["conv"]


def test_pruned_config_with_dead_branches_runs():
    base = tiny_cfg()
    block = InceptionBlockConfig(
        dim=16,
        res_channels=(3, 0),
        dw_channels=(0, 5),
        res_kernels=(1, 3),
        dw_kernels=(1, 3),
    )
    empty = InceptionBlockConfig(
        dim=16, res_channels=(0, 0), dw_channels=(0, 0), res_kernels=(1, 3), dw_kernels=(1, 3)
    )
    cfg = dataclasses.replace(
        base,
        ds_channels=(4, 8, 16),
        us_channels=(8, 4),
        blocks=(block, empty, block),
    )
    model = InceptionGenerator(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    # the empty block owns no parameters
    assert "block1" not in variables["params"]
    y = model.apply(variables, x)
    assert y.shape == (1, 32, 32, 3)


def test_batchnorm_tracked_stats():
    cfg = tiny_cfg(norm=NormConfig(kind="batch", affine=True, track_running_stats=True))
    model = InceptionGenerator(cfg)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    y, new_state = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running stats moved away from init
    stem_mean = new_state["batch_stats"]["stem"]["norm"]["mean"]
    assert not jnp.allclose(stem_mean, 0.0)
    # eval mode uses running stats, no mutation needed
    y2 = model.apply(variables, x, train=False)
    assert y2.shape == x.shape


def test_config_json_roundtrip():
    cfg = tiny_cfg()
    s = config_to_json(cfg)
    cfg2 = config_from_json(s)
    assert cfg2 == cfg


def test_discriminators():
    x = jnp.zeros((2, 64, 64, 3))
    dcfg = NLayerDiscriminatorConfig(input_nc=3, ndf=8, n_layers=3)
    d = NLayerDiscriminator(dcfg)
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    # 70x70 PatchGAN: 64 ->s2 32 ->s2 16 ->s2 8 ->s1 7 ->s1 6 patch logits
    assert out.shape == (2, 6, 6, 1)

    pcfg = PixelDiscriminatorConfig(input_nc=3, ndf=8)
    p = PixelDiscriminator(pcfg)
    variables = p.init(jax.random.PRNGKey(0), x)
    out = p.apply(variables, x)
    assert out.shape == (2, 64, 64, 1)
