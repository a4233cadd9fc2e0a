"""Dynamic int8 quantized teacher execution (ops/quant.py).

The interpreter must reproduce the unquantized forward within int8
round-off (including the taps the KA loss reads), and the distill step
with --teacher_compute_dtype int8 must train.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.ops.quant import int8_call, int8_conv


def tiny_cfg(ngf=8, blocks=2):
    return InceptionGeneratorConfig.make(
        ngf=ngf, channels=None, channels_reduction_factor=2,
        kernel_sizes=(1, 3), n_blocks=blocks,
        norm=NormConfig(kind="instance", affine=True,
                        track_running_stats=False),
    )


def test_int8_conv_matches_f32_within_quantization():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 24) * 0.1, jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn)
    got = int8_conv(x, w, window_strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    lhs_dilation=(1, 1), rhs_dilation=(1, 1),
                    dimension_numbers=dn, feature_group_count=1,
                    batch_group_count=1, precision=None,
                    preferred_element_type=None)
    # dynamic per-tensor int8: ~1% relative error on random operands
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_int8_call_generator_taps_close():
    cfg = tiny_cfg()
    m = InceptionGenerator(cfg, packed_blocks=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def fwd(params, x):
        return m.apply({"params": params}, x, taps=("encode", "block1"))

    y_ref, acts_ref = jax.jit(fwd)(v["params"], x)
    y_q, acts_q = jax.jit(lambda p, xx: int8_call(fwd, p, xx))(v["params"], x)
    assert y_q.shape == y_ref.shape
    rel = float(jnp.mean(jnp.abs(y_q - y_ref))
                / (jnp.mean(jnp.abs(y_ref)) + 1e-9))
    assert rel < 0.15, rel  # deep-net accumulation of per-layer round-off
    for k in acts_ref:
        r = float(jnp.mean(jnp.abs(acts_q[k] - acts_ref[k]))
                  / (jnp.mean(jnp.abs(acts_ref[k])) + 1e-9))
        assert r < 0.15, (k, r)


@pytest.mark.slow
def test_spade_distill_step_with_int8_teacher():
    from cat_tpu.core.spade_config import (
        MultiscaleDiscriminatorConfig,
        SPADEGeneratorConfig,
    )
    from cat_tpu.distill.spade_distiller import (
        SPADEDistillHParams,
        SPADEDistiller,
    )
    from cat_tpu.train.spade_model import preprocess_input

    size, nc = 32, 5

    def cfg(ngf):
        return SPADEGeneratorConfig.make(
            semantic_nc=nc, ngf=ngf, channels=None,
            channels_reduction_factor=4, kernel_sizes=(1, 3),
            num_upsampling_layers="normal", crop_size=size,
            aspect_ratio=1.0, nhidden=16,
        )

    hp = SPADEDistillHParams(distill_loss_type="ka", lambda_vgg=0.0,
                             mapping_layers=("head_0", "up_1"),
                             teacher_compute_dtype="int8")
    dist = SPADEDistiller(cfg(8), cfg(4),
                          MultiscaleDiscriminatorConfig(input_nc=nc + 3,
                                                        ndf=4, n_layers=3,
                                                        num_D=2),
                          hp)
    tv = dist.netG_teacher.init(jax.random.PRNGKey(7),
                                jnp.zeros((1, size, size, nc)))
    state, tv = dist.init_state(jax.random.PRNGKey(0), size, size, tv)
    rng = np.random.RandomState(2)
    label = rng.randint(0, nc, size=(2, size, size)).astype(np.float32)
    batch = {
        "semantics": preprocess_input(jnp.asarray(label), None, nc),
        "image": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
    }
    state, metrics = dist.train_step(state, tv, batch, 2e-4)
    assert all(bool(jnp.isfinite(v)) for v in jax.tree.leaves(metrics))
    assert "Specific_loss/distill0" in metrics


def test_distill_step_with_int8_teacher():
    from cat_tpu.distill.inception_distiller import (
        DistillHParams,
        InceptionDistiller,
    )

    size = 32
    hp = DistillHParams(
        dataset_mode="unaligned", gan_mode="lsgan", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode",),
        teacher_compute_dtype="int8",
    )
    # single block / single tap: the int8 jaxpr interpreter re-emits every
    # teacher equation, so compile time scales with teacher depth — this is
    # a wiring test, taps numerics are covered above
    dist = InceptionDistiller(tiny_cfg(8, blocks=1), tiny_cfg(4, blocks=1),
                              hp=hp)
    teacher_vars = dist.netG_teacher.init(
        jax.random.PRNGKey(7), jnp.zeros((1, size, size, 3)))
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(0), size, size, teacher_vars)
    rng = np.random.RandomState(2)
    batch = {
        "A": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
    }
    state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    assert all(bool(jnp.isfinite(v)) for v in jax.tree.leaves(metrics)), metrics
    state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    assert all(bool(jnp.isfinite(v)) for v in jax.tree.leaves(metrics))


def test_int8_static_scales_match_dynamic_on_calibration_batch():
    """int8_calibrate's recorded scales reproduce the dynamic result
    exactly when fed back on the same batch (same per-conv scale values)."""
    from cat_tpu.ops.quant import int8_calibrate

    cfg = tiny_cfg()
    m = InceptionGenerator(cfg, packed_blocks=True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def fwd(params, x):
        return m.apply({"params": params}, x, taps=("encode",))

    (y_dyn, _), scales = jax.jit(
        lambda p, xx: int8_calibrate(fwd, p, xx))(v["params"], x)
    scales = tuple(float(s) for s in scales)
    assert len(scales) > 4 and all(s > 0 for s in scales)
    y_st, _ = jax.jit(
        lambda p, xx: int8_call(fwd, p, xx, act_scales=scales))(v["params"], x)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_dyn),
                               rtol=0, atol=1e-6)
    # wrong scale count is a loud error, not silent misalignment
    with pytest.raises(ValueError):
        jax.jit(lambda p, xx: int8_call(
            fwd, p, xx, act_scales=scales[:-1]))(v["params"], x)


def test_distill_step_with_int8_static_teacher():
    """train_step auto-calibrates on the first batch, then the compiled
    step (fixed scales baked as constants) trains finitely."""
    from cat_tpu.distill.inception_distiller import (
        DistillHParams,
        InceptionDistiller,
    )

    size = 32
    hp = DistillHParams(
        dataset_mode="unaligned", gan_mode="lsgan", distill_loss_type="ka",
        lambda_recon=5.0, mapping_layers=("encode",),
        teacher_compute_dtype="int8_static",
    )
    dist = InceptionDistiller(tiny_cfg(8, blocks=1), tiny_cfg(4, blocks=1),
                              hp=hp)
    teacher_vars = dist.netG_teacher.init(
        jax.random.PRNGKey(7), jnp.zeros((1, size, size, 3)))
    state, teacher_vars = dist.init_state(
        jax.random.PRNGKey(0), size, size, teacher_vars)
    rng = np.random.RandomState(2)
    batch = {
        "A": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
        "B": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
    }
    assert dist._act_scales is None
    state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    assert dist._act_scales is not None and len(dist._act_scales) > 0
    assert all(bool(jnp.isfinite(v)) for v in jax.tree.leaves(metrics))
    state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    assert all(bool(jnp.isfinite(v)) for v in jax.tree.leaves(metrics))
