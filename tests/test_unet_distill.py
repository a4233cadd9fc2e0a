"""Diffusion-UNet img2img distillation (stretch family): the KA harness
generalises beyond the inception GANs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.distill.generic import GenericDistillHParams, GenericDistiller
from cat_tpu.models.unet import UNet, UNetConfig

SIZE = 16


def make(base):
    return UNetConfig(in_channels=3, out_channels=3, base=base, mults=(1, 2),
                      res_blocks=1, time_dim=16, groups=4)


def test_unet_forward_and_taps(rng):
    cfg = make(8)
    model = UNet(cfg)
    x = jnp.asarray(rng.randn(2, SIZE, SIZE, 3), jnp.float32)
    t = jnp.asarray([0.0, 10.0])
    variables = model.init(jax.random.PRNGKey(0), x, t)
    y, acts = model.apply(variables, x, t, taps=("down0", "mid", "up1"))
    assert y.shape == x.shape
    assert acts["mid"].shape[-1] == cfg.tap_widths["mid"] == 16
    assert acts["down0"].shape[-1] == 8
    assert acts["up1"].shape[-1] == 16


@pytest.mark.parametrize("loss_type", ["ka", "mse"])
@pytest.mark.slow
def test_unet_distillation_step(rng, loss_type):
    t_cfg, s_cfg = make(8), make(4)
    teacher, student = UNet(t_cfg), UNet(s_cfg)
    hp = GenericDistillHParams(
        distill_loss_type=loss_type, mapping_layers=("mid", "up0"),
        lambda_recon=1.0, lambda_distill=1.0,
    )
    dist = GenericDistiller(teacher, student, t_cfg.tap_widths,
                            s_cfg.tap_widths, hp)
    x = jnp.asarray(rng.randn(2, SIZE, SIZE, 3), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    tv = teacher.init(jax.random.PRNGKey(7), x, t)
    state, tv = dist.init_state(jax.random.PRNGKey(0), (x, t), tv)
    state, metrics = dist.train_step(state, tv, (x, t), 1e-3)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert "Specific_loss/distill0" in metrics
    # a few steps reduce the reconstruction loss toward the teacher
    first = float(metrics["G_loss/recon"])
    for _ in range(10):
        state, metrics = dist.train_step(state, tv, (x, t), 1e-3)
    assert float(metrics["G_loss/recon"]) < first
    out = dist.generate(state, x, t)
    assert out.shape == x.shape


@pytest.mark.slow
def test_unet_distillation_step_bf16(rng):
    """bf16 compute path: params stay f32 masters, losses finite, step
    trains (tools/bench_unet_distill.py runs this config on-chip)."""
    t_cfg, s_cfg = make(8), make(4)
    teacher, student = UNet(t_cfg), UNet(s_cfg)
    hp = GenericDistillHParams(
        distill_loss_type="ka", mapping_layers=("mid", "up0"),
        lambda_recon=1.0, lambda_distill=1.0, compute_dtype="bfloat16",
    )
    dist = GenericDistiller(teacher, student, t_cfg.tap_widths,
                            s_cfg.tap_widths, hp)
    x = jnp.asarray(rng.randn(2, SIZE, SIZE, 3), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    tv = teacher.init(jax.random.PRNGKey(7), x, t)
    state, tv = dist.init_state(jax.random.PRNGKey(0), (x, t), tv)
    state, metrics = dist.train_step(state, tv, (x, t), 1e-3)
    assert all(np.isfinite(v) for v in jax.tree.leaves(metrics))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.g.params))
    first = float(metrics["G_loss/recon"])
    for _ in range(10):
        state, metrics = dist.train_step(state, tv, (x, t), 1e-3)
    assert float(metrics["G_loss/recon"]) < first
