"""Module-agnostic KA feature distiller.

The inception/SPADE distillers mirror the reference's task-specific classes;
this generic harness distills ANY teacher/student pair whose ``__call__``
accepts a ``taps=`` argument and returns ``(output, {tap: activation})`` —
e.g. the diffusion UNet (cat_tpu/models/unet.py), the stretch family beyond
the reference.  Losses: reconstruction-to-teacher + per-tap KA (adaptor-free)
or adaptor-MSE; no discriminator (pure feature/regression distillation —
add one by composing with the task-specific steps if needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.distill.ka import ka
from cat_tpu.models.losses import recon_loss
from cat_tpu.train.common import NetState, init_on_cpu, to_device
from cat_tpu.train.optim import adam_tx, apply_updates

import flax.struct


@flax.struct.dataclass
class DistillState:
    step: jnp.ndarray
    g: NetState
    rng: jax.Array


@dataclass(frozen=True)
class GenericDistillHParams:
    distill_loss_type: str = "ka"  # ka | mse
    recon_loss_type: str = "l2"
    lambda_recon: float = 1.0
    lambda_distill: float = 1.0
    beta1: float = 0.9
    beta2: float = 0.999
    mapping_layers: Tuple[str, ...] = ()
    # 'float32' | 'bfloat16' — bf16 casts params/inputs for the forwards
    # (single-pass MXU convs, f32 master weights), losses reduced in f32;
    # KA streams activations in the compute dtype (bf16xbf16->f32 products)
    compute_dtype: str = "float32"


class _Adaptor(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), name="conv")(x)


class GenericDistiller:
    """Distill teacher -> student on (inputs, optional extra args)."""

    def __init__(
        self,
        teacher_module: nn.Module,
        student_module: nn.Module,
        teacher_tap_widths: Dict[str, int],
        student_tap_widths: Dict[str, int],
        hp: GenericDistillHParams,
    ):
        self.teacher = teacher_module
        self.student = student_module
        self.t_widths = teacher_tap_widths
        self.s_widths = student_tap_widths
        self.hp = hp
        self.tx = adam_tx(hp.beta1, hp.beta2)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))

    def init_state(
        self,
        rng: jax.Array,
        example_inputs: Tuple,
        teacher_variables: Dict,
    ) -> Tuple[DistillState, Dict]:
        def build():
            ks, ka_, kr = jax.random.split(rng, 3)
            sv = self.student.init(ks, *example_inputs)
            a_params = {}
            if self.hp.distill_loss_type == "mse":
                # probe student activation shapes for the adaptors
                _, acts = self.student.apply(
                    sv, *example_inputs, taps=self.hp.mapping_layers
                )
                for i, name in enumerate(self.hp.mapping_layers):
                    a_params[f"A{i}"] = _Adaptor(self.t_widths[name]).init(
                        jax.random.fold_in(ka_, i), acts[name]
                    )["params"]
            group = {"G": sv["params"], "A": a_params}
            return DistillState(
                step=jnp.zeros((), jnp.int32),
                g=NetState(group, self.tx.init(group), {}),
                rng=kr,
            )

        return to_device(init_on_cpu(build)), to_device(teacher_variables)

    def _distill_loss(self, a_params, s_acts, t_acts):
        total = jnp.zeros(())
        parts = {}
        for i, name in enumerate(self.hp.mapping_layers):
            s, t = s_acts[name], t_acts[name]
            if self.hp.distill_loss_type == "ka":
                li = -ka(s, t)
            else:
                mapped = _Adaptor(t.shape[-1]).apply({"params": a_params[f"A{i}"]}, s)
                li = jnp.mean(jnp.square(mapped - t))
            parts[f"Specific_loss/distill{i}"] = li
            total = total + li
        return total, parts

    def _step(self, state: DistillState, teacher_variables: Dict,
              inputs: Tuple, lr: jnp.ndarray):
        from cat_tpu.train.common import cast_floats

        hp = self.hp
        taps = hp.mapping_layers
        cdt = jnp.dtype(hp.compute_dtype)
        mixed = cdt != jnp.float32
        down = (lambda t: cast_floats(t, cdt)) if mixed else (lambda t: t)
        up = (lambda t: cast_floats(t, jnp.float32)) if mixed else (lambda t: t)
        inputs = down(inputs)

        t_out, t_acts = self.teacher.apply(down(teacher_variables), *inputs,
                                           taps=taps)
        t_out = jax.lax.stop_gradient(up(t_out))
        # ka consumes activations in the compute dtype; mse upcasts for the
        # adaptor convs + squared error (as in the inception distiller)
        up_acts = (lambda t: t) if hp.distill_loss_type == "ka" else up
        t_acts = jax.lax.stop_gradient(up_acts(t_acts))

        def loss_fn(group):
            s_out, s_acts = self.student.apply(
                {"params": down(group["G"])}, *inputs, taps=taps
            )
            s_out, s_acts = up(s_out), up_acts(s_acts)
            l_rec = recon_loss(s_out, t_out, hp.recon_loss_type) * hp.lambda_recon
            l_dis, parts = self._distill_loss(group["A"], s_acts, t_acts)
            l_dis = l_dis * hp.lambda_distill
            return l_rec + l_dis, (l_rec, l_dis, parts)

        (_, (l_rec, l_dis, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g.params)
        params, opt = apply_updates(self.tx, state.g.params, grads,
                                    state.g.opt_state, lr)
        rng, _ = jax.random.split(state.rng)
        new_state = DistillState(
            step=state.step + 1, g=NetState(params, opt, {}), rng=rng
        )
        metrics = {"G_loss/recon": l_rec, "G_loss/distill": l_dis, **parts}
        return new_state, metrics

    def train_step(self, state, teacher_variables, inputs, lr):
        return self._train_step(state, teacher_variables, tuple(inputs),
                                jnp.asarray(lr, jnp.float32))

    def generate(self, state: DistillState, *inputs):
        return self.student.apply({"params": state.g.params["G"]}, *inputs)
