"""Inception (ResNet-generator) distiller — the core CAT training loop.

Reference: distillers/base_inception_distiller.py + inception_distiller.py.

Teacher (frozen, eval mode) and student generators run inside ONE jitted
step.  Mapped intermediate activations come back functionally from the
generator's ``taps`` argument (reference captures them with forward hooks,
base_inception_distiller.py:247-269); the distillation loss is either

  * ``ka``: -KA(Sact, Tact) summed over mapping layers (adaptor-free), or
  * ``mse``: MSE(netA(Sact), Tact) with per-layer 1x1-conv adaptors trained
    jointly with the student (one Adam over student + adaptors, reference
    base_inception_distiller.py:205-211).

Update order is D-then-G with the generator gradient flowing through the
*updated* discriminator (reference inception_distiller.py:179-188).  The
student forward runs once via jax.vjp; its residuals serve both the D step
(value only) and the G gradient.

Mapping-layer channel width is the generator bottleneck (4*ngf for uniform
models; ``ds_channels[-1]`` after pruning) — reference
base_inception_distiller.py:196-201 and utils/common.py:678-686.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.config import InceptionGeneratorConfig, NLayerDiscriminatorConfig
from cat_tpu.distill.ka import ka
from cat_tpu.models.discriminators import NLayerDiscriminator
from cat_tpu.models.generator import DEFAULT_MAPPING_LAYERS, InceptionGenerator
from cat_tpu.models.losses import gan_loss, gradient_penalty, recon_loss
from cat_tpu.train.common import GANTrainState, NetState, apply_net, split_variables
from cat_tpu.train.optim import adam_tx, apply_updates


@dataclass(frozen=True)
class DistillHParams:
    dataset_mode: str = "aligned"  # aligned | unaligned (reference backward_G:159-167)
    gan_mode: str = "hinge"
    recon_loss_type: str = "l1"
    distill_loss_type: str = "ka"  # ka | mse
    lambda_gan: float = 1.0
    lambda_recon: float = 100.0
    lambda_distill: float = 1.0
    beta1: float = 0.5
    init_type: str = "normal"
    init_gain: float = 0.02
    mapping_layers: Tuple[str, ...] = DEFAULT_MAPPING_LAYERS
    # 'float32' | 'bfloat16' — bf16 runs convs single-pass on the MXU and
    # halves activation HBM traffic; master weights, Adam moments, norm
    # statistics and losses stay f32
    compute_dtype: str = "float32"
    # frozen-teacher compute override: '' follows compute_dtype; 'int8'
    # executes the teacher forward with dynamic int8 convolutions
    # (ops/quant.int8_call — per-channel weight scales, per-tensor dynamic
    # activation scales, int32 MXU accumulation, dequantised f32 taps for
    # the KA loss); 'int8_static' additionally calibrates the per-conv
    # activation scales on the first batch (calibrate_teacher) and bakes
    # them into the step as constants, eliding every per-step abs-max
    # pass so the quantise fuses into each activation's producer.  The
    # teacher is inference-only and ~48% of the step; the v5e MXU doubles
    # peak at int8.  Measured verdict in PARITY.md.
    teacher_compute_dtype: str = ""
    # route affine instance-norm+relu through the single-pass Pallas kernel
    fused_norms: bool = False
    # evaluate inception blocks with branch-packed convolutions (identical
    # math + param tree; full-width MXU work instead of ~42-lane branches)
    packed_blocks: bool = True
    # rematerialise the student forward (jax.checkpoint): recompute instead
    # of storing G activations in the backward — memory for FLOPs
    remat: bool = False
    # exponential moving average of the student generator weights
    # (--moving_average_decay).  The reference DECLARES this flag but never
    # consumes it (train_options.py:129-142, no other reference file reads
    # it); here it is implemented for real: ema = d*ema + (1-d)*params after
    # every G step, evaluation/deployment uses the EMA weights.  0 = off.
    ema_decay: float = 0.0


class Adaptor(nn.Module):
    """1x1 conv mapping student feature width to teacher feature width."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), name="conv")(x)


class InceptionDistiller:
    def __init__(
        self,
        teacher_cfg: InceptionGeneratorConfig,
        student_cfg: InceptionGeneratorConfig,
        disc_cfg: Optional[NLayerDiscriminatorConfig] = None,
        hp: DistillHParams = DistillHParams(),
    ):
        self.teacher_cfg = teacher_cfg
        self.student_cfg = student_cfg
        if disc_cfg is None:
            # aligned: D sees the (A, B) pair; unaligned: D sees B only
            d_in = (
                teacher_cfg.input_nc + teacher_cfg.output_nc
                if hp.dataset_mode == "aligned"
                else teacher_cfg.output_nc
            )
            disc_cfg = NLayerDiscriminatorConfig(input_nc=d_in, ndf=64)
        self.disc_cfg = disc_cfg
        self.hp = hp
        self.netG_teacher = InceptionGenerator(
            teacher_cfg, hp.init_type, hp.init_gain,
            fused_norms=hp.fused_norms, packed_blocks=hp.packed_blocks,
        )
        self.netG_student = InceptionGenerator(
            student_cfg, hp.init_type, hp.init_gain,
            fused_norms=hp.fused_norms, packed_blocks=hp.packed_blocks,
        )
        self.netD = NLayerDiscriminator(disc_cfg, hp.init_type, hp.init_gain)
        self.netA = Adaptor(features=teacher_cfg.bottleneck)
        self.tx = adam_tx(hp.beta1)
        self._act_scales = None  # set by calibrate_teacher (int8_static)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._gen_student = jax.jit(
            lambda params, stats, x: apply_net(
                self.netG_student, params, stats, x, train=False
            )[0]
        )
        self._gen_teacher = jax.jit(
            lambda params, stats, x: apply_net(
                self.netG_teacher, params, stats, x, train=False
            )[0]
        )

    # ------------------------------------------------------------------ state

    def init_state(
        self,
        rng: jax.Array,
        height: int,
        width: int,
        teacher_variables: Dict,
        student_variables: Optional[Dict] = None,
    ) -> Tuple[GANTrainState, Dict]:
        """CPU-backend init + single placement (see common.init_on_cpu).

        ``teacher_variables`` are NOT threaded through the jitted init —
        they are placed directly (keeping a multi-MB constant pytree out of
        the compiled program's I/O keeps the one-time init compile small
        over the remote-TPU tunnel)."""
        from cat_tpu.train.common import init_on_cpu, to_device

        state = init_on_cpu(self._init_state, rng, height, width, student_variables)
        return to_device(state), to_device(teacher_variables)

    def _init_state(
        self,
        rng: jax.Array,
        height: int,
        width: int,
        student_variables: Optional[Dict] = None,
    ) -> GANTrainState:
        """Build the train state (the teacher is always restored from a
        checkpoint — reference base_inception_distiller.py:342-347); the
        student is freshly initialised unless given (e.g. prune_continue
        restores)."""
        keys = jax.random.split(rng, 4)
        xa = jnp.zeros((1, height, width, self.teacher_cfg.input_nc))
        if student_variables is None:
            student_variables = self.netG_student.init(keys[0], xa)
        s_params, s_stats = split_variables(student_variables)

        d_in = self.disc_cfg.input_nc
        d_params, d_stats = split_variables(
            self.netD.init(keys[1], jnp.zeros((1, height, width, d_in)))
        )

        # adaptors: one per mapping layer, student bottleneck -> teacher's
        a_params = {}
        sb = self.student_cfg.bottleneck
        hb, wb = height // 4, width // 4
        for i, name in enumerate(self.hp.mapping_layers):
            a_params[f"A{i}"] = self.netA.init(
                jax.random.fold_in(keys[2], i), jnp.zeros((1, hb, wb, sb))
            )["params"]

        g_group = {"G": s_params, "A": a_params}
        extra = None
        if self.hp.ema_decay > 0:
            # real copies — the train step donates its input buffers, so the
            # EMA tree must not alias the raw params
            extra = {"ema_G": jax.tree.map(jnp.copy, s_params)}
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(g_group, self.tx.init(g_group), s_stats),
            d=NetState(d_params, self.tx.init(d_params), d_stats),
            rng=keys[3],
            extra=extra,
        )

    # ------------------------------------------------------------------- step

    def _distill_loss(self, a_params, s_acts, t_acts):
        losses = {}
        total = jnp.zeros(())
        for i, name in enumerate(self.hp.mapping_layers):
            s, t = s_acts[name], t_acts[name]
            if self.hp.distill_loss_type == "ka":
                li = -ka(s, t)
            elif self.hp.distill_loss_type == "mse":
                mapped = self.netA.apply({"params": a_params[f"A{i}"]}, s)
                li = jnp.mean(jnp.square(mapped - t))
            else:
                raise NotImplementedError(self.hp.distill_loss_type)
            losses[f"Specific_loss/distill{i}"] = li
            total = total + li
        return total, losses

    def _step(
        self,
        state: GANTrainState,
        teacher_variables: Dict,
        batch: Dict[str, jnp.ndarray],
        lr: jnp.ndarray,
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        hp = self.hp
        from cat_tpu.train.common import cast_floats

        cdt = jnp.dtype(hp.compute_dtype)
        mixed = cdt != jnp.float32

        def down(t):  # params/inputs -> compute dtype
            return cast_floats(t, cdt) if mixed else t

        def up(t):  # network outputs -> f32 for losses
            return cast_floats(t, jnp.float32) if mixed else t

        real_A = down(batch["A"])
        real_B = batch.get("B", batch["A"])
        taps = hp.mapping_layers
        rng, r_drop, r_gp = jax.random.split(state.rng, 3)

        # --- teacher forward: frozen, eval mode ---
        if hp.teacher_compute_dtype.startswith("int8"):
            from cat_tpu.ops.quant import int8_call

            scales = None
            if hp.teacher_compute_dtype == "int8_static":
                scales = self._act_scales
                if scales is None:
                    raise ValueError(
                        "teacher_compute_dtype='int8_static' requires "
                        "calibrate_teacher() before compiling the step "
                        "(train_step does this automatically on its "
                        "first batch)")
            # trace in the compute dtype: non-conv ops (norms, activations,
            # pads) keep bf16 HBM traffic exactly like the bf16 teacher;
            # only the convs are rewritten to int8 MXU ops (f32 scale math
            # inside int8_conv, output cast back to bf16)
            (t_fake, t_acts), _ = int8_call(
                lambda p, x: apply_net(
                    self.netG_teacher, p,
                    teacher_variables.get("batch_stats", {}),
                    x, train=False, taps=taps,
                ),
                down(teacher_variables["params"]), real_A,
                act_scales=scales,
            )
        else:
            (t_fake, t_acts), _ = apply_net(
                self.netG_teacher,
                down(teacher_variables["params"]),
                teacher_variables.get("batch_stats", {}),
                real_A,
                train=False,
                taps=taps,
            )
        t_fake = jax.lax.stop_gradient(up(t_fake))
        # KA streams activations in the compute dtype: bf16xbf16->f32 MXU
        # products equal upcast-then-multiply exactly, at half the HBM
        # traffic.  The mse path keeps f32 (adaptor convs + squared error).
        up_acts = (lambda t: t) if hp.distill_loss_type == "ka" else up
        t_acts = jax.lax.stop_gradient(up_acts(t_acts))

        # --- student forward once, residuals saved ---
        def s_forward(s_params):
            (fake, acts), new_stats = apply_net(
                self.netG_student,
                down(s_params),
                state.g.stats,
                real_A,
                train=True,
                mutable_stats=True,
                taps=taps,
                rngs={"dropout": r_drop},
            )
            return (up(fake), up_acts(acts)), new_stats

        if hp.remat:  # store inputs only; recompute the forward in the vjp
            s_forward = jax.checkpoint(s_forward)
        (s_fake, s_acts), s_vjp, s_stats = jax.vjp(
            s_forward, state.g.params["G"], has_aux=True
        )

        # --- discriminator update (reference backward_D: 293-312) ---
        if hp.dataset_mode == "aligned":
            fake_in = jnp.concatenate([real_A, down(s_fake)], axis=-1)
            real_in = jnp.concatenate([real_A, down(real_B)], axis=-1)
        else:
            fake_in, real_in = down(s_fake), down(real_B)

        def d_loss_fn(d_params):
            pred_fake, d1 = apply_net(
                self.netD, down(d_params), state.d.stats, fake_in,
                train=True, mutable_stats=True,
            )
            pred_real, d2 = apply_net(
                self.netD, down(d_params), d1, real_in, train=True, mutable_stats=True
            )
            lf = gan_loss(up(pred_fake), False, hp.gan_mode, True)
            lr_ = gan_loss(up(pred_real), True, hp.gan_mode, True)
            loss = 0.5 * (lf + lr_)
            if hp.gan_mode == "wgangp":
                # reference cal_gradient_penalty has zero call sites; here
                # the Lipschitz penalty actually constrains the critic
                def d_apply(x):
                    pred, _ = apply_net(self.netD, down(d_params),
                                        state.d.stats, x, train=True)
                    return up(pred)

                l_gp, _ = gradient_penalty(d_apply, real_in, fake_in,
                                           rng=r_gp)
                loss = loss + l_gp
            return loss, (lf, lr_, d2)

        (_, (l_d_fake, l_d_real, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d.params)
        d_params, d_opt = apply_updates(
            self.tx, state.d.params, d_grads, state.d.opt_state, lr
        )

        # --- generator + adaptor update through the updated D ---
        recon_target = real_B if hp.dataset_mode == "aligned" else t_fake

        def g_head(outputs, a_params):
            fake, acts = outputs
            if hp.dataset_mode == "aligned":
                d_in = jnp.concatenate([real_A, down(fake)], axis=-1)
            else:
                d_in = down(fake)
            pred, _ = apply_net(self.netD, down(d_params), d_stats, d_in, train=True)
            l_gan = gan_loss(up(pred), True, hp.gan_mode, False) * hp.lambda_gan
            l_rec = recon_loss(fake, recon_target, hp.recon_loss_type) * hp.lambda_recon
            if hp.lambda_distill > 0:
                l_dis, dis_parts = self._distill_loss(a_params, acts, t_acts)
                l_dis = l_dis * hp.lambda_distill
            else:
                l_dis, dis_parts = jnp.zeros(()), {}
            return l_gan + l_rec + l_dis, (l_gan, l_rec, l_dis, dis_parts)

        (_, (l_g_gan, l_g_rec, l_g_dis, dis_parts)), (out_ct, a_grads) = (
            jax.value_and_grad(g_head, argnums=(0, 1), has_aux=True)(
                (s_fake, s_acts), state.g.params["A"]
            )
        )
        (s_grads,) = s_vjp(out_ct)
        g_grads = {"G": s_grads, "A": a_grads}
        g_params, g_opt = apply_updates(
            self.tx, state.g.params, g_grads, state.g.opt_state, lr
        )

        extra = state.extra
        if hp.ema_decay > 0 and extra is not None:
            d_ema = hp.ema_decay
            extra = {
                "ema_G": jax.tree.map(
                    lambda e, p: e * d_ema + p * (1.0 - d_ema),
                    extra["ema_G"], g_params["G"],
                )
            }

        new_state = GANTrainState(
            step=state.step + 1,
            g=NetState(g_params, g_opt, s_stats),
            d=NetState(d_params, d_opt, d_stats),
            rng=rng,
            extra=extra,
        )
        metrics = {
            "G_loss/gan": l_g_gan,
            "G_loss/recon": l_g_rec,
            "G_loss/distill": l_g_dis,
            "D_loss/fake": l_d_fake,
            "D_loss/real": l_d_real,
            **dis_parts,
        }
        return new_state, metrics

    def calibrate_teacher(self, teacher_variables: Dict, x: jnp.ndarray):
        """Static-range int8 calibration: one dynamic-int8 teacher forward
        over a representative batch, recording each conv's activation
        scale.  Stored as host floats so they bake into the subsequently
        compiled step executable as constants (no per-step abs-max)."""
        from cat_tpu.ops.quant import int8_calibrate
        from cat_tpu.train.common import cast_floats

        cdt = jnp.dtype(self.hp.compute_dtype)
        taps = self.hp.mapping_layers

        @jax.jit
        def _cal(p, xx):
            # stack to ONE device array: a single host fetch instead of one
            # blocking scalar round trip per conv (69 trips cost ~10 min
            # over the axon tunnel)
            return jnp.stack(int8_calibrate(
                lambda pp, b: apply_net(
                    self.netG_teacher, pp,
                    teacher_variables.get("batch_stats", {}),
                    b, train=False, taps=taps,
                ),
                p, xx,
            )[1])

        import numpy as np
        scales = np.asarray(_cal(cast_floats(teacher_variables["params"], cdt),
                                 cast_floats(x, cdt)))
        self._act_scales = tuple(float(s) for s in scales)
        return self._act_scales

    def train_step(self, state, teacher_variables, batch, lr):
        if (self.hp.teacher_compute_dtype == "int8_static"
                and self._act_scales is None):
            self.calibrate_teacher(teacher_variables, batch["A"])
        return self._train_step(
            state, teacher_variables, batch, jnp.asarray(lr, jnp.float32)
        )

    # -------------------------------------------------------------- inference

    def student_eval_params(self, state: GANTrainState):
        """EMA weights when --moving_average_decay is on, else the raw
        trained weights — what evaluation and deployment should use."""
        if isinstance(state.extra, dict) and "ema_G" in state.extra:
            return state.extra["ema_G"]
        return state.g.params["G"]

    def generate_student(self, state: GANTrainState, x: jnp.ndarray) -> jnp.ndarray:
        return self._gen_student(self.student_eval_params(state), state.g.stats, x)

    def generate_teacher(self, teacher_variables: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return self._gen_teacher(
            teacher_variables["params"],
            teacher_variables.get("batch_stats", {}),
            x,
        )
