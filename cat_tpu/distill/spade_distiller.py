"""SPADE (GauGAN) distiller.

Reference: distillers/base_spade_distiller.py + spade_distiller.py +
models/modules/spade_modules/{base_spade_distiller_modules,
spade_distiller_modules}.py.

Semantics reproduced:
  * mapping layers ('head_0', 'G_middle_1', 'up_1'); activations come back
    from the generator's taps kwarg (the reference uses the same functional
    mechanism here — base_spade_distiller_modules.py:128-135),
  * per-layer 1x1 adaptors sized to the tap block's output width, trained
    in the G optimizer (TTUR) alongside the student
    (base_spade_distiller_modules.py:74-105),
  * G loss = hinge GAN + distill (mse-with-adaptor | -KA) * λ_distill +
    feature-matching * λ_feat + VGG * λ_vgg (:128-156),
  * G-first update; the D step re-generates the student fake from the
    updated student under stop-gradient.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cat_tpu.core.spade_config import MultiscaleDiscriminatorConfig, SPADEGeneratorConfig
from cat_tpu.distill.ka import ka
from cat_tpu.models.losses import gan_loss
from cat_tpu.models.spade import (
    DEFAULT_SPADE_MAPPING_LAYERS,
    MultiscaleDiscriminator,
    SPADEGenerator,
)
from cat_tpu.models.vgg import vgg_loss
from cat_tpu.train.common import GANTrainState, NetState, init_on_cpu, to_device
from cat_tpu.train.optim import adam_tx, apply_updates
from cat_tpu.train.spade_model import feature_matching_loss


@dataclass(frozen=True)
class SPADEDistillHParams:
    gan_mode: str = "hinge"
    distill_loss_type: str = "ka"  # ka | mse
    lambda_gan: float = 1.0
    lambda_distill: float = 1.0
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_TTUR: bool = False
    beta1: float = 0.0
    beta2: float = 0.9
    init_type: str = "xavier"
    init_gain: float = 0.02
    mapping_layers: Tuple[str, ...] = DEFAULT_SPADE_MAPPING_LAYERS
    # 'float32' | 'bfloat16' — bf16 generator/discriminator compute with f32
    # master weights, norm statistics and losses
    compute_dtype: str = "float32"
    # dtype of the VGG19 perceptual sweep: at 512x256 the three VGG conv
    # passes are the largest single term of the step (measured on v5e:
    # tools/spade_perf.py), and f32 convs run at 1/4 the MXU's bf16 rate.
    # Slice L1 reductions stay f32 (models/vgg.py)
    vgg_compute_dtype: str = "float32"
    # evaluate SPADE blocks with branch-packed convolutions (identical math
    # and parameter tree; models/spade.py SPADEBlock docstring).  Default ON:
    # at the reference's production scale (512x256, batch 16, bf16) packing
    # measures +11% on the distill step and +29% on the teacher-train step
    # (tools/spade_perf.py; the round-3 'neutral' result was a 256x128
    # probe-scale artifact — PARITY.md)
    packed_blocks: bool = True
    # rematerialise the student forward (jax.checkpoint): activation memory
    # for FLOPs — needed to reach the reference's 512x256 GauGAN crops
    remat: bool = False
    # selective rematerialisation: name of a jax.checkpoint_policies policy
    # (e.g. 'dots_with_no_batch_dims_saveable') applied when remat is on —
    # saves the cheap-to-store values and recomputes only the rest, a
    # middle ground between full remat's recompute cost and no-remat's
    # activation footprint (lets b48 fit where plain no-remat exceeds HBM)
    remat_policy: str = ""
    # exponential moving average of the student-G weights
    # (--moving_average_decay; the reference declares the flag but never
    # reads it — see inception_distiller.DistillHParams.ema_decay).  0 = off.
    ema_decay: float = 0.0
    # frozen-teacher compute override: '' follows compute_dtype; 'int8'
    # executes the teacher forward with dynamic int8 convolutions
    # (ops/quant.int8_call) — same lever as the inception family
    # (inception_distiller.DistillHParams.teacher_compute_dtype)
    teacher_compute_dtype: str = ""


class _Adaptor(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), name="conv")(x)


def _tap_width(cfg: SPADEGeneratorConfig, name: str) -> int:
    for bname, bcfg in zip(cfg.block_names, cfg.blocks):
        if bname == name:
            return bcfg.fout
    raise KeyError(name)


class SPADEDistiller:
    def __init__(
        self,
        teacher_cfg: SPADEGeneratorConfig,
        student_cfg: SPADEGeneratorConfig,
        disc_cfg: Optional[MultiscaleDiscriminatorConfig] = None,
        hp: SPADEDistillHParams = SPADEDistillHParams(),
        vgg_variables: Optional[Dict] = None,
    ):
        self.teacher_cfg = teacher_cfg
        self.student_cfg = student_cfg
        self.disc_cfg = disc_cfg or MultiscaleDiscriminatorConfig(
            input_nc=teacher_cfg.semantic_nc + teacher_cfg.output_nc
        )
        self.hp = hp
        self.vgg_variables = vgg_variables
        # raw-batch preprocessing spec; callers override for dontcare/no-instance
        self.label_nc = teacher_cfg.semantic_nc - 1  # minus the edge channel
        self.contain_dontcare = False
        self.netG_teacher = SPADEGenerator(teacher_cfg, hp.init_type, hp.init_gain,
                                           packed_blocks=hp.packed_blocks)
        self.netG_student = SPADEGenerator(student_cfg, hp.init_type, hp.init_gain,
                                           packed_blocks=hp.packed_blocks)
        self.netD = MultiscaleDiscriminator(self.disc_cfg, hp.init_type, hp.init_gain)
        self.tx = adam_tx(hp.beta1, hp.beta2)
        self._act_scales = None  # set by calibrate_teacher (int8_static)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._gen_student = jax.jit(
            lambda p, s, x: self._apply(self.netG_student, p, s, x, False)[0]
        )
        self._gen_teacher = jax.jit(
            lambda tv, x: self._apply(
                self.netG_teacher, tv["params"],
                {k: v for k, v in tv.items() if k != "params"}, x, False
            )[0]
        )

    @property
    def lr_mults(self) -> Tuple[float, float]:
        return (1.0, 1.0) if self.hp.no_TTUR else (0.5, 2.0)

    # ----------------------------------------------------------------- state

    def init_state(
        self, rng: jax.Array, height: int, width: int, teacher_variables: Dict,
        student_variables: Optional[Dict] = None,
    ) -> Tuple[GANTrainState, Dict]:
        """``student_variables`` warm-starts the student: provided
        collections (typically just 'params' from the pretrained weight
        transfer, compress/transfer.py) override the fresh init; missing
        collections (batch_stats) keep their init values — matching the
        reference transfer_Norm, which never copies running statistics
        (weight_transfer.py:83-94)."""

        def build(rng, student_variables):
            kg, kd, ka_, ks = jax.random.split(rng, 4)
            seg = jnp.zeros((1, height, width, self.student_cfg.semantic_nc))
            sv = self.netG_student.init(kg, seg)
            if student_variables is not None:
                sv = {**sv, **student_variables}
            dv = self.netD.init(
                kd, jnp.zeros((1, height, width, self.disc_cfg.input_nc))
            )
            a_params = {}
            sh, sw = self.student_cfg.latent_size()
            scale = {"head_0": 1, "G_middle_0": 2, "G_middle_1": 4, "up_0": 8,
                     "up_1": 16, "up_2": 32, "up_3": 64, "up_4": 128}
            if self.student_cfg.num_upsampling_layers == "normal":
                scale["G_middle_1"] = 2
            for i, name in enumerate(self.hp.mapping_layers):
                fs = _tap_width(self.student_cfg, name)
                ft = _tap_width(self.teacher_cfg, name)
                m = scale.get(name, 1)
                a_params[f"A{i}"] = _Adaptor(ft).init(
                    jax.random.fold_in(ka_, i),
                    jnp.zeros((1, max(sh * m // 2, 1), max(sw * m // 2, 1), fs)),
                )["params"]
            g_group = {"G": sv["params"], "A": a_params}
            g_stats = {k: v for k, v in sv.items() if k != "params"}
            d_stats = {k: v for k, v in dv.items() if k != "params"}
            extra = None
            if self.hp.ema_decay > 0:
                # real copies — the train step donates its input buffers,
                # so the EMA tree must not alias the raw params
                extra = {"ema_G": jax.tree.map(jnp.copy, sv["params"])}
            return GANTrainState(
                step=jnp.zeros((), jnp.int32),
                g=NetState(g_group, self.tx.init(g_group), g_stats),
                d=NetState(dv["params"], self.tx.init(dv["params"]), d_stats),
                rng=ks,
                extra=extra,
            )

        state = to_device(init_on_cpu(build, rng, student_variables))
        return state, to_device(teacher_variables)

    # ----------------------------------------------------------------- apply

    def _apply(self, module, params, stats, seg, train, taps=()):
        variables = {"params": params, **stats}
        if train and stats:
            out, new = module.apply(variables, seg, train=True, taps=taps,
                                    mutable=list(stats))
            return out, new
        return module.apply(variables, seg, train=train, taps=taps), stats

    def _apply_d(self, params, stats, x, train, mutable=False):
        variables = {"params": params, **stats}
        if mutable and stats:
            out, new = self.netD.apply(variables, x, train=train, mutable=list(stats))
            return out, new
        return self.netD.apply(variables, x, train=train), stats

    def _discriminate(self, d_params, d_stats, sem, fake, real, train, mutable=False):
        both = jnp.concatenate(
            [jnp.concatenate([sem, fake], axis=-1),
             jnp.concatenate([sem, real], axis=-1)], axis=0
        )
        out, new_stats = self._apply_d(d_params, d_stats, both, train, mutable)
        half = sem.shape[0]
        pf = [[t[:half] for t in scale] for scale in out]
        pr = [[t[half:] for t in scale] for scale in out]
        return pf, pr, new_stats

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

    # ------------------------------------------------------------------ step

    def _semantics(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        from cat_tpu.train.spade_model import preprocess_input

        if "semantics" in batch:
            return batch["semantics"]
        return preprocess_input(
            batch["label"], batch.get("instance"), self.label_nc,
            self.contain_dontcare,
        )

    def _step(self, state: GANTrainState, teacher_variables: Dict,
              batch: Dict[str, jnp.ndarray], lr: jnp.ndarray):
        hp = self.hp
        from cat_tpu.train.common import cast_floats

        cdt = jnp.dtype(hp.compute_dtype)
        mixed = cdt != jnp.float32

        def down(t):  # params/inputs -> compute dtype
            return cast_floats(t, cdt) if mixed else t

        def up(t):  # network outputs -> f32 for losses
            return cast_floats(t, jnp.float32) if mixed else t

        sem, real_B = down(self._semantics(batch)), batch["image"]
        lr_g, lr_d = lr * self.lr_mults[0], lr * self.lr_mults[1]
        rng, r_gp = jax.random.split(state.rng)
        taps = hp.mapping_layers

        t_stats = {k: v for k, v in teacher_variables.items() if k != "params"}
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
            # trace in the compute dtype (see inception_distiller): non-conv
            # ops keep bf16 HBM traffic; only convs run int8 on the MXU
            (t_fake, t_acts), _ = int8_call(
                lambda p, s: self._apply(self.netG_teacher, p, t_stats, s,
                                         train=False, taps=taps),
                down(teacher_variables["params"]), sem,
                act_scales=scales,
            )
        else:
            (t_fake, t_acts), _ = self._apply(
                self.netG_teacher, down(teacher_variables["params"]), t_stats,
                sem, train=False, taps=taps,
            )
        t_fake = jax.lax.stop_gradient(up(t_fake))
        t_acts = jax.lax.stop_gradient(up(t_acts))

        # --- G update (old D) ---
        def s_fwd(params, stats, sem):
            return self._apply(self.netG_student, params, stats, sem,
                               train=True, taps=taps)

        if hp.remat:  # recompute the student forward in the vjp
            policy = (getattr(jax.checkpoint_policies, hp.remat_policy)
                      if hp.remat_policy else None)
            s_fwd = jax.checkpoint(s_fwd, policy=policy)

        def g_loss_fn(g_group):
            (fake, s_acts), g_stats = s_fwd(
                down(g_group["G"]), state.g.stats, sem
            )
            fake, s_acts = up(fake), up(s_acts)
            pf, pr, _ = self._discriminate(
                state.d.params, state.d.stats, sem, down(fake), down(real_B),
                train=True,
            )
            pf, pr = up(pf), up(pr)
            l_gan = gan_loss(pf, True, hp.gan_mode, False) * hp.lambda_gan
            l_feat = feature_matching_loss(pf, pr) * hp.lambda_feat
            if self.vgg_variables is not None and hp.lambda_vgg > 0:
                l_vgg = vgg_loss(self.vgg_variables, fake, real_B,
                                 hp.vgg_compute_dtype) * hp.lambda_vgg
            else:
                l_vgg = jnp.zeros(())
            if hp.lambda_distill > 0:
                l_dis, parts = self._distill_loss(g_group["A"], s_acts, t_acts)
                l_dis = l_dis * hp.lambda_distill
            else:
                l_dis, parts = jnp.zeros(()), {}
            total = l_gan + l_feat + l_vgg + l_dis
            return total, (l_gan, l_feat, l_vgg, l_dis, parts, g_stats)

        (_, (l_gan, l_feat, l_vgg, l_dis, parts, g_stats)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        )
        g_params, g_opt = apply_updates(
            self.tx, state.g.params, g_grads, state.g.opt_state, lr_g
        )

        # --- D update on the updated student's fake ---
        fake, _ = self._apply(
            self.netG_student, down(g_params["G"]), g_stats, sem, train=True
        )
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            pf, pr, d_stats = self._discriminate(
                down(d_params), state.d.stats, sem, fake, down(real_B),
                train=True, mutable=True,
            )
            lf = gan_loss(up(pf), False, hp.gan_mode, True)
            lrr = gan_loss(up(pr), True, hp.gan_mode, True)
            loss = lf + lrr
            if hp.gan_mode == "wgangp":
                # reference cal_gradient_penalty has zero call sites; here
                # the Lipschitz penalty actually constrains the critic
                from cat_tpu.models.losses import gradient_penalty

                def d_apply(x):
                    out, _ = self._apply_d(down(d_params), state.d.stats, x,
                                           train=True)
                    return up(out)

                l_gp, _ = gradient_penalty(
                    d_apply,
                    jnp.concatenate([sem, down(real_B)], axis=-1),
                    jnp.concatenate([sem, fake], axis=-1),
                    rng=r_gp,
                )
                loss = loss + l_gp
            return loss, (lf, lrr, d_stats)

        (_, (l_d_fake, l_d_real, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d.params)
        d_params, d_opt = apply_updates(
            self.tx, state.d.params, d_grads, state.d.opt_state, lr_d
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
            g=NetState(g_params, g_opt, g_stats),
            d=NetState(d_params, d_opt, d_stats),
            rng=rng,
            extra=extra,
        )
        metrics = {
            "G_loss/gan": l_gan,
            "G_loss/feat": l_feat,
            "G_loss/vgg": l_vgg,
            "G_loss/distill": l_dis,
            "D_loss/fake": l_d_fake,
            "D_loss/real": l_d_real,
            **parts,
        }
        return new_state, metrics

    def calibrate_teacher(self, teacher_variables: Dict,
                          batch: Dict[str, jnp.ndarray]):
        """Static-range int8 calibration on one representative batch
        (see InceptionDistiller.calibrate_teacher)."""
        from cat_tpu.ops.quant import int8_calibrate
        from cat_tpu.train.common import cast_floats

        cdt = jnp.dtype(self.hp.compute_dtype)
        taps = self.hp.mapping_layers
        t_stats = {k: v for k, v in teacher_variables.items()
                   if k != "params"}

        @jax.jit
        def _cal(p, s):
            # stack to ONE device array: a single host fetch instead of one
            # blocking scalar round trip per conv (see inception variant)
            return jnp.stack(int8_calibrate(
                lambda pp, ss: self._apply(self.netG_teacher, pp, t_stats,
                                           ss, train=False, taps=taps),
                p, s,
            )[1])

        import numpy as np
        scales = np.asarray(_cal(cast_floats(teacher_variables["params"], cdt),
                                 cast_floats(self._semantics(batch), cdt)))
        self._act_scales = tuple(float(s) for s in scales)
        return self._act_scales

    def train_step(self, state, teacher_variables, batch, lr):
        if (self.hp.teacher_compute_dtype == "int8_static"
                and self._act_scales is None):
            self.calibrate_teacher(teacher_variables, batch)
        return self._train_step(state, teacher_variables, batch,
                                jnp.asarray(lr, jnp.float32))

    def student_eval_params(self, state: GANTrainState):
        """EMA weights when --moving_average_decay is on, else the raw
        trained weights — what evaluation and deployment should use."""
        if isinstance(state.extra, dict) and "ema_G" in state.extra:
            return state.extra["ema_G"]
        return state.g.params["G"]

    def generate_student(self, state: GANTrainState, sem: jnp.ndarray):
        return self._gen_student(self.student_eval_params(state), state.g.stats, sem)

    def generate_student_raw(self, state: GANTrainState, batch: Dict):
        """Raw label/instance batch -> image (preprocessing inside jit)."""
        if not hasattr(self, "_gen_raw"):
            def fn(params, stats, batch):
                sem = self._semantics(batch)
                out, _ = self._apply(self.netG_student, params, stats, sem, False)
                return out

            self._gen_raw = jax.jit(fn)
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        return self._gen_raw(self.student_eval_params(state), state.g.stats,
                             device_batch)

    def generate_teacher_raw(self, teacher_variables: Dict, batch: Dict):
        if not hasattr(self, "_gen_t_raw"):
            def fn(tv, batch):
                sem = self._semantics(batch)
                stats = {k: v for k, v in tv.items() if k != "params"}
                out, _ = self._apply(self.netG_teacher, tv["params"], stats, sem, False)
                return out

            self._gen_t_raw = jax.jit(fn)
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        return self._gen_t_raw(teacher_variables, device_batch)

    def generate_teacher(self, teacher_variables: Dict, sem: jnp.ndarray):
        return self._gen_teacher(teacher_variables, sem)
