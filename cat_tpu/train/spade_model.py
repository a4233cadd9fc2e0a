"""SPADE (GauGAN) training task.

Reference: models/spade_model.py + modules/spade_modules/spade_model_modules.py.

Semantics reproduced:
  * input preprocessing: label ids -> one-hot semantics (+ optional
    dontcare channel) + instance-boundary edge channel
    (spade_model.py:142-179),
  * TTUR: G lr/2, D lr*2, betas (0, 0.9) unless no_TTUR
    (spade_model_modules.py:52-65),
  * G loss = hinge GAN + feature-matching L1 (λ_feat/num_D over every
    intermediate D feature) + VGG perceptual (λ_vgg)
    (spade_model_modules.py:93-134),
  * fake and real are concatenated through D once and split
    (discriminate/divide_pred :136-155),
  * G updates first against the old D; the D step re-generates the fake
    from the *updated* generator under stop-gradient
    (spade_model.py:207-215, spade_model_modules.py:118-126).

State notes: the generator carries batch_stats (sync-batch-norm); the
discriminator carries the spectral-norm power-iteration vectors ('spectral'
collection).  Both live in the NetState.stats dict keyed by collection.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cat_tpu.core.spade_config import MultiscaleDiscriminatorConfig, SPADEGeneratorConfig
from cat_tpu.models.losses import gan_loss
from cat_tpu.models.spade import MultiscaleDiscriminator, SPADEGenerator
from cat_tpu.models.vgg import vgg_loss
from cat_tpu.train.common import GANTrainState, NetState, init_on_cpu, to_device
from cat_tpu.train.optim import adam_tx, apply_updates


# ---------------------------------------------------------------------------
# input preprocessing (pure; replaces spade_model.preprocess_input:142-161)
# ---------------------------------------------------------------------------


def one_hot_semantics(label: jnp.ndarray, n_labels: int) -> jnp.ndarray:
    """Integer label map (N,H,W) or (N,H,W,1) -> one-hot NHWC."""
    if label.ndim == 4:
        label = label[..., 0]
    return jax.nn.one_hot(label.astype(jnp.int32), n_labels, dtype=jnp.float32)


def instance_edges(inst: jnp.ndarray) -> jnp.ndarray:
    """Instance-boundary map (reference get_edges, spade_model.py:169-179)."""
    if inst.ndim == 4:
        inst = inst[..., 0]
    e = jnp.zeros_like(inst, dtype=bool)
    dx = inst[:, :, 1:] != inst[:, :, :-1]
    e = e.at[:, :, 1:].set(e[:, :, 1:] | dx)
    e = e.at[:, :, :-1].set(e[:, :, :-1] | dx)
    dy = inst[:, 1:, :] != inst[:, :-1, :]
    e = e.at[:, 1:, :].set(e[:, 1:, :] | dy)
    e = e.at[:, :-1, :].set(e[:, :-1, :] | dy)
    return e.astype(jnp.float32)[..., None]


def preprocess_input(
    label: jnp.ndarray,
    instance: Optional[jnp.ndarray],
    label_nc: int,
    contain_dontcare_label: bool = False,
) -> jnp.ndarray:
    """label (+instance) -> input semantics NHWC.

    With contain_dontcare_label, id 255 is remapped to the extra last
    channel (reference: label==255 -> label_nc, one-hot of label_nc+1).
    """
    if label.ndim == 4:
        label = label[..., 0]
    n = label_nc + (1 if contain_dontcare_label else 0)
    lab = label.astype(jnp.int32)
    if contain_dontcare_label:
        lab = jnp.where(lab >= label_nc, label_nc, lab)
    sem = jax.nn.one_hot(lab, n, dtype=jnp.float32)
    if instance is not None:
        sem = jnp.concatenate([sem, instance_edges(instance)], axis=-1)
    return sem


# ---------------------------------------------------------------------------
# hyper-params & task
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SPADEHParams:
    gan_mode: str = "hinge"
    lambda_gan: float = 1.0
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_TTUR: bool = False
    beta1: float = 0.0
    beta2: float = 0.9
    init_type: str = "xavier"
    init_gain: float = 0.02
    # evaluate SPADE blocks with branch-packed convolutions (identical math
    # and parameter tree; models/spade.py SPADEBlock docstring).  Default ON:
    # measured +29% on the 512x256 batch-16 teacher-train step
    # (tools/spade_perf.py --task; PARITY.md)
    packed_blocks: bool = True
    # 'float32' | 'bfloat16' — bf16 generator compute with f32 master
    # weights, norm statistics and losses (same contract as the SPADE
    # distiller's compute_dtype)
    compute_dtype: str = "float32"
    # dtype of the VGG19 perceptual sweep (see SPADEDistillHParams)
    vgg_compute_dtype: str = "float32"
    # rematerialise the generator forward (jax.checkpoint): recompute in the
    # backward instead of storing activations — the reference GauGAN trains
    # at 512x256 crops (train_inception_student_5p6B.sh), which needs this
    # on 16G chips
    remat: bool = False


def feature_matching_loss(pred_fake, pred_real) -> jnp.ndarray:
    """L1 over every intermediate D feature, averaged over scales
    (spade_model_modules.py:100-112)."""
    num_d = len(pred_fake)
    total = jnp.zeros(())
    for scale_f, scale_r in zip(pred_fake, pred_real):
        for f, r in zip(scale_f[:-1], scale_r[:-1]):
            total = total + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r))) / num_d
    return total


class SPADETask:
    def __init__(
        self,
        gen_cfg: SPADEGeneratorConfig,
        disc_cfg: Optional[MultiscaleDiscriminatorConfig] = None,
        hp: SPADEHParams = SPADEHParams(),
        vgg_variables: Optional[Dict] = None,
        input_nc: Optional[int] = None,
    ):
        self.gen_cfg = gen_cfg
        self.disc_cfg = disc_cfg or MultiscaleDiscriminatorConfig(
            input_nc=gen_cfg.semantic_nc + gen_cfg.output_nc
        )
        self.hp = hp
        self.vgg_variables = vgg_variables
        # raw-batch preprocessing spec (labels -> one-hot (+dontcare) + edges)
        self.label_nc = input_nc or gen_cfg.semantic_nc
        self.contain_dontcare = False
        self.netG = SPADEGenerator(gen_cfg, hp.init_type, hp.init_gain,
                                   packed_blocks=hp.packed_blocks)
        self.netD = MultiscaleDiscriminator(self.disc_cfg, hp.init_type, hp.init_gain)
        self.tx = adam_tx(hp.beta1, hp.beta2)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._generate = jax.jit(self._gen_eval)

    @property
    def lr_mults(self) -> Tuple[float, float]:
        """(G, D) learning-rate multipliers (TTUR)."""
        return (1.0, 1.0) if self.hp.no_TTUR else (0.5, 2.0)

    # --------------------------------------------------------------- state

    def init_state(self, rng: jax.Array, height: int, width: int) -> GANTrainState:
        def build():
            kg, kd, ks = jax.random.split(rng, 3)
            seg = jnp.zeros((1, height, width, self.gen_cfg.semantic_nc))
            gv = self.netG.init(kg, seg)
            dv = self.netD.init(
                kd, jnp.zeros((1, height, width, self.disc_cfg.input_nc))
            )
            g_stats = {k: v for k, v in gv.items() if k != "params"}
            d_stats = {k: v for k, v in dv.items() if k != "params"}
            return GANTrainState(
                step=jnp.zeros((), jnp.int32),
                g=NetState(gv["params"], self.tx.init(gv["params"]), g_stats),
                d=NetState(dv["params"], self.tx.init(dv["params"]), d_stats),
                rng=ks,
            )

        return to_device(init_on_cpu(build))

    # ---------------------------------------------------------------- apply

    def _apply_g(self, params, stats, seg, train, taps=()):
        variables = {"params": params, **stats}
        if train and stats:
            out, new = self.netG.apply(
                variables, seg, train=True, taps=taps, mutable=list(stats)
            )
            return out, new
        return self.netG.apply(variables, seg, train=train, taps=taps), stats

    def _apply_d(self, params, stats, x, train, mutable=False):
        variables = {"params": params, **stats}
        if mutable and stats:
            out, new = self.netD.apply(variables, x, train=train, mutable=list(stats))
            return out, new
        return self.netD.apply(variables, x, train=train), stats

    def _discriminate(self, d_params, d_stats, sem, fake, real, train, mutable=False):
        fake_cat = jnp.concatenate([sem, fake], axis=-1)
        real_cat = jnp.concatenate([sem, real], axis=-1)
        both = jnp.concatenate([fake_cat, real_cat], axis=0)
        out, new_stats = self._apply_d(d_params, d_stats, both, train, mutable)
        half = sem.shape[0]
        pred_fake = [[t[:half] for t in scale] for scale in out]
        pred_real = [[t[half:] for t in scale] for scale in out]
        return pred_fake, pred_real, new_stats

    # ----------------------------------------------------------------- step

    def _semantics(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """One-hot + edge preprocessing runs INSIDE the jitted step so raw
        integer label maps are what crosses host->device."""
        if "semantics" in batch:
            return batch["semantics"]
        return preprocess_input(
            batch["label"], batch.get("instance"), self.label_nc,
            self.contain_dontcare,
        )

    def _step(self, state: GANTrainState, batch: Dict[str, jnp.ndarray],
              lr: jnp.ndarray):
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
        rng, _ = jax.random.split(state.rng)

        # --- G update (old D) ---
        def g_loss_fn(g_params):
            g_fwd = (jax.checkpoint(self._apply_g, static_argnums=(3,))
                     if hp.remat else self._apply_g)
            fake, g_stats = g_fwd(down(g_params), state.g.stats, sem, True)
            fake = up(fake)
            pred_fake, pred_real, _ = self._discriminate(
                state.d.params, state.d.stats, sem, down(fake), down(real_B),
                train=True
            )
            pred_fake, pred_real = up(pred_fake), up(pred_real)
            l_gan = gan_loss(pred_fake, True, hp.gan_mode, False) * hp.lambda_gan
            l_feat = feature_matching_loss(pred_fake, pred_real) * hp.lambda_feat
            if self.vgg_variables is not None and hp.lambda_vgg > 0:
                l_vgg = vgg_loss(self.vgg_variables, fake, real_B,
                                 hp.vgg_compute_dtype) * hp.lambda_vgg
            else:
                l_vgg = jnp.zeros(())
            total = l_gan + l_feat + l_vgg
            return total, (l_gan, l_feat, l_vgg, g_stats)

        (_, (l_gan, l_feat, l_vgg, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        g_params, g_opt = apply_updates(
            self.tx, state.g.params, g_grads, state.g.opt_state, lr_g
        )

        # --- D update: regenerate fake from the UPDATED G, no grad ---
        fake, _ = self._apply_g(down(g_params), g_stats, sem, train=True)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            # down() params AND reals: the whole D update runs in compute
            # dtype and both classes reach D at the same precision (same
            # contract as SPADEDistiller's D step)
            pred_fake, pred_real, d_stats = self._discriminate(
                down(d_params), state.d.stats, sem, fake, down(real_B),
                train=True, mutable=True
            )
            pred_fake, pred_real = up(pred_fake), up(pred_real)
            l_fake = gan_loss(pred_fake, False, hp.gan_mode, True)
            l_real = gan_loss(pred_real, True, hp.gan_mode, True)
            return l_fake + l_real, (l_fake, l_real, d_stats)

        (_, (l_d_fake, l_d_real, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d.params)
        d_params, d_opt = apply_updates(
            self.tx, state.d.params, d_grads, state.d.opt_state, lr_d
        )

        new_state = GANTrainState(
            step=state.step + 1,
            g=NetState(g_params, g_opt, g_stats),
            d=NetState(d_params, d_opt, d_stats),
            rng=rng,
        )
        metrics = {
            "G_loss/gan": l_gan,
            "G_loss/feat": l_feat,
            "G_loss/vgg": l_vgg,
            "D_loss/fake": l_d_fake,
            "D_loss/real": l_d_real,
        }
        return new_state, metrics

    def train_step(self, state, batch, lr):
        return self._train_step(state, batch, jnp.asarray(lr, jnp.float32))

    def _gen_eval(self, params, stats, sem):
        out, _ = self._apply_g(params, stats, sem, train=False)
        return out

    def generate(self, state: GANTrainState, sem: jnp.ndarray) -> jnp.ndarray:
        return self._generate(state.g.params, state.g.stats, sem)

    def generate_raw(self, state: GANTrainState, batch: Dict) -> jnp.ndarray:
        """Raw label/instance batch -> image (preprocessing inside jit);
        feeds the FID/mIoU evaluators during teacher training (reference
        spade_model.evaluate_model:217-288)."""
        if not hasattr(self, "_gen_raw"):
            def fn(params, stats, batch):
                return self._gen_eval(params, stats, self._semantics(batch))

            self._gen_raw = jax.jit(fn)
        device_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        return self._gen_raw(state.g.params, state.g.stats, device_batch)
