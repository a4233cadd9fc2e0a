"""pix2pix task: conditional PatchGAN + reconstruction loss.

Reference: models/pix2pix_model.py (losses 156-196, D-then-G update order
198-207).  The whole optimisation step is ONE jitted function:

  1. generator forward runs ONCE via jax.vjp — its output feeds the
     discriminator update, and its saved residuals pull the generator
     gradient back without a second forward (the reference keeps the
     autograd graph alive for the same reason),
  2. discriminator update on (A, fake) / (A, real) pairs,
  3. generator update *through the freshly-updated discriminator*, matching
     the reference's ordering semantics.

Under a data mesh the batch arrives shard-annotated and XLA emits the
gradient all-reduces; nothing here is parallelism-aware.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cat_tpu.core.config import InceptionGeneratorConfig, NLayerDiscriminatorConfig
from cat_tpu.models.discriminators import NLayerDiscriminator
from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.models.losses import gan_loss, gradient_penalty, recon_loss
from cat_tpu.train.common import GANTrainState, NetState, apply_net, split_variables
from cat_tpu.train.optim import adam_tx, apply_updates


@dataclass(frozen=True)
class Pix2PixHParams:
    gan_mode: str = "hinge"
    recon_loss_type: str = "l1"
    lambda_gan: float = 1.0
    lambda_recon: float = 100.0
    beta1: float = 0.5
    init_type: str = "normal"
    init_gain: float = 0.02
    # branch-packed inception blocks (identical math/params, wide MXU convs)
    packed_blocks: bool = True
    # rematerialise the generator forward (jax.checkpoint): ~halves G
    # activation memory in exchange for one extra forward in the backward
    # pass — enables reference-resolution crops on memory-tight chips
    remat: bool = False


class Pix2PixTask:
    def __init__(
        self,
        gen_cfg: InceptionGeneratorConfig,
        disc_cfg: Optional[NLayerDiscriminatorConfig] = None,
        hp: Pix2PixHParams = Pix2PixHParams(),
    ):
        self.gen_cfg = gen_cfg
        self.disc_cfg = disc_cfg or NLayerDiscriminatorConfig(
            input_nc=gen_cfg.input_nc + gen_cfg.output_nc
        )
        self.hp = hp
        self.netG = InceptionGenerator(gen_cfg, hp.init_type, hp.init_gain,
                                       packed_blocks=hp.packed_blocks)
        self.netD = NLayerDiscriminator(self.disc_cfg, hp.init_type, hp.init_gain)
        self.tx = adam_tx(hp.beta1)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._generate = jax.jit(
            lambda params, stats, x: apply_net(self.netG, params, stats, x, train=False)[0]
        )

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, height: int, width: int) -> GANTrainState:
        """Initialise on the CPU backend (one accelerator compile per step,
        none per init), then place on the default device."""
        from cat_tpu.train.common import init_on_cpu, to_device

        return to_device(init_on_cpu(self._init_state, rng, height, width))

    def _init_state(self, rng: jax.Array, height: int, width: int) -> GANTrainState:
        rg, rd, rs = jax.random.split(rng, 3)
        xa = jnp.zeros((1, height, width, self.gen_cfg.input_nc))
        xab = jnp.zeros(
            (1, height, width, self.gen_cfg.input_nc + self.gen_cfg.output_nc)
        )
        g_params, g_stats = split_variables(self.netG.init(rg, xa))
        d_params, d_stats = split_variables(self.netD.init(rd, xab))
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(g_params, self.tx.init(g_params), g_stats),
            d=NetState(d_params, self.tx.init(d_params), d_stats),
            rng=rs,
        )

    # -- one optimisation step ------------------------------------------------

    def _step(
        self, state: GANTrainState, batch: Dict[str, jnp.ndarray], lr: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        hp = self.hp
        real_A, real_B = batch["A"], batch["B"]
        rng, r_drop, r_gp = jax.random.split(state.rng, 3)

        # --- generator forward once, saving residuals ---
        def g_forward(g_params):
            fake, new_stats = apply_net(
                self.netG,
                g_params,
                state.g.stats,
                real_A,
                train=True,
                mutable_stats=True,
                rngs={"dropout": r_drop},
            )
            return fake, new_stats

        if hp.remat:  # store inputs only; recompute the forward in the vjp
            g_forward = jax.checkpoint(g_forward)
        fake_B, g_vjp, g_stats = jax.vjp(g_forward, state.g.params, has_aux=True)

        # --- discriminator update (reference backward_D: 160-175) ---
        fake_pair = jnp.concatenate([real_A, fake_B], axis=-1)
        real_pair = jnp.concatenate([real_A, real_B], axis=-1)

        def d_loss_fn(d_params):
            pred_fake, d_stats1 = apply_net(
                self.netD, d_params, state.d.stats, fake_pair,
                train=True, mutable_stats=True,
            )
            pred_real, d_stats2 = apply_net(
                self.netD, d_params, d_stats1, real_pair,
                train=True, mutable_stats=True,
            )
            l_fake = gan_loss(pred_fake, False, hp.gan_mode, True)
            l_real = gan_loss(pred_real, True, hp.gan_mode, True)
            loss = 0.5 * (l_fake + l_real)
            l_gp = jnp.asarray(0.0)
            if hp.gan_mode == "wgangp":
                # the reference implements cal_gradient_penalty but never
                # calls it (loss.py:100-147, zero call sites) — here the
                # Lipschitz penalty IS applied, or the wgangp critic trains
                # unconstrained and diverges
                def d_apply(x):
                    pred, _ = apply_net(self.netD, d_params, state.d.stats,
                                        x, train=True)
                    return pred

                l_gp, _ = gradient_penalty(d_apply, real_pair, fake_pair,
                                           rng=r_gp)
                loss = loss + l_gp
            return loss, (l_fake, l_real, l_gp, d_stats2)

        (_, (l_d_fake, l_d_real, l_d_gp, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d.params)
        d_params, d_opt = apply_updates(
            self.tx, state.d.params, d_grads, state.d.opt_state, lr
        )

        # --- generator update through the updated discriminator ---
        def g_head(fake):
            pred, _ = apply_net(self.netD, d_params, d_stats,
                                jnp.concatenate([real_A, fake], axis=-1), train=True)
            l_gan = gan_loss(pred, True, hp.gan_mode, False) * hp.lambda_gan
            l_rec = recon_loss(fake, real_B, hp.recon_loss_type) * hp.lambda_recon
            return l_gan + l_rec, (l_gan, l_rec)

        (_, (l_g_gan, l_g_rec)), fake_ct = jax.value_and_grad(g_head, has_aux=True)(
            fake_B
        )
        (g_grads,) = g_vjp(fake_ct)
        g_params, g_opt = apply_updates(
            self.tx, state.g.params, g_grads, state.g.opt_state, lr
        )

        new_state = GANTrainState(
            step=state.step + 1,
            g=NetState(g_params, g_opt, g_stats),
            d=NetState(d_params, d_opt, d_stats),
            rng=rng,
        )
        metrics = {
            "G_loss/gan": l_g_gan,
            "G_loss/recon": l_g_rec,
            "D_loss/fake": l_d_fake,
            "D_loss/real": l_d_real,
        }
        if hp.gan_mode == "wgangp":
            metrics["D_loss/gp"] = l_d_gp
        return new_state, metrics

    def train_step(self, state, batch, lr):
        return self._train_step(state, batch, jnp.asarray(lr, jnp.float32))

    # -- inference -------------------------------------------------------------

    def generate(self, state: GANTrainState, x: jnp.ndarray) -> jnp.ndarray:
        return self._generate(state.g.params, state.g.stats, x)
