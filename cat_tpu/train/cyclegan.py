"""CycleGAN task: two generators + two PatchGAN discriminators + replay pools.

Reference: models/cycle_gan_model.py (losses 267-290, G-first-then-D order
292-303, ImagePool buffers 177-178/257-265).

One jitted step:
  1. full cycle forward (G_A, G_B) + identity branches,
  2. generator update against the *pre-update* discriminators (reference
     order),
  3. both image pools (device-resident arrays in the state) mix the fresh
     fakes with history,
  4. discriminator update on pooled fakes vs reals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from cat_tpu.core.config import InceptionGeneratorConfig, NLayerDiscriminatorConfig
from cat_tpu.models.discriminators import NLayerDiscriminator
from cat_tpu.models.generator import InceptionGenerator
from cat_tpu.models.losses import gan_loss, gradient_penalty, recon_loss
from cat_tpu.train.common import GANTrainState, NetState, apply_net, split_variables
from cat_tpu.train.optim import adam_tx, apply_updates
from cat_tpu.utils.image_pool import PoolState, pool_init, pool_query


@dataclass(frozen=True)
class CycleGANHParams:
    gan_mode: str = "lsgan"
    lambda_A: float = 10.0
    lambda_B: float = 10.0
    lambda_identity: float = 0.5
    pool_size: int = 50
    beta1: float = 0.5
    init_type: str = "normal"
    init_gain: float = 0.02
    # branch-packed inception blocks (identical math/params, wide MXU convs)
    packed_blocks: bool = True
    # rematerialise generator forwards in the G step (jax.checkpoint):
    # recompute-in-backward instead of storing activations of all six
    # generator applications — enables 256px batch>=16 on a 16G chip
    remat: bool = False


@flax.struct.dataclass
class CyclePools:
    fake_A: PoolState
    fake_B: PoolState


class CycleGANTask:
    """Generators: G_A: A->B, G_B: B->A; discriminators D_A on B-domain,
    D_B on A-domain."""

    def __init__(
        self,
        gen_cfg: InceptionGeneratorConfig,
        disc_cfg: Optional[NLayerDiscriminatorConfig] = None,
        hp: CycleGANHParams = CycleGANHParams(),
    ):
        assert gen_cfg.input_nc == gen_cfg.output_nc or hp.lambda_identity == 0.0
        self.gen_cfg = gen_cfg
        self.disc_cfg = disc_cfg or NLayerDiscriminatorConfig(input_nc=gen_cfg.output_nc)
        self.hp = hp
        self.netG = InceptionGenerator(gen_cfg, hp.init_type, hp.init_gain,
                                       packed_blocks=hp.packed_blocks)
        self.netD = NLayerDiscriminator(self.disc_cfg, hp.init_type, hp.init_gain)
        self.tx = adam_tx(hp.beta1)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._generate = jax.jit(
            lambda params, stats, x: apply_net(self.netG, params, stats, x, train=False)[0]
        )

    def init_state(self, rng: jax.Array, height: int, width: int) -> GANTrainState:
        from cat_tpu.train.common import init_on_cpu, to_device

        return to_device(init_on_cpu(self._init_state, rng, height, width))

    def _init_state(self, rng: jax.Array, height: int, width: int) -> GANTrainState:
        keys = jax.random.split(rng, 6)
        xa = jnp.zeros((1, height, width, self.gen_cfg.input_nc))
        g_params = {}
        g_stats = {}
        for name, k in zip(("A", "B"), keys[:2]):
            p, s = split_variables(self.netG.init(k, xa))
            g_params[name], g_stats[name] = p, s
        d_params = {}
        d_stats = {}
        for name, k in zip(("A", "B"), keys[2:4]):
            p, s = split_variables(self.netD.init(k, xa))
            d_params[name], d_stats[name] = p, s
        pools = CyclePools(
            fake_A=pool_init(self.hp.pool_size, height, width, self.gen_cfg.input_nc),
            fake_B=pool_init(self.hp.pool_size, height, width, self.gen_cfg.output_nc),
        )
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(g_params, self.tx.init(g_params), g_stats),
            d=NetState(d_params, self.tx.init(d_params), d_stats),
            rng=keys[4],
            extra=pools,
        )

    def _step(
        self, state: GANTrainState, batch: Dict[str, jnp.ndarray], lr: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        hp = self.hp
        real_A, real_B = batch["A"], batch["B"]
        rng, r_pool_a, r_pool_b, r_gp_a, r_gp_b = jax.random.split(state.rng, 5)
        d_params, d_stats = state.d.params, state.d.stats

        def g_fwd(g_params, name, x):
            def fwd(p, xx):
                out, _ = apply_net(self.netG, p, state.g.stats[name], xx,
                                   train=True)
                return out

            if hp.remat:
                fwd = jax.checkpoint(fwd)
            return fwd(g_params[name], x)

        # --- generator update (old discriminators; reference 292-298) ---
        def g_loss_fn(g_params):
            fake_B = g_fwd(g_params, "A", real_A)
            rec_A = g_fwd(g_params, "B", fake_B)
            fake_A = g_fwd(g_params, "B", real_B)
            rec_B = g_fwd(g_params, "A", fake_A)
            losses = {}
            if hp.lambda_identity > 0:
                idt_A = g_fwd(g_params, "A", real_B)
                idt_B = g_fwd(g_params, "B", real_A)
                losses["G_loss/idt_A"] = (
                    recon_loss(idt_A, real_B, "l1") * hp.lambda_B * hp.lambda_identity
                )
                losses["G_loss/idt_B"] = (
                    recon_loss(idt_B, real_A, "l1") * hp.lambda_A * hp.lambda_identity
                )
            else:
                losses["G_loss/idt_A"] = jnp.zeros(())
                losses["G_loss/idt_B"] = jnp.zeros(())
            pred_A, _ = apply_net(self.netD, d_params["A"], d_stats["A"], fake_B, train=True)
            pred_B, _ = apply_net(self.netD, d_params["B"], d_stats["B"], fake_A, train=True)
            losses["G_loss/gan_A"] = gan_loss(pred_A, True, hp.gan_mode, False)
            losses["G_loss/gan_B"] = gan_loss(pred_B, True, hp.gan_mode, False)
            losses["G_loss/cycle_A"] = recon_loss(rec_A, real_A, "l1") * hp.lambda_A
            losses["G_loss/cycle_B"] = recon_loss(rec_B, real_B, "l1") * hp.lambda_B
            total = sum(losses.values())
            return total, (losses, fake_A, fake_B)

        (_, (g_losses, fake_A, fake_B)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        g_params, g_opt = apply_updates(
            self.tx, state.g.params, g_grads, state.g.opt_state, lr
        )

        # --- replay pools (reference ImagePool.query) ---
        pools: CyclePools = state.extra
        pool_B, fake_B_mixed = pool_query(pools.fake_B, jax.lax.stop_gradient(fake_B), r_pool_a)
        pool_A, fake_A_mixed = pool_query(pools.fake_A, jax.lax.stop_gradient(fake_A), r_pool_b)

        # --- discriminator update (reference backward_D_basic: 238-265) ---
        def d_loss_fn(d_params):
            losses = {}
            new_stats = {}
            for name, real, fake, r_gp in (
                ("A", real_B, fake_B_mixed, r_gp_a),
                ("B", real_A, fake_A_mixed, r_gp_b),
            ):
                pred_real, s1 = apply_net(
                    self.netD, d_params[name], d_stats[name], real,
                    train=True, mutable_stats=True,
                )
                pred_fake, s2 = apply_net(
                    self.netD, d_params[name], s1, fake, train=True, mutable_stats=True
                )
                losses[f"D_loss/{name}"] = 0.5 * (
                    gan_loss(pred_real, True, hp.gan_mode, True)
                    + gan_loss(pred_fake, False, hp.gan_mode, True)
                )
                if hp.gan_mode == "wgangp":
                    # reference cal_gradient_penalty has zero call sites;
                    # here the Lipschitz penalty actually constrains D
                    dp, ds = d_params[name], d_stats[name]

                    def d_apply(x, dp=dp, ds=ds):
                        pred, _ = apply_net(self.netD, dp, ds, x, train=True)
                        return pred

                    gp, _ = gradient_penalty(d_apply, real, fake, rng=r_gp)
                    losses[f"D_loss/gp_{name}"] = gp
                new_stats[name] = s2
            return sum(losses.values()), (losses, new_stats)

        (_, (d_losses, d_stats_new)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_params)
        d_params_new, d_opt = apply_updates(
            self.tx, d_params, d_grads, state.d.opt_state, lr
        )

        new_state = GANTrainState(
            step=state.step + 1,
            g=NetState(g_params, g_opt, state.g.stats),
            d=NetState(d_params_new, d_opt, d_stats_new),
            rng=rng,
            extra=CyclePools(fake_A=pool_A, fake_B=pool_B),
        )
        return new_state, {**g_losses, **d_losses}

    def train_step(self, state, batch, lr):
        return self._train_step(state, batch, jnp.asarray(lr, jnp.float32))

    def generate(self, state: GANTrainState, x: jnp.ndarray, direction: str = "AtoB"):
        name = "A" if direction == "AtoB" else "B"
        return self._generate(state.g.params[name], state.g.stats[name], x)
