"""Optimizers and LR schedules.

Adam matches torch.optim.Adam semantics (reference uses Adam everywhere,
betas=(beta1, 0.999), and re-pins the LR per epoch via schedulers —
models/networks.py:67-105).  The learning rate is a *runtime scalar* fed to
every train step, so epoch-level schedules never trigger recompilation.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax


def adam_tx(beta1: float = 0.5, beta2: float = 0.999, eps: float = 1e-8):
    """Direction-only Adam; the LR is applied at update time."""
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps)


def apply_updates(
    tx, params: Any, grads: Any, opt_state: Any, lr: jnp.ndarray
) -> Tuple[Any, Any]:
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, updates), opt_state


# ---------------------------------------------------------------------------
# Epoch-level LR schedules (host side; reference get_scheduler semantics)
# ---------------------------------------------------------------------------


def linear_lr(epoch: int, lr: float, nepochs: int, nepochs_decay: int) -> float:
    """Constant for ``nepochs`` epochs, then linear decay to 0 over
    ``nepochs_decay`` (reference 'linear', networks.py:80-87; epoch is
    1-based like the reference's epoch counter)."""
    factor = 1.0 - max(0, epoch + 1 - nepochs) / float(nepochs_decay + 1)
    return lr * factor


def step_lr(epoch: int, lr: float, decay_iters: int, gamma: float = 0.1) -> float:
    return lr * (gamma ** (epoch // decay_iters))


def cosine_lr(epoch: int, lr: float, nepochs: int) -> float:
    return lr * 0.5 * (1.0 + math.cos(math.pi * (epoch % nepochs) / nepochs))


class PlateauLR:
    """ReduceLROnPlateau (mode='min', factor=0.2, threshold=0.01, patience=5)."""

    def __init__(self, lr: float, factor: float = 0.2, threshold: float = 0.01,
                 patience: int = 5):
        self.lr = lr
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


def schedule_lr(policy: str, epoch: int, lr: float, *, nepochs: int = 100,
                nepochs_decay: int = 100, lr_decay_iters: int = 50,
                plateau: "PlateauLR" = None) -> float:
    if policy == "linear":
        return linear_lr(epoch, lr, nepochs, nepochs_decay)
    if policy == "step":
        return step_lr(epoch, lr, lr_decay_iters)
    if policy == "cosine":
        return cosine_lr(epoch, lr, nepochs)
    if policy == "plateau":
        # stateful: the Trainer owns a PlateauLR and feeds the eval metric
        # into it per epoch (reference networks.py:88-94 + the per-epoch
        # scheduler.step(self.metric) at base_model.py:146-150)
        if plateau is None:
            raise ValueError(
                "lr_policy 'plateau' is stateful — pass the PlateauLR "
                "tracker (the Trainer does this automatically)"
            )
        return plateau.lr
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
