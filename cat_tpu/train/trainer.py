"""The training driver: epoch loop, eval/checkpoint cadence, LR schedule.

Reference semantics: trainer.py:98-175 — per-iteration optimise, print every
``print_freq``, evaluate + save 'latest' every ``save_latest_freq`` iters
(and at iter_base), per-epoch checkpoints every ``save_epoch_freq``,
best-checkpoint tracking via evaluator flags, per-epoch LR update.

The driver is task-agnostic: it consumes
  * ``step_fn(state, device_batch, lr) -> (state, metrics)`` (jitted),
  * ``evaluate_fn(state, step) -> (metrics, flags)`` where flags may contain
    is_best / is_best_A / is_best_B,
  * ``save_fn(state, tag)``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import numpy as np

from cat_tpu.train.optim import PlateauLR, schedule_lr
from cat_tpu.utils.logger import Logger


@dataclass
class TrainerConfig:
    log_dir: str = "logs"
    nepochs: int = 5
    nepochs_decay: int = 15
    epoch_base: int = 1
    iter_base: int = 1
    print_freq: int = 100
    save_latest_freq: int = 20000
    save_epoch_freq: int = 5
    lr: float = 2e-4
    lr_policy: str = "linear"
    lr_decay_iters: int = 50
    seed: int = 233


def _device_batch(batch: Dict) -> Dict:
    import jax

    return {
        k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jax.Array))
    }


class Trainer:
    def __init__(
        self,
        step_fn: Callable,
        dataloader,
        cfg: TrainerConfig,
        evaluate_fn: Optional[Callable] = None,
        save_fn: Optional[Callable] = None,
        logger: Optional[Logger] = None,
        device_put_fn: Optional[Callable] = None,
        copy_tag_fn: Optional[Callable] = None,
    ):
        """``device_put_fn`` (jax.device_put or a mesh shard fn) enables
        host->device double buffering: the next batch's transfer overlaps
        the running step (data/loader.device_prefetch).  ``copy_tag_fn(src,
        dst)`` duplicates an already-written checkpoint tag host-side so
        multi-tag saves (latest/iterN/best) serialise the state only once."""
        self.step_fn = step_fn
        self.dataloader = dataloader
        self.cfg = cfg
        self.evaluate_fn = evaluate_fn
        self.save_fn = save_fn
        self.logger = logger or Logger(cfg.log_dir)
        self.device_put_fn = device_put_fn
        self.copy_tag_fn = copy_tag_fn
        # --lr_policy plateau: stateful ReduceLROnPlateau stepped once per
        # epoch (reference base_model.py:146-150).  The reference never
        # feeds scheduler.step() a real value (self.metric stays 0,
        # base_model.py:48); here the latest eval's primary metric (fid /
        # mIoU) drives it, falling back to the reference's constant when no
        # judge is configured.
        self.plateau = PlateauLR(cfg.lr) if cfg.lr_policy == "plateau" else None
        self._plateau_metric = 0.0

    def _save(self, state, tag: str):
        if self.save_fn is not None:
            self.save_fn(state, tag)

    def _save_tags(self, state, tags):
        """Save ``state`` under several tags with ONE serialisation.

        The reference re-saves per tag (trainer.py:141-155); with multi-GB
        train states behind a slow device link, the device->host fetch must
        happen once — the first tag is written by ``save_fn`` and the rest
        are host-side file copies via ``copy_tag_fn`` when available.
        """
        if self.save_fn is None:
            return
        ordered = list(dict.fromkeys(tags))
        self.save_fn(state, ordered[0])
        for tag in ordered[1:]:
            if self.copy_tag_fn is not None:
                self.copy_tag_fn(ordered[0], tag)
            else:
                self.save_fn(state, tag)

    def _evaluate(self, state, epoch: int, total_iter: int, message: str,
                  extra_tags=(), save: bool = True):
        if self.evaluate_fn is None:
            # no evaluators configured (e.g. a judge-less zero-egress run):
            # still checkpoint 'latest' at cadence — the reference saves at
            # save_latest_freq/save_epoch_freq regardless of metrics
            # (trainer.py:141-151); skipping it loses work on preemption
            self.logger.print_info(message)
            if save:
                self._save_tags(state, ["latest", *extra_tags])
            return {}
        start = time.time()
        metrics, flags = self.evaluate_fn(state, total_iter)
        primary = [v for k, v in metrics.items()
                   if k.startswith("metric/")
                   and not k.endswith(("-mean", "-best"))]
        if primary:
            self._plateau_metric = float(primary[0])
        self.logger.print_current_metrics(epoch, total_iter, metrics, time.time() - start)
        self.logger.plot(metrics, total_iter)
        self.logger.print_info(message)
        best_tags = []
        if flags.get("is_best"):
            best_tags.append("best")
        if flags.get("is_best_A"):
            best_tags.append("best_A")
        if flags.get("is_best_B"):
            best_tags.append("best_B")
        if not save:
            # the startup probe doesn't checkpoint at cadence, but the eval
            # above already registered any new best in the tracker — that
            # best must exist on disk or a run whose later evals never beat
            # it ends with no (or a stale) best_net_G
            if best_tags:
                self._save_tags(state, best_tags)
            return metrics
        tags = ["latest"]
        if best_tags:
            tags += [f"iter{total_iter}", *best_tags]
        self._save_tags(state, tags + list(extra_tags))
        return metrics

    def fit(self, state) -> Any:
        cfg = self.cfg
        start_epoch = cfg.epoch_base
        end_epoch = cfg.epoch_base + cfg.nepochs + cfg.nepochs_decay - 1
        total_iter = cfg.iter_base
        for epoch in range(start_epoch, end_epoch + 1):
            epoch_start = time.time()
            lr = schedule_lr(
                cfg.lr_policy,
                epoch - 1,
                cfg.lr,
                nepochs=cfg.nepochs,
                nepochs_decay=cfg.nepochs_decay,
                lr_decay_iters=cfg.lr_decay_iters,
                plateau=self.plateau,
            )
            batch_iter = (_device_batch(b) for b in self.dataloader)
            if self.device_put_fn is not None:
                from cat_tpu.data.loader import device_prefetch

                batch_iter = device_prefetch(batch_iter, self.device_put_fn)
            for batch in batch_iter:
                iter_start = time.time()
                state, metrics = self.step_fn(state, batch, lr)
                if total_iter % cfg.print_freq == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    self.logger.print_current_errors(
                        epoch, total_iter, host, time.time() - iter_start
                    )
                    self.logger.plot(host, total_iter)
                if total_iter % cfg.save_latest_freq == 0 or total_iter == cfg.iter_base:
                    # the iter_base eval is a startup smoke probe (metrics
                    # from the initial weights); it logs but does not
                    # checkpoint — the reference only saves at cadence
                    state = self._eval_and_continue(
                        state, epoch, total_iter,
                        save=total_iter != cfg.iter_base or
                        total_iter % cfg.save_latest_freq == 0,
                    )
                total_iter += 1
            self.logger.print_info(
                "End of epoch %d / %d \t Time Taken: %.2f sec"
                % (epoch, end_epoch, time.time() - epoch_start)
            )
            if epoch % cfg.save_epoch_freq == 0 or epoch == end_epoch:
                self._evaluate(
                    state, epoch, total_iter,
                    f"Saving the model at the end of epoch {epoch}, iters {total_iter}",
                    extra_tags=(str(epoch),),
                )
            if self.plateau is not None:
                new_lr = self.plateau.update(self._plateau_metric)
                if new_lr != lr:
                    self.logger.print_info(
                        f"plateau: learning rate {lr:.3g} -> {new_lr:.3g} "
                        f"(metric {self._plateau_metric:.4f})"
                    )
        return state

    def _eval_and_continue(self, state, epoch, total_iter, save: bool = True):
        self._evaluate(
            state, epoch, total_iter,
            f"Saving the latest model (epoch {epoch}, total_steps {total_iter})"
            if save else
            f"Evaluated the initial model (epoch {epoch}, total_steps {total_iter})",
            save=save,
        )
        return state
