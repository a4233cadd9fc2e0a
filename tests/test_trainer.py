"""Trainer driver cadence, LR schedules, checkpoint round-trip, CLI defaults."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.train.optim import PlateauLR, cosine_lr, linear_lr, schedule_lr, step_lr
from cat_tpu.train.trainer import Trainer, TrainerConfig
from cat_tpu.utils import checkpoint as ckpt
from cat_tpu.utils.logger import Logger


class FakeLoader:
    def __init__(self, n_batches, batch_size=2):
        self.n = n_batches
        self.batch_size = batch_size

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {"x": np.full((self.batch_size, 2), float(i), np.float32)}


def test_trainer_cadence(tmp_path):
    calls = {"steps": [], "evals": [], "saves": []}

    def step_fn(state, batch, lr):
        calls["steps"].append(lr)
        return state + 1, {"loss": jnp.asarray(float(state))}

    def evaluate_fn(state, step):
        calls["evals"].append(step)
        return {"metric/fid": 1.0}, {"is_best": True}

    def save_fn(state, tag):
        calls["saves"].append(tag)

    cfg = TrainerConfig(
        log_dir=str(tmp_path), nepochs=2, nepochs_decay=2,
        print_freq=2, save_latest_freq=3, save_epoch_freq=2, lr=1.0,
        lr_policy="linear",
    )
    trainer = Trainer(step_fn, FakeLoader(3), cfg, evaluate_fn, save_fn,
                      Logger(str(tmp_path)))
    final = trainer.fit(0)
    assert final == 12  # 4 epochs x 3 batches
    # eval at iter_base(1), every 3 iters, and at epoch 2 & 4 ends
    assert 1 in calls["evals"]
    # per-epoch LR: epochs 1-2 full, then linear decay over 2 epochs
    assert calls["steps"][0] == 1.0
    assert calls["steps"][-1] < 1.0
    # best checkpoints saved
    assert "best" in calls["saves"] and "latest" in calls["saves"]
    assert "2" in calls["saves"] and "4" in calls["saves"]
    assert os.path.exists(os.path.join(tmp_path, "scalars.jsonl"))


def test_lr_schedules():
    # linear: constant for nepochs, decaying to ~0 afterwards
    assert linear_lr(0, 2e-4, 100, 100) == 2e-4
    assert linear_lr(99, 2e-4, 100, 100) == 2e-4
    assert linear_lr(199, 2e-4, 100, 100) < 2e-5
    assert abs(step_lr(100, 1.0, 50) - 0.01) < 1e-12
    assert abs(cosine_lr(0, 1.0, 100) - 1.0) < 1e-9
    p = PlateauLR(1.0, patience=1)
    p.update(1.0)
    p.update(1.0)
    lr = p.update(1.0)  # two bad epochs -> decay
    assert lr == 0.2
    assert schedule_lr("linear", 0, 1.0, nepochs=10, nepochs_decay=10) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig

    cfg = InceptionGeneratorConfig.make(ngf=4, channels=None,
                                        channels_reduction_factor=2,
                                        kernel_sizes=(1, 3), n_blocks=2)
    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)},
            "batch_stats": {"m": np.zeros(3)}}
    path = ckpt.save_net(str(tmp_path), "best", "G", tree, cfg)
    assert path.endswith("best_net_G.msgpack")
    loaded, cfg2 = ckpt.load_net(str(tmp_path), "best", "G")
    np.testing.assert_allclose(loaded["params"]["w"], tree["params"]["w"])
    assert cfg2 == cfg

    # full train-state round trip (with `like` restoring pytree types)
    state = {"step": jnp.asarray(3), "opt": {"mu": jnp.ones((2, 2))}}
    ckpt.save_train_state(str(tmp_path), "latest", state)
    restored = ckpt.load_train_state(str(tmp_path), "latest", state)
    assert int(restored["step"]) == 3


def test_cli_defaults_match_reference():
    """Key defaults mirror the reference option surface."""
    import argparse

    from cat_tpu import cli

    parser = argparse.ArgumentParser()
    cli.base_arguments(parser)
    cli.train_arguments(parser)
    opt = parser.parse_args(["--dataroot", "x"])
    assert opt.seed == 233  # base_options.py:33-36
    assert opt.norm == "instance"
    assert opt.load_size == 286 and opt.crop_size == 256
    assert opt.kernel_sizes == [3, 5, 7]
    assert opt.lr == 2e-4 and opt.beta1 == 0.5
    assert opt.gan_mode == "hinge"
    assert opt.pool_size == 50
    assert opt.ngf == 64 and opt.ndf == 128
    assert opt.lambda_recon == 100.0


def test_trainer_saves_latest_without_evaluators(tmp_path):
    """A judge-less run (no evaluate_fn) must still checkpoint 'latest' at
    cadence — reference trainer.py:141-151 saves regardless of metrics."""
    saves = []

    def step_fn(state, batch, lr):
        return state + 1, {"loss": jnp.asarray(0.0)}

    cfg = TrainerConfig(
        log_dir=str(tmp_path), nepochs=1, nepochs_decay=1,
        print_freq=10, save_latest_freq=2, save_epoch_freq=1, lr=1.0,
    )
    trainer = Trainer(step_fn, FakeLoader(3), cfg, evaluate_fn=None,
                      save_fn=lambda state, tag: saves.append(tag),
                      logger=Logger(str(tmp_path)))
    trainer.fit(0)
    assert "latest" in saves
    assert "1" in saves and "2" in saves  # per-epoch saves still happen


def test_trainer_single_serialisation_with_copy_tag(tmp_path):
    """With copy_tag_fn, a multi-tag eval (latest + iterN + best [+ epoch])
    serialises via save_fn ONCE and duplicates the rest host-side — a
    multi-GB state behind a slow device link must be fetched once, not per
    tag (reference re-saves per tag, trainer.py:141-155)."""
    saves, copies = [], []

    def step_fn(state, batch, lr):
        return state + 1, {"loss": jnp.asarray(0.0)}

    def evaluate_fn(state, step):
        return {"metric/fid": 1.0}, {"is_best": True}

    cfg = TrainerConfig(
        log_dir=str(tmp_path), nepochs=1, nepochs_decay=0,
        print_freq=10, save_latest_freq=100, save_epoch_freq=1, lr=1.0,
    )
    trainer = Trainer(step_fn, FakeLoader(3), cfg, evaluate_fn,
                      save_fn=lambda state, tag: saves.append(tag),
                      logger=Logger(str(tmp_path)),
                      copy_tag_fn=lambda s, d: copies.append((s, d)))
    trainer.fit(0)
    # iter_base eval is a smoke probe (no cadence save) — but it registered
    # a best in the tracker, so the best tag must hit disk; the epoch-end
    # eval then serialises exactly once more
    assert saves == ["best", "latest"]
    # everything else arrived as host-side copies of 'latest'
    assert ("latest", "best") in copies
    assert ("latest", "1") in copies
    assert all(src == "latest" for src, _ in copies)


def test_copy_tag_duplicates_checkpoint_files(tmp_path):
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    ckpt.save_net(str(tmp_path), "latest", "G", tree)
    ckpt.save_train_state(str(tmp_path), "latest", tree)
    n = ckpt.copy_tag(str(tmp_path), "latest", "best")
    assert n == 2
    loaded = ckpt.load_net(str(tmp_path), "best", "G", like=tree)[0]
    np.testing.assert_array_equal(loaded["w"], tree["w"])
    # prefix safety: '1' must not match '10_*'
    ckpt.save_train_state(str(tmp_path), "1", tree)
    ckpt.save_train_state(str(tmp_path), "10", tree)
    assert ckpt.copy_tag(str(tmp_path), "1", "one") == 1


def test_copy_tag_removes_stale_and_respects_sibling_tags(tmp_path):
    """A dst-tag file with no src counterpart is a leftover from an earlier
    run with different options (e.g. --save_full_state 1 then 0) and must
    be removed, or the new best_net_G would pair with last run's
    best_state; and tag 'best' must never touch 'best_A_*' files."""
    tree = {"w": np.arange(4, dtype=np.float32)}
    # run 1: full state saved under best
    ckpt.save_net(str(tmp_path), "best", "G", tree)
    ckpt.save_train_state(str(tmp_path), "best", tree)
    ckpt.save_net(str(tmp_path), "best_A", "G", {"w": tree["w"] * 2})
    # run 2: saves nets only (no state) under latest, then copies tags
    tree2 = {"w": tree["w"] + 10}
    ckpt.save_net(str(tmp_path), "latest", "G", tree2)
    n = ckpt.copy_tag(str(tmp_path), "latest", "best")
    assert n == 1
    assert not os.path.exists(os.path.join(tmp_path, "best_state.msgpack")), (
        "stale best_state from run 1 must be removed"
    )
    loaded = ckpt.load_net(str(tmp_path), "best", "G", like=tree2)[0]
    np.testing.assert_array_equal(loaded["w"], tree2["w"])
    # sibling tag untouched
    best_a = ckpt.load_net(str(tmp_path), "best_A", "G", like=tree)[0]
    np.testing.assert_array_equal(best_a["w"], tree["w"] * 2)


def test_trainer_plateau_decays_on_stalled_metric(tmp_path):
    """--lr_policy plateau: a stalled eval metric decays the step LR by
    factor 0.2 after patience epochs (reference networks.py:88-94 +
    per-epoch scheduler.step at base_model.py:146-150 — where the fed
    metric famously stays 0; here the real eval metric drives it)."""
    lrs = []

    def step_fn(state, batch, lr):
        lrs.append(lr)
        return state + 1, {"loss": jnp.asarray(0.0)}

    # improves once, then stalls forever
    evals = {"n": 0}

    def evaluate_fn(state, step):
        evals["n"] += 1
        fid = 100.0 if evals["n"] == 1 else 99.9  # < 1% improvement = stall
        return {"metric/fid": fid}, {}

    cfg = TrainerConfig(
        log_dir=str(tmp_path), nepochs=12, nepochs_decay=0,
        print_freq=1000, save_latest_freq=10**9, save_epoch_freq=1,
        lr=1.0, lr_policy="plateau",
    )
    trainer = Trainer(step_fn, FakeLoader(1), cfg, evaluate_fn, None,
                      Logger(str(tmp_path)))
    trainer.fit(0)
    # PlateauLR(patience=5): epoch 1 sets best, epochs 2-7 stall -> decay
    # applies from epoch 8's step onwards
    assert lrs[0] == 1.0
    assert lrs[-1] == 0.2, lrs
    # schedule_lr without the tracker must refuse, not silently misbehave
    import pytest

    with pytest.raises(ValueError):
        schedule_lr("plateau", 0, 1.0)
