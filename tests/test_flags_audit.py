"""Every accepted CLI flag is either consumed or documented-inert.

The reference grew 'parsed but dead' flags; round 2 fixed that class twice
(--restore_state_path 9965967, --restore_D_path d2d2676) and round 2's
review found three more (--restore_pretrained_G_path for SPADE,
--n_devices/--n_spatial for SPADE, --remat outside CycleGAN).  This audit
ends the category: a flag added to any parser must show up consumed as
``opt.<name>`` / ``getattr(opt, "<name>")`` somewhere in cat_tpu, or be
listed in DOCUMENTED_INERT with a reason (mirrors the comment block in
cat_tpu/cli.py).

Pure text test: no jax, no device.
"""

import argparse
import os
import re

import pytest

import cat_tpu.cli as cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# flags accepted so reference recipes run verbatim, deliberately inert —
# keep in sync with the comment block in cat_tpu/cli.py
DOCUMENTED_INERT = {
    "netG": "only the inception families exist; arch from config sidecars",
    "teacher_netG": "same",
    "student_netG": "same",
    "pretrained_netG": "same",
    "pretrained_ngf": "recovered from checkpoint shapes",
    "teacher_ngf": "teacher arch recovered from its checkpoint's config sidecar",
    "prune_continue": "subsumed by --restore_student_G_path",
    "prune_logging_verbose": "reference debug extra",
    "restore_O_path": "subsumed by --restore_state_path (warned at runtime)",
}


def _all_flags():
    flags = set()
    for build in (cli.train_arguments, cli.distill_arguments, cli.test_arguments):
        p = argparse.ArgumentParser()
        try:
            build(p)
        except argparse.ArgumentError:
            pass
        for a in p._actions:
            if a.dest not in ("help",):
                flags.add(a.dest)
    return flags


def _consumed_names():
    """Names read as opt attributes anywhere in the package (parser
    definitions in cli.py don't count as consumption)."""
    text = []
    pkg = os.path.join(REPO, "cat_tpu")
    for root, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            with open(os.path.join(root, f)) as fh:
                for line in fh:
                    if "add_argument" in line or "set_defaults" in line:
                        continue
                    text.append(line)
    blob = "\n".join(text)
    names = set(re.findall(r"\bopt\.([A-Za-z_][A-Za-z0-9_]*)", blob))
    names |= set(re.findall(r"getattr\(opt,\s*[\"']([A-Za-z0-9_]+)[\"']", blob))
    return names


def test_every_flag_consumed_or_documented_inert():
    flags = _all_flags()
    consumed = _consumed_names()
    dead = sorted(flags - consumed - set(DOCUMENTED_INERT))
    assert not dead, (
        f"flags accepted but never consumed and not documented-inert: {dead} "
        "— wire them up or add them to DOCUMENTED_INERT (and cli.py's "
        "comment block) with a reason"
    )


def test_ema_decay_adjust():
    """--moving_average_decay_adjust scales the per-step decay as
    d**(B/B_base) so the averaging horizon is constant in epochs."""
    from types import SimpleNamespace as NS

    from cat_tpu.entry import _ema_decay

    assert _ema_decay(NS(moving_average_decay=0.0,
                         moving_average_decay_adjust=True,
                         moving_average_decay_base_batch=32,
                         batch_size=64)) == 0.0
    assert _ema_decay(NS(moving_average_decay=0.99,
                         moving_average_decay_adjust=False,
                         moving_average_decay_base_batch=32,
                         batch_size=64)) == pytest.approx(0.99)
    assert _ema_decay(NS(moving_average_decay=0.99,
                         moving_average_decay_adjust=True,
                         moving_average_decay_base_batch=32,
                         batch_size=64)) == pytest.approx(0.99 ** 2)


def test_inert_list_matches_cli_comment():
    """The audit's inert list and cli.py's human-readable comment must not
    drift apart."""
    with open(os.path.join(REPO, "cat_tpu", "cli.py")) as f:
        src = f.read()
    start = src.index("Deliberately-accepted-but-inert")
    comment = src[start : src.index("def ", start)]
    for name in DOCUMENTED_INERT:
        if name in ("restore_O_path",):
            continue  # grouped under their siblings in the comment
        assert f"--{name}" in comment or name in comment, (
            f"{name} missing from cli.py's documented-inert comment"
        )
