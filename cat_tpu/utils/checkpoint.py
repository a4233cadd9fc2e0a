"""Checkpointing: parameters + explicit architecture config.

The reference stores per-net .pth state_dicts and recovers pruned student
*architectures from tensor shapes* (utils/common.py:49-180).  Here every
checkpoint is a msgpack blob of the pytree plus a JSON sidecar holding the
architecture config — the config is the source of truth, no shape
archaeology.  Naming follows the reference convention
({epoch|latest|best|iterN}_net_{G,D,...} — models/base_model.py:200-213).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from cat_tpu.core.config import config_from_json, config_to_json


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # jax.device_get starts every leaf's device->host copy asynchronously
    # before blocking; a per-leaf np.asarray would instead issue thousands
    # of SERIAL round trips, which over a tunnelled device turned one SPADE
    # train-state save into ~20 minutes.
    host_tree = jax.device_get(tree)
    host_tree = jax.tree.map(np.asarray, host_tree)
    # atomic write: checkpoint files are replaced, never truncated in place,
    # so copy_tag may hardlink tags to the same immutable inode and a crash
    # mid-write never destroys the previous checkpoint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    os.replace(tmp, path)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if like is not None:
        return serialization.from_bytes(like, data)
    return serialization.msgpack_restore(data)


def save_net(save_dir: str, tag: str, net_name: str, variables: Any,
             config: Any = None) -> str:
    """Save one network: <save_dir>/<tag>_net_<name>.msgpack (+ .json config)."""
    path = os.path.join(save_dir, f"{tag}_net_{net_name}.msgpack")
    save_pytree(path, variables)
    if config is not None:
        cfg_path = path.replace(".msgpack", ".json")
        with open(cfg_path + ".tmp", "w") as f:
            f.write(config_to_json(config))
        os.replace(cfg_path + ".tmp", cfg_path)
    return path


def load_net(save_dir: str, tag: str, net_name: str,
             like: Optional[Any] = None) -> Tuple[Any, Optional[Any]]:
    """(variables, config-or-None)."""
    path = os.path.join(save_dir, f"{tag}_net_{net_name}.msgpack")
    variables = load_pytree(path, like)
    cfg_path = path.replace(".msgpack", ".json")
    cfg = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = config_from_json(f.read())
    return variables, cfg


def save_train_state(save_dir: str, tag: str, state: Any) -> str:
    """Full train state (params + optimizer moments + stats + rng + pools)."""
    path = os.path.join(save_dir, f"{tag}_state.msgpack")
    save_pytree(path, state)
    return path


def load_train_state(save_dir: str, tag: str, like: Any) -> Any:
    return load_pytree(os.path.join(save_dir, f"{tag}_state.msgpack"), like)


def copy_tag(save_dir: str, src_tag: str, dst_tag: str) -> int:
    """Duplicate every ``<src_tag>_*`` checkpoint file as ``<dst_tag>_*``.

    The trainer saves the same state under several tags per eval (latest,
    iterN, best — reference trainer.py:141-155); serialising the pytree once
    and copying files host-side avoids repeated device->host fetches of
    multi-GB states.  Returns the number of files copied.
    """
    import glob as _glob
    import shutil

    def tag_files(tag):
        # only the suffixes checkpointing writes — a bare `<tag>_*` glob
        # would make tag 'best' match (and clobber) 'best_A_net_G.msgpack'
        out = []
        for pat in (f"{tag}_net_*", f"{tag}_state.msgpack", f"{tag}_meta.json"):
            out.extend(_glob.glob(os.path.join(save_dir, pat)))
        return [p for p in out if not p.endswith(".tmp")]

    srcs = tag_files(src_tag)
    suffixes = {os.path.basename(p)[len(src_tag) + 1:] for p in srcs}
    # stale dst files with no src counterpart are leftovers from an earlier
    # run with different options (e.g. --save_full_state 1 then 0): copying
    # around them would pair this run's best_net_G with last run's
    # best_state — remove them instead
    for dst in tag_files(dst_tag):
        if os.path.basename(dst)[len(dst_tag) + 1:] not in suffixes:
            os.remove(dst)
    n = 0
    for src in srcs:
        base = os.path.basename(src)
        dst = os.path.join(save_dir, f"{dst_tag}_{base[len(src_tag) + 1:]}")
        # hardlink when possible: checkpoint inodes are immutable (atomic
        # replace in save_pytree), so tags may share them — a multi-GB tag
        # duplication costs nothing even on a slow disk
        if os.path.exists(dst):
            os.remove(dst)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
        n += 1
    return n


def remove_stale(save_dir: str, tag: str, suffix: str) -> None:
    """Remove ``<tag>_<suffix>`` left by an earlier run whose options wrote
    it (e.g. a --save_full_state 1 run's latest_state.msgpack) when the
    current run deliberately does not — otherwise tag copies would pair
    this run's nets with last run's state."""
    path = os.path.join(save_dir, f"{tag}_{suffix}")
    if os.path.exists(path):
        os.remove(path)


def save_meta(save_dir: str, tag: str, meta: Dict) -> None:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{tag}_meta.json")
    with open(path + ".tmp", "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(path + ".tmp", path)


def load_meta(save_dir: str, tag: str) -> Dict:
    with open(os.path.join(save_dir, f"{tag}_meta.json")) as f:
        return json.load(f)
