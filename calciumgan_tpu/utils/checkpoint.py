"""Checkpoint / resume.

The reference pickles Keras weight lists to ``checkpoints/epoch-{E:03d}.pkl``
every 10th epoch and auto-resumes from the latest on start
(``/root/reference/gan/utils/utils.py:116-152``, ``main.py:141-156,204``).

Here the FULL train state is one pytree (params G/D, optax states, step
counters — :class:`calciumgan_tpu.algorithms.state.GANState`), serialised
with Flax's msgpack codec. Restore is resharding-safe: the stored host
arrays are ``device_put`` back with whatever shardings the caller's template
state carries, so a run checkpointed on one mesh can resume on another.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_EPOCH_RE = re.compile(r"epoch-(\d+)\.msgpack$")


def checkpoint_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"epoch-{epoch:03d}.msgpack")


def save(ckpt_dir: str, epoch: int, state: Any, config=None,
         verbose: int = 1) -> str:
    """Serialise the train-state pytree (gathered to host) for ``epoch``.

    Multi-host: process 0 is the single writer (every process owns a full
    replica of the data-parallel state; concurrent writers would race on the
    shared tmp file). Model-parallel state is device_get-able too: the
    sharding rules in ``parallel/mesh.py`` keep the model axis within one
    process's devices for every supported config."""
    path = checkpoint_path(ckpt_dir, epoch)
    if jax.process_index() != 0:
        return path
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    os.replace(tmp, path)  # atomic: a preempted save never corrupts resume
    meta = {"epoch": epoch}
    if config is not None:
        meta["global_step"] = int(config.global_step)
    # same tmp+replace discipline as the msgpack: a crash mid-write must
    # not leave truncated JSON that blocks every future auto-resume
    latest = os.path.join(ckpt_dir, "latest.json")
    with open(latest + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(latest + ".tmp", latest)
    if verbose:
        print(f"Saved checkpoint to {path}")
    return path


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    epochs = []
    for path in glob.glob(os.path.join(ckpt_dir, "epoch-*.msgpack")):
        m = _EPOCH_RE.search(path)
        if m:
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def _reconcile_ema(template: Any, state_dict: dict, verbose: int) -> None:
    """Make ``GANState.ema_params`` optional across checkpoint vintages.

    Checkpoints written before the ``--ema`` feature have no ``ema_params``
    key (and ema-off runs store it as None); a strict structural restore
    would refuse both directions. Resuming with ema ON from a checkpoint
    without an average seeds it from the stored generator params; resuming
    with ema OFF drops any stored average (the raw params are the state)."""
    if not hasattr(template, "ema_params") or "generator" not in state_dict:
        return
    stored = state_dict.get("ema_params")
    if template.ema_params is None:
        state_dict["ema_params"] = None
    elif stored is None:
        state_dict["ema_params"] = state_dict["generator"]["params"]
        if verbose:
            print("Checkpoint has no generator EMA: seeded --ema from the "
                  "restored params")


def restore(ckpt_dir: str, template: Any, epoch: Optional[int] = None,
            verbose: int = 1) -> Tuple[Any, Optional[int]]:
    """Restore the latest (or a specific) checkpoint into ``template``'s
    structure and shardings. Returns (state, epoch) — (template, None) when
    no checkpoint exists."""
    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
    if epoch is None:
        return template, None
    path = checkpoint_path(ckpt_dir, epoch)
    # from_bytes only needs a HOST pytree with matching structure/dtypes —
    # build it from the template's avals instead of device_get-ing the whole
    # initial state (a wasted ~100 MB device->host transfer per resume, and
    # very slow through the hosted tunnel)
    host_template = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, leaf.dtype)
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype") else leaf,
        template)
    with open(path, "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    _reconcile_ema(template, state_dict, verbose)
    host_state = serialization.from_state_dict(host_template, state_dict)

    def put(tmpl, host):
        sharding = getattr(tmpl, "sharding", None)
        host = np.asarray(host)
        if sharding is not None:
            return jax.device_put(host, sharding)
        return host

    state = jax.tree_util.tree_map(put, template, host_state)
    if verbose:
        print(f"Restored checkpoint at {path}")
    return state, epoch


def resume(config, template: Any) -> Any:
    """Reference auto-resume semantics: scan ``ckpt_dir``, restore the newest
    checkpoint and set ``config.start_epoch = epoch + 1``
    (``utils.py:135-152``)."""
    if config.ckpt_dir is None:
        config.ckpt_dir = os.path.join(config.output_dir, "checkpoints")
    config.start_epoch = 0
    if not os.path.isdir(config.ckpt_dir):
        return template
    state, epoch = restore(config.ckpt_dir, template,
                           verbose=config.verbose)
    if epoch is not None:
        config.start_epoch = epoch + 1
        meta_path = os.path.join(config.ckpt_dir, "latest.json")
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    config.global_step = json.load(f).get(
                        "global_step", config.global_step)
            except (json.JSONDecodeError, OSError):
                pass  # pre-fix files could be truncated; resume still works
    return state
