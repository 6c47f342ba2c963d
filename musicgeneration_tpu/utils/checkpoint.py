"""Atomic, preemption-safe checkpointing with auto-resume.

Replaces the reference's three incompatible `torch.save` formats
(SURVEY.md §5: MusicTransformer/train.py:203 `{'net','optimizer','epoch'}`,
PerformanceRNN/train.py:195-201 session dicts, Event_MelodyRNN/train.py:188
bare state_dict) with ONE format holding the full training session:
`{params, opt_state, step, rng, config, extra}` serialized via flax
msgpack.  Keeps the PerformanceRNN idea of carrying the model config
inside the checkpoint so a restore can rebuild the model without the
original script.

Design points (TPU/production):
- Atomic: write to `<name>.tmp` then `os.replace` — a preemption mid-save
  never corrupts the latest good checkpoint.
- `step-<N>.ckpt` naming + `latest_checkpoint()` scan → startup
  auto-restore covers preemption (the reference's only recovery story is
  `except KeyboardInterrupt: save` — train.py:324-327).
- `keep` bound garbage-collects old checkpoints.
- Host-side: arrays are pulled off device with `jax.device_get` before
  serialization; restore returns numpy leaves which jit will re-shard on
  first use (or pass them through `jax.device_put` with a sharding).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^step-(\d+)\.ckpt$")


def _to_host(tree: Any) -> Any:
    # to_state_dict flattens custom nodes (TrainState, optax states) into
    # plain nested dicts that msgpack can serialize; from_state_dict on
    # restore rebuilds them into a caller-provided target structure.
    return jax.tree.map(np.asarray,
                        jax.device_get(serialization.to_state_dict(tree)))


def save_checkpoint(directory: str, step: int, state: Any,
                    config: Optional[Dict[str, Any]] = None,
                    keep: int = 3) -> str:
    """Serialize `state` (any pytree) atomically to directory/step-N.ckpt."""
    os.makedirs(directory, exist_ok=True)
    payload = {
        "step": int(step),
        "state": _to_host(state),
        "config": config or {},
    }
    blob = serialization.msgpack_serialize(payload)
    path = os.path.join(directory, f"step-{int(step)}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _gc(directory, keep)
    return path


def list_checkpoints(directory: str) -> List[Tuple[int, str]]:
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    return sorted(out)


def latest_checkpoint(directory: str) -> Optional[str]:
    ckpts = list_checkpoints(directory)
    return ckpts[-1][1] if ckpts else None


def restore_checkpoint(path_or_dir: str,
                       target: Any = None) -> Dict[str, Any]:
    """Load a checkpoint. If given a directory, loads the latest.

    With `target` (a pytree of the same structure as the saved state,
    e.g. a freshly-initialized TrainState), the state is deserialized
    INTO that structure so custom pytree nodes are reconstructed;
    without it you get plain nested dicts.
    """
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        latest = latest_checkpoint(path_or_dir)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path_or_dir}")
        path = latest
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if target is not None:
        restored = serialization.from_state_dict(target, payload["state"])

        # mesh-training resume: from_state_dict yields host numpy leaves;
        # place each back under the TARGET leaf's sharding so a resumed
        # run keeps its FSDP/TP layout instead of replicating everything
        # on first use
        def _place(r, t):
            if isinstance(t, jax.Array) and not isinstance(r, jax.Array):
                return jax.device_put(r, t.sharding)
            return r

        payload["state"] = jax.tree.map(_place, restored, target)
    return payload


def _gc(directory: str, keep: int) -> None:
    ckpts = list_checkpoints(directory)
    for _, path in ckpts[:-keep] if keep > 0 else []:
        try:
            os.remove(path)
        except OSError:
            pass


class Checkpointer:
    """Every-N-steps checkpoint policy + auto-restore, one object.

    >>> ckpt = Checkpointer(dir, every=1000)
    >>> state, start_step = ckpt.restore_or(state)   # auto-resume
    >>> for step in range(start_step, total):
    ...     state, metrics = train_step(state, batch)
    ...     ckpt.maybe_save(step, state)
    """

    def __init__(self, directory: str, every: int = 1000, keep: int = 3,
                 config: Optional[Dict[str, Any]] = None):
        self.directory = directory
        self.every = every
        self.keep = keep
        self.config = config or {}

    def restore_or(self, init_state: Any) -> Tuple[Any, int]:
        latest = latest_checkpoint(self.directory)
        if latest is None:
            return init_state, 0
        payload = restore_checkpoint(latest, target=init_state)
        return payload["state"], int(payload["step"]) + 1

    def maybe_save(self, step: int, state: Any, force: bool = False) -> bool:
        if force or (self.every and (step + 1) % self.every == 0):
            save_checkpoint(self.directory, step, state,
                            config=self.config, keep=self.keep)
            return True
        return False

    def write_meta(self, **meta: Any) -> None:
        """Side-channel JSON (dataset cursor, tokenizer spec hash, ...)."""
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, "meta.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)

    def read_meta(self) -> Dict[str, Any]:
        path = os.path.join(self.directory, "meta.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)
