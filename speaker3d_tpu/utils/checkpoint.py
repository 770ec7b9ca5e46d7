"""Checkpointer with SpeechBrain-style directory layout.

Behavioral contract (reference: speakerlab/utils/checkpoint.py:27-178):
per-checkpoint directory ``CKPT-EPOCH-{N}-00/`` containing a ``CKPT.yaml``
meta file (unixtime, epoch) plus one ``<name>.ckpt`` file per recoverable;
recovery picks the latest by unixtime or an explicit epoch.

Recoverables here are either (a) pytrees of arrays (model/optimizer state),
saved as .npz of the flattened tree, or (b) objects exposing
``save(path)`` / ``load(path)`` (e.g. EpochCounter).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np
import yaml

CKPT_PREFIX = "CKPT"
META_FNAME = f"{CKPT_PREFIX}.yaml"


def save_pytree(path: str, tree) -> None:
    """Flatten a pytree of arrays into an .npz keyed by '/'-joined paths.
    Written via a file handle so numpy does not append a second extension."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(tree, sep="/")
    with open(path, "wb") as f:
        np.savez(f, **{k: np.asarray(v) for k, v in flat.items()})


def load_pytree(path: str) -> Dict:
    from flax import traverse_util

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return traverse_util.unflatten_dict(flat, sep="/")


class EpochCounter:
    """Resumable epoch iterator. (reference: utils/epoch.py:43-65)"""

    def __init__(self, limit: int):
        self.current = 0
        self.limit = limit

    def __iter__(self):
        return self

    def __next__(self):
        if self.current < self.limit:
            self.current += 1
            return self.current
        raise StopIteration

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(str(self.current))

    def load(self, path: str):
        with open(path) as f:
            self.current = int(f.read().strip())


class Checkpointer:
    """(reference: utils/checkpoint.py:27-178)"""

    def __init__(self, checkpoints_dir: str,
                 recoverables: Optional[Dict[str, Any]] = None):
        self.checkpoints_dir = checkpoints_dir
        os.makedirs(checkpoints_dir, exist_ok=True)
        self.recoverables: Dict[str, Any] = dict(recoverables or {})

    def add_recoverable(self, name: str, obj: Any):
        self.recoverables[name] = obj

    def _ckpt_dir(self, epoch: int) -> str:
        return os.path.join(self.checkpoints_dir,
                            f"{CKPT_PREFIX}-EPOCH-{epoch}-00")

    def list_checkpoints(self):
        out = []
        for name in sorted(os.listdir(self.checkpoints_dir)):
            d = os.path.join(self.checkpoints_dir, name)
            meta_path = os.path.join(d, META_FNAME)
            if os.path.isdir(d) and os.path.isfile(meta_path):
                with open(meta_path) as f:
                    meta = yaml.safe_load(f)
                out.append((d, meta))
        return out

    def save_checkpoint(self, epoch: int, states: Optional[Dict[str, Any]] = None):
        """``states``: name -> pytree for array-state recoverables; objects in
        self.recoverables with .save() are saved as themselves."""
        d = self._ckpt_dir(epoch)
        os.makedirs(d, exist_ok=True)
        states = states or {}
        for name, tree in states.items():
            save_pytree(os.path.join(d, f"{name}.ckpt"), tree)
        for name, obj in self.recoverables.items():
            if hasattr(obj, "save"):
                obj.save(os.path.join(d, f"{name}.ckpt"))
        with open(os.path.join(d, META_FNAME), "w") as f:
            yaml.safe_dump({"unixtime": time.time(), "epoch": epoch}, f)
        return d

    def find_checkpoint(self, epoch: Optional[int] = None):
        ckpts = self.list_checkpoints()
        if not ckpts:
            return None
        if epoch is not None:
            for d, meta in ckpts:
                if meta.get("epoch") == epoch:
                    return d, meta
            return None
        return max(ckpts, key=lambda it: it[1].get("unixtime", 0))

    def recover_if_possible(self, epoch: Optional[int] = None):
        """Returns {name: pytree} for saved array states (objects with .load()
        are restored in place), or None if no checkpoint exists.
        (reference: utils/checkpoint.py:43-111)"""
        found = self.find_checkpoint(epoch)
        if found is None:
            return None
        d, meta = found
        states = {}
        for fname in os.listdir(d):
            if not fname.endswith(".ckpt"):
                continue
            name = fname[:-len(".ckpt")]
            fpath = os.path.join(d, fname)
            obj = self.recoverables.get(name)
            if obj is not None and hasattr(obj, "load"):
                obj.load(fpath)
            else:
                with open(fpath, "rb") as f:
                    is_zip = f.read(2) == b"PK"
                if is_zip:  # npz pytree; anything else belongs to an
                    states[name] = load_pytree(fpath)  # unregistered object

        states["__meta__"] = meta
        return states


class EpochLogger:
    """Append stats lines to train_epoch.log. (reference: utils/epoch.py:7-40)"""

    def __init__(self, save_file: str):
        self.save_file = save_file
        os.makedirs(os.path.dirname(save_file) or ".", exist_ok=True)

    def log_stats(self, stats_meta: Dict[str, Any],
                  stats: Optional[Dict[str, Any]] = None):
        parts = [f"{k}: {v}" for k, v in stats_meta.items()]
        if stats:
            parts += [f"{k}: {v}" for k, v in stats.items()]
        line = " - ".join(parts)
        with open(self.save_file, "a") as f:
            f.write(line + "\n")
        return line
