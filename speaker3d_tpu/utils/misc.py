"""Small shared utilities: seeding, logging, meters.

Behavioral contract (reference: speakerlab/utils/utils.py): get_logger
(file + console), AverageMeter/AverageMeters/ProgressMeter stat tracking,
seeding, utt2spk/spk2utt map helpers.
"""

from __future__ import annotations

import contextlib
import logging
import os
import random
import sys
from typing import Dict, Optional

import numpy as np


def set_seed(seed: int = 1234):
    random.seed(seed)
    np.random.seed(seed)


def get_logger(name: str = "speaker3d_tpu", fpath: Optional[str] = None,
               fmt: str = "%(asctime)s [%(levelname)s] %(message)s"):
    """(reference: utils/utils.py:32 get_logger)"""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    formatter = logging.Formatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    if fpath:
        fh = logging.FileHandler(fpath)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """(reference: utils/utils.py:140-162)"""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class AverageMeters:
    """Named collection of AverageMeter."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def update(self, name: str, val, n: int = 1, fmt: str = ":f"):
        if name not in self.meters:
            self.meters[name] = AverageMeter(name, fmt)
        self.meters[name].update(val, n)

    def avg(self, name: str):
        return self.meters[name].avg

    def __str__(self):
        return "  ".join(str(m) for m in self.meters.values())


class ProgressMeter:
    """(reference: utils/utils.py:180-200)"""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches // 1))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> str:
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in (
            self.meters.meters.values() if isinstance(self.meters, AverageMeters)
            else self.meters)]
        line = "\t".join(entries)
        print(line)
        return line


def utt2spk_to_spk2utt(utt2spk: Dict[str, str]) -> Dict[str, list]:
    """(reference: egs/*/utils/utt2spk_to_spk2utt.pl)"""
    out: Dict[str, list] = {}
    for utt, spk in utt2spk.items():
        out.setdefault(spk, []).append(utt)
    return out


@contextlib.contextmanager
def silent_print():
    """Suppress stdout/stderr within the block (the reference wraps noisy
    third-party model loads with this; reference: utils/utils.py:204)."""
    with open(os.devnull, "w") as devnull:
        with contextlib.redirect_stdout(devnull), \
                contextlib.redirect_stderr(devnull):
            yield


def fetch_mean(scalars) -> float:
    """Mean of a list of (device or host) scalars with ONE device->host
    transfer. float() per element costs one tunnel round-trip each
    (O(100 ms) on the axon harness — a 1000-step epoch would stall ~100 s
    at the epoch boundary); stacking on device first makes it one fetch."""
    if not scalars:
        raise ValueError("fetch_mean of empty list")
    import jax.numpy as jnp

    return float(np.asarray(jnp.stack([jnp.asarray(x) for x in scalars]))
                 .mean())
