"""Shared model helpers: SyncBN context.

SSL training converts BatchNorm to SyncBatchNorm (reference:
bin/train_rdino.py:60-61); in flax this is BatchNorm(axis_name=...) computing
batch statistics with a psum across the mesh axis. The context variable lets
models opt in at apply-time (inside shard_map tracing) without threading a
flag through every submodule.
"""

from __future__ import annotations

import contextlib
import contextvars

import flax.linen as nn

_BN_AXIS: contextvars.ContextVar = contextvars.ContextVar("bn_axis", default=None)


@contextlib.contextmanager
def sync_batchnorm(axis_name: str):
    """Within this context, batch_norm() computes cross-device statistics."""
    token = _BN_AXIS.set(axis_name)
    try:
        yield
    finally:
        _BN_AXIS.reset(token)


def batch_norm(train: bool, name: str, **kwargs) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train,
                        axis_name=_BN_AXIS.get(), name=name, **kwargs)
