"""Shared model helpers: SyncBN and BN compute-dtype contexts.

SSL training converts BatchNorm to SyncBatchNorm (reference:
bin/train_rdino.py:60-61); in flax this is BatchNorm(axis_name=...) computing
batch statistics with a psum across the mesh axis. Mixed-precision training
sets the BN computation dtype to bfloat16 (normalization math + output in
bf16; batch statistics still ACCUMULATE in float32 via flax's
force_float32_reductions, and running stats stay float32 in the state).
Context variables let trainers opt in at apply-time (inside shard_map
tracing) without threading flags through every submodule.
"""

from __future__ import annotations

import contextlib
import contextvars

import flax.linen as nn

_BN_AXIS: contextvars.ContextVar = contextvars.ContextVar("bn_axis", default=None)
_BN_DTYPE: contextvars.ContextVar = contextvars.ContextVar("bn_dtype", default=None)


@contextlib.contextmanager
def sync_batchnorm(axis_name: str):
    """Within this context, batch_norm() computes cross-device statistics."""
    token = _BN_AXIS.set(axis_name)
    try:
        yield
    finally:
        _BN_AXIS.reset(token)


@contextlib.contextmanager
def bn_compute_dtype(dtype):
    """Within this context, batch_norm() normalizes/outputs in ``dtype``
    (batch-stat reductions still accumulate float32)."""
    token = _BN_DTYPE.set(dtype)
    try:
        yield
    finally:
        _BN_DTYPE.reset(token)


def batch_norm(train: bool, name: str = None, **kwargs) -> nn.BatchNorm:
    kwargs.setdefault("axis_name", _BN_AXIS.get())
    kwargs.setdefault("dtype", _BN_DTYPE.get())
    return nn.BatchNorm(use_running_average=not train, name=name, **kwargs)
