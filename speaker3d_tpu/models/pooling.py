"""Temporal pooling zoo.

Behavioral contract (reference: speakerlab/models/eres2net/pooling_layers.py):
TAP (mean), TSDP (std), TSTP (mean‖std), ASTP (attentive stats). The reference
operates on torch layouts [B, C, T] / [B, C, F, T] and flattens (C, F); here
tensors are TPU-native channels-last — [B, T, C] for 1D trunks and
[B, F, T, C] for 2D trunks — and the flatten order is made to match the
reference so that converted linear weights line up exactly.

Note: the reference uses torch.var's default *unbiased* estimator (ddof=1).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def _merge_cf(x):
    """[B, F, C] -> [B, C*F] in the reference's (C, F) flatten order."""
    return jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], -1)


def _moments(x, axis):
    mean = jnp.mean(x, axis=axis)
    var = jnp.var(x, axis=axis, ddof=1)
    return mean, var


def tap(x):
    """Temporal average pooling. x: [B, T, C] or [B, F, T, C]."""
    if x.ndim == 4:
        return _merge_cf(jnp.mean(x, axis=2))
    return jnp.mean(x, axis=1)


def tsdp(x):
    """Temporal standard-deviation pooling."""
    if x.ndim == 4:
        _, var = _moments(x, 2)
        return _merge_cf(jnp.sqrt(var + 1e-8))
    _, var = _moments(x, 1)
    return jnp.sqrt(var + 1e-8)


def tstp(x):
    """Temporal statistics pooling: mean ‖ std."""
    if x.ndim == 4:
        mean, var = _moments(x, 2)
        return jnp.concatenate(
            [_merge_cf(mean), _merge_cf(jnp.sqrt(var + 1e-8))], axis=1)
    mean, var = _moments(x, 1)
    return jnp.concatenate([mean, jnp.sqrt(var + 1e-8)], axis=1)


POOLING_FUNCS = {"TAP": tap, "TSDP": tsdp, "TSTP": tstp}


def pooling_output_mult(name: str) -> int:
    """Number of statistics concatenated by the pooling function."""
    return 1 if name in ("TAP", "TSDP") else 2


class ASTP(nn.Module):
    """Attentive statistics pooling (ECAPA-style).

    x: [B, T, C] (or [B, F, T, C], reshaped to [B, T, C*F] in reference
    channel-major order). Tanh bottleneck -> softmax attention over time;
    optional global mean/std context concat.
    (reference: speakerlab/models/eres2net/pooling_layers.py:58-104)
    """

    bottleneck_dim: int = 128
    global_context_att: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:  # [B, F, T, C] -> [B, T, C*F] matching torch (C,F) order
            b, f, t, c = x.shape
            x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)
        if self.global_context_att:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True, ddof=1) + 1e-10)
            x_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1)
        else:
            x_in = x
        alpha = jnp.tanh(nn.Dense(self.bottleneck_dim, name="linear1")(x_in))
        alpha = nn.softmax(nn.Dense(x.shape[-1], name="linear2")(alpha), axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * jnp.square(x), axis=1) - jnp.square(mean)
        std = jnp.sqrt(jnp.clip(var, min=1e-10))
        return jnp.concatenate([mean, std], axis=1)
