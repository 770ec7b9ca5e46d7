"""ECAPA-TDNN speaker-embedding backbone, TPU-native (Flax, channels-last).

Behavioral contract (reference: speakerlab/models/ecapa_tdnn/ECAPA_TDNN.py —
a SpeechBrain port): TDNN stem, three SE-Res2Net blocks with dilated convs,
multi-layer feature aggregation (concat of block outputs), attentive
statistics pooling with global context, BN, 1x1 projection to the embedding.

Notes
-----
- SpeechBrain 'same' padding uses *reflect* mode; reproduced via jnp.pad
  before a VALID conv.
- TDNNBlock order is conv -> activation -> BatchNorm (norm after act).
- Res2Net chain here differs from ERes2Net: the first chunk passes through
  unconvolved; subsequent chunks get conv(x_i + y_{i-1}).
- Static-shape path only (lengths=None in the reference equals an all-ones
  mask, which is what fixed-duration chunked inference/training uses).
- Module names mirror the reference's nested wrappers (conv.conv, norm.norm)
  so the mechanical torch->flax converter applies.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speaker3d_tpu.models.common import batch_norm


class SBConv1d(nn.Module):
    """SpeechBrain-style Conv1d with 'same' reflect padding. x: [B, T, C].
    (reference: models/ecapa_tdnn/ECAPA_TDNN.py:42-106)"""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.kernel_size > 1:
            total = self.dilation * (self.kernel_size - 1)
            pad = total // 2
            x = jnp.pad(x, ((0, 0), (pad, total - pad), (0, 0)), mode="reflect")
        return nn.Conv(self.out_channels, (self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="VALID",
                       feature_group_count=self.groups, use_bias=self.use_bias,
                       name="conv")(x)


class TDNNBlock(nn.Module):
    """conv -> relu -> batchnorm. (reference: ECAPA_TDNN.py:127-151)"""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SBConv1d(self.out_channels, self.kernel_size, self.dilation,
                     self.groups, name="conv")(x)
        x = nn.relu(x)
        return batch_norm(train, "norm.norm")(x)


class Res2NetBlock(nn.Module):
    """(reference: ECAPA_TDNN.py:154-191)"""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channel = x.shape[-1] // self.scale
        hidden = self.out_channels // self.scale
        chunks = [x[..., i * in_channel:(i + 1) * in_channel]
                  for i in range(self.scale)]
        ys = []
        y_i = None
        for i, x_i in enumerate(chunks):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = TDNNBlock(hidden, self.kernel_size, self.dilation,
                                name=f"blocks.{i-1}")(x_i, train)
            else:
                y_i = TDNNBlock(hidden, self.kernel_size, self.dilation,
                                name=f"blocks.{i-1}")(x_i + y_i, train)
            ys.append(y_i)
        return jnp.concatenate(ys, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-excitation over global mean. (reference: ECAPA_TDNN.py:194-222)"""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(SBConv1d(self.se_channels, 1, name="conv1")(s))
        s = nn.sigmoid(SBConv1d(self.out_channels, 1, name="conv2")(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    """(reference: ECAPA_TDNN.py:225-287). x: [B, T, C] -> [B, 2C]."""

    attention_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-12
        C = x.shape[-1]
        L = x.shape[1]
        if self.global_context:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.clip(
                jnp.mean(jnp.square(x - mean), axis=1, keepdims=True), min=eps))
            attn = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1)
        else:
            attn = x
        attn = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(attn, train)
        attn = SBConv1d(C, 1, name="conv")(jnp.tanh(attn))
        attn = nn.softmax(attn, axis=1)
        mean = jnp.sum(attn * x, axis=1)
        std = jnp.sqrt(jnp.clip(
            jnp.sum(attn * jnp.square(x - mean[:, None, :]), axis=1), min=eps))
        return jnp.concatenate([mean, std], axis=-1)


class SERes2NetBlock(nn.Module):
    """TDNN1x1 -> Res2Net -> TDNN1x1 -> SE, residual.
    (reference: ECAPA_TDNN.py:290-347)"""

    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.out_channels:
            residual = SBConv1d(self.out_channels, 1, name="shortcut")(x)
        else:
            residual = x
        x = TDNNBlock(self.out_channels, 1, 1, self.groups, name="tdnn1")(x, train)
        x = Res2NetBlock(self.out_channels, self.res2net_scale, self.kernel_size,
                         self.dilation, name="res2net_block")(x, train)
        x = TDNNBlock(self.out_channels, 1, 1, self.groups, name="tdnn2")(x, train)
        x = SEBlock(self.se_channels, self.out_channels, name="se_block")(x, train)
        return x + residual


class ECAPA_TDNN(nn.Module):
    """(reference: ECAPA_TDNN.py:350-463)

    Input: log-mel features [B, T, input_size]. Output: [B, lin_neurons].
    Released checkpoints use channels=[1024,1024,1024,1024,3072]
    (reference: bin/infer_sv.py:123-130); the recipe default is 512s.
    """

    input_size: int = 80
    lin_neurons: int = 192
    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    # SSL variant: input is a *linear* mel-spectrogram; apply log + per-
    # utterance instance norm over time, detached
    # (reference: models/rdino/ECAPA_TDNN.py:438-441)
    ssl_input_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ssl_input_norm:
            x = jnp.log(x + 1e-6)
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)  # biased (InstanceNorm1d)
            x = jax.lax.stop_gradient((x - mean) / jnp.sqrt(var + 1e-5))
        xl = []
        x = TDNNBlock(self.channels[0], self.kernel_sizes[0], self.dilations[0],
                      name="blocks.0")(x, train)
        xl.append(x)
        for i in range(1, len(self.channels) - 1):
            x = SERes2NetBlock(
                self.channels[i], self.res2net_scale, self.se_channels,
                self.kernel_sizes[i], self.dilations[i],
                name=f"blocks.{i}")(x, train)
            xl.append(x)
        x = jnp.concatenate(xl[1:], axis=-1)
        x = TDNNBlock(self.channels[-1], self.kernel_sizes[-1],
                      self.dilations[-1], name="mfa")(x, train)
        x = AttentiveStatisticsPooling(
            self.attention_channels, self.global_context, name="asp")(x, train)
        x = batch_norm(train, "asp_bn.norm")(x)
        x = nn.Dense(self.lin_neurons, name="fc.conv")(x)
        return x
