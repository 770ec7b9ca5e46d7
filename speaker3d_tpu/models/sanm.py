"""SAN-M encoder (Paraformer-style) for ASR-feature-fused speaker training.

Why this exists: the reference's `train_para` variant feeds a frozen
Paraformer ASR encoder's output into the speaker backbone
(reference: speakerlab/bin/train_para.py:73-77, 165-168; the encoder itself
is an external funasr asset the reference downloads). This module is a
native in-framework encoder with the same contract — LFR/CMVN features in,
[B, T, d_model] acoustic representations out — implementing SAN-M
(Gao et al., Interspeech 2020: memory-equipped self-attention): multi-head
attention whose output is augmented with a DFSMN-style depthwise FIR
"memory" over the value projections.

TPU-first notes
---------------
- Attention over T<=a few hundred LFR frames: one fused [B*h, T, T] matmul
  chain, MXU-shaped; the FIR memory is a depthwise conv (VPU) — no
  recurrence, fully static shapes.
- Pre-LN residual blocks jit cleanly and keep bf16-safe activations.
- A converted funasr checkpoint can be loaded by mapping names onto this
  module tree (speaker3d_tpu/compat); with no checkpoint the encoder still
  serves as a trainable/frozen acoustic feature extractor.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_pe(t: int, d: int) -> np.ndarray:
    pos = np.arange(t, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * (-np.log(10000.0) / d))
    pe = np.zeros((t, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: d // 2])
    return pe.astype(np.float32)


class SANMAttention(nn.Module):
    """Multi-head self-attention + depthwise FIR memory over the values."""

    d_model: int
    num_heads: int
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = self.num_heads
        dk = self.d_model // h
        q = nn.Dense(self.d_model, name="q")(x)
        k = nn.Dense(self.d_model, name="k")(x)
        v = nn.Dense(self.d_model, name="v")(x)

        # memory branch: per-channel FIR over time on the value stream
        left = (self.kernel_size - 1) // 2
        right = self.kernel_size - 1 - left
        mem = nn.Conv(self.d_model, (self.kernel_size,),
                      feature_group_count=self.d_model,
                      padding=[(left, right)], use_bias=False,
                      name="fsmn_memory")(v)

        def split(z):
            return z.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / jnp.sqrt(
            jnp.asarray(dk, x.dtype))
        att = nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
        return nn.Dense(self.d_model, name="out")(ctx + mem)


class SANMLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        x = x + SANMAttention(d_model=self.d_model, num_heads=self.num_heads,
                              kernel_size=self.kernel_size,
                              name="self_attn")(h)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ffn_dim, name="ffn.0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="ffn.2")(h)
        return x + h


class SANMEncoder(nn.Module):
    """LFR/CMVN features [B, T, input_dim] -> [B, T, d_model].

    Defaults follow the Paraformer-large encoder scale knobs (d_model 512,
    4 heads, FFN 2048); num_layers is configurable since the frozen-feature
    use case rarely needs the full 50-layer stack.
    """

    input_dim: int = 560          # 80 mel x LFR m=7
    d_model: int = 512
    num_heads: int = 4
    ffn_dim: int = 2048
    num_layers: int = 8
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, _ = x.shape
        h = nn.Dense(self.d_model, name="embed")(x)
        h = h * jnp.asarray(np.sqrt(self.d_model), h.dtype)
        h = h + jnp.asarray(sinusoidal_pe(t, self.d_model), h.dtype)[None]
        for i in range(self.num_layers):
            h = SANMLayer(d_model=self.d_model, num_heads=self.num_heads,
                          ffn_dim=self.ffn_dim, kernel_size=self.kernel_size,
                          name=f"layers.{i}")(h)
        return nn.LayerNorm(name="norm_out")(h)
