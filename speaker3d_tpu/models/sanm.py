"""SAN-M encoder (Paraformer) for ASR-feature-fused speaker training.

Why this exists: the reference's `train_para` variant feeds a frozen
Paraformer ASR encoder's output into the speaker backbone
(reference: speakerlab/bin/train_para.py:73-77, 165-168; the encoder itself
is an external funasr asset the reference downloads). This module is the
native in-framework encoder with the same contract — LFR/CMVN features in,
[B, T, d_model] acoustic representations out — implementing SAN-M
(Gao et al., Interspeech 2020: memory-equipped self-attention).

Semantics and parameter naming follow funasr's public `SANMEncoder`
(funasr/models/sanm/{encoder,attention}.py) so converted Paraformer
checkpoints load through the mechanical converter
(speaker3d_tpu/compat/torch_convert.py):

  - input scaled by sqrt(d_model), then sinusoidal PE over the INPUT dim
    (positions starting at 1, half-sin / half-cos concatenation — not
    interleaved);
  - first block `encoders0.0` maps input_dim -> d_model with NO residual
    around the attention when the dims differ; blocks `encoders.{i}` are
    d_model -> d_model with residuals;
  - attention: fused `linear_q_k_v`, scores scaled by d_k^-0.5, output =
    `linear_out`(context) + fsmn_memory, where fsmn_memory = v +
    depthwise-FIR(`fsmn_block`) over the un-split value stream (symmetric
    (k-1)//2 padding, sanm_shift=0);
  - pre-LN (`norm1`/`norm2`), ReLU FFN (`feed_forward.w_1`/`w_2`), final
    `after_norm` LayerNorm.

Weight-for-weight parity vs a torch mirror of funasr's implementation is
pinned in tests/test_train_para.py.

TPU-first notes
---------------
- Attention over T<=a few hundred LFR frames: one fused [B*h, T, T] matmul
  chain, MXU-shaped; the FIR memory is a depthwise conv (VPU) — no
  recurrence, fully static shapes.
- Pre-LN residual blocks jit cleanly and keep bf16-safe activations.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


def funasr_sinusoidal_pe(t: int, depth: int) -> np.ndarray:
    """funasr SinusoidalPositionEncoder.encode: positions 1..t, half-sin /
    half-cos concatenation over ``depth`` (must be even)."""
    if depth % 2:
        raise ValueError(f"funasr positional encoding needs even depth, "
                         f"got {depth}")
    positions = np.arange(1, t + 1, dtype=np.float64)[:, None]
    log_timescale_increment = np.log(10000.0) / (depth / 2 - 1)
    inv_timescales = np.exp(np.arange(depth // 2, dtype=np.float64)
                            * -log_timescale_increment)[None, :]
    scaled_time = positions * inv_timescales
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


class SANMAttention(nn.Module):
    """funasr MultiHeadedAttentionSANM: self-attention + value-stream FIR
    memory added after the output projection."""

    d_model: int
    num_heads: int
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        h = self.num_heads
        d = self.d_model
        dk = d // h
        qkv = nn.Dense(3 * d, name="linear_q_k_v")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # memory branch on the un-split value stream: v + depthwise FIR
        left = (self.kernel_size - 1) // 2
        right = self.kernel_size - 1 - left
        mem = v + nn.Conv(d, (self.kernel_size,), feature_group_count=d,
                          padding=[(left, right)], use_bias=False,
                          name="fsmn_block")(v)

        def split(z):
            return z.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

        q_h = split(q) * jnp.asarray(dk, x.dtype) ** -0.5
        att = jnp.einsum("bhqd,bhkd->bhqk", q_h, split(k))
        att = nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, name="linear_out")(ctx) + mem


class SANMLayer(nn.Module):
    """funasr EncoderLayerSANM (normalize_before=True): pre-LN attention
    with residual only when in/out dims match, pre-LN ReLU FFN."""

    in_size: int
    d_model: int
    num_heads: int
    ffn_dim: int
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        att = SANMAttention(d_model=self.d_model, num_heads=self.num_heads,
                            kernel_size=self.kernel_size,
                            name="self_attn")(h)
        x = x + att if self.in_size == self.d_model else att
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ffn_dim, name="feed_forward.w_1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="feed_forward.w_2")(h)
        return x + h


class SANMEncoder(nn.Module):
    """LFR/CMVN features [B, T, input_dim] -> [B, T, d_model].

    Defaults follow the Paraformer-large encoder scale knobs (d_model 512,
    4 heads, FFN 2048, kernel 11); num_layers counts ALL blocks (the
    input-mapping `encoders0.0` plus num_layers-1 `encoders.{i}`) and is
    configurable since the frozen-feature use case rarely needs the full
    50-block stack. Converted funasr checkpoints load via
    speaker3d_tpu/compat (name-mirrored parameter tree).
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
        h = x * jnp.asarray(np.sqrt(self.d_model), x.dtype)
        h = h + jnp.asarray(funasr_sinusoidal_pe(t, self.input_dim),
                            h.dtype)[None]
        h = SANMLayer(in_size=self.input_dim, d_model=self.d_model,
                      num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                      kernel_size=self.kernel_size, name="encoders0.0")(h)
        for i in range(self.num_layers - 1):
            h = SANMLayer(in_size=self.d_model, d_model=self.d_model,
                          num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                          kernel_size=self.kernel_size,
                          name=f"encoders.{i}")(h)
        return nn.LayerNorm(name="after_norm")(h)
