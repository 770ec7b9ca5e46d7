"""Lightweight trainable DFSMN voice-activity-detection model.

Why this exists: the reference's main diarization path depends on two
*external* VAD models it does not contain — the closed-source native TenVad
library (reference: speakerlab/bin/infer_diarization.py:126-166) and the
modelscope FSMN-VAD download (reference: egs/3dspeaker/speaker-diarization/
local/voice_activity_detection.py:40-43). This module is the in-framework
replacement: a small deep-FSMN (Zhang et al. 2018, "Deep-FSMN for Large
Vocabulary Continuous Speech Recognition") producing per-frame speech logits
at the fbank hop (10 ms), trainable with speaker3d_tpu.train.vad_train and
pluggable into the diarization pipeline via speaker3d_tpu.diar.dnn_vad.

TPU-first notes
---------------
- The FSMN "memory block" — a per-channel FIR filter over time with lorder
  past and rorder future taps — is a depthwise 1D convolution: a pure VPU
  elementwise-multiply-accumulate with static shapes, no recurrence, so the
  whole model jits into one feed-forward executable (unlike LSTM-style VADs,
  which serialize over time).
- All heavy layers are Dense ([B*T, C] matmuls on the MXU); the model is
  ~0.2M params, so VAD adds negligible device time next to the embedder.
- The receptive field is (lorder + rorder) * num_layers frames; chunked
  streaming inference overlaps windows by at least that many frames (see
  diar/dnn_vad.py) so chunking is lossless.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FSMNBlock(nn.Module):
    """One DFSMN layer: project down, depthwise temporal FIR memory with an
    identity skip from the previous memory, re-expand with ReLU."""

    hidden_dim: int
    proj_dim: int
    lorder: int
    rorder: int

    @nn.compact
    def __call__(self, h, prev_mem):
        p = nn.Dense(self.proj_dim, use_bias=False, name="proj")(h)
        k = self.lorder + self.rorder + 1
        fir = nn.Conv(self.proj_dim, (k,), feature_group_count=self.proj_dim,
                      padding=[(self.lorder, self.rorder)], use_bias=False,
                      name="memory")(p)
        mem = p + fir
        if prev_mem is not None:
            mem = mem + prev_mem
        out = nn.relu(nn.Dense(self.hidden_dim, name="expand")(mem))
        return out, mem


class FSMNVad(nn.Module):
    """Per-frame speech/non-speech classifier on log-mel fbank features.

    Input:  [B, T, feat_dim] (per-window mean-normalized log-fbank)
    Output: [B, T] speech logits (sigmoid -> P(speech)).
    """

    feat_dim: int = 80
    hidden_dim: int = 128
    proj_dim: int = 64
    num_layers: int = 4
    lorder: int = 20
    rorder: int = 5

    @property
    def receptive_field(self) -> tuple[int, int]:
        """(left, right) context consumed per output frame."""
        return (self.lorder * self.num_layers, self.rorder * self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hidden_dim, name="in_linear")(x)
        h = nn.LayerNorm(name="in_norm")(h)
        h = nn.relu(h)
        mem = None
        for i in range(self.num_layers):
            h, mem = FSMNBlock(hidden_dim=self.hidden_dim,
                               proj_dim=self.proj_dim, lorder=self.lorder,
                               rorder=self.rorder, name=f"fsmn.{i}")(h, mem)
        logits = nn.Dense(1, name="out_linear")(h)
        return jnp.squeeze(logits, -1)
