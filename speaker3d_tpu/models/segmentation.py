"""Trainable multi-speaker segmentation model (overlap detection).

Why this exists: the reference's overlap-aware diarization path depends on
the *external* pyannote segmentation-3.0 download gated behind an HF access
token (reference: speakerlab/bin/infer_diarization.py:168-188). This module
is the in-framework replacement: a DFSMN trunk (shared design with
models/fsmn_vad.py) emitting per-frame, per-local-speaker activation logits
[B, T, max_speakers], trained with permutation-invariant BCE on synthetic
multi-speaker mixtures (data/dataset_seg.py, train/seg_train.py) and served
through a sliding-window wrapper (diar/dnn_seg.py) that produces the
`SlidingSegmentation` contract consumed by diar/overlap.py.

Speaker-channel identity is only locally consistent (within a window) —
exactly like pyannote's chunk-local speakers; the diarization post-processing
re-aligns channels to global clusters per chunk via Hungarian assignment
(diar/overlap.py::post_process), so no global consistency is required here.

TPU-first notes
---------------
- Same all-feed-forward DFSMN body as the VAD: depthwise FIR memory (VPU)
  plus Dense layers (MXU), static shapes, one jitted executable for any
  audio length via fixed-size windows.
- max_speakers is a static head width; PIT enumerates the K! channel
  permutations at trace time (K<=4), so the loss is branch-free under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speaker3d_tpu.models.fsmn_vad import FSMNBlock


class FSMNSegmenter(nn.Module):
    """Per-frame local-speaker activations on log-mel fbank features.

    Input:  [B, T, feat_dim] absolute (non-mean-normed) log-fbank
    Output: [B, T, max_speakers] activation logits (sigmoid -> P(active)).
    """

    feat_dim: int = 80
    hidden_dim: int = 128
    proj_dim: int = 64
    num_layers: int = 4
    lorder: int = 20
    rorder: int = 20
    max_speakers: int = 3

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
        return nn.Dense(self.max_speakers, name="out_linear")(h)


def pit_bce(logits, labels):
    """Permutation-invariant frame BCE.

    logits, labels: [B, T, K]. Returns ([B] min-permutation mean BCE,
    [B, K] the label-channel order achieving it) — the assignment lets
    callers compute permutation-aligned metrics.
    """
    import itertools

    k = logits.shape[-1]
    # pairwise cost[b, i, j] = mean_t BCE(logits[..., i], labels[..., j])
    lg = logits[:, :, :, None]                    # [B, T, K, 1]
    lb = labels[:, :, None, :].astype(logits.dtype)  # [B, T, 1, K]
    bce = jnp.maximum(lg, 0) - lg * lb + jnp.log1p(jnp.exp(-jnp.abs(lg)))
    cost = jnp.mean(bce, axis=1)                  # [B, K, K]

    perms = list(itertools.permutations(range(k)))
    idx = jnp.arange(k)
    per_perm = jnp.stack(
        [cost[:, idx, jnp.asarray(p)].mean(-1) for p in perms], axis=-1)
    best = jnp.argmin(per_perm, axis=-1)          # [B]
    loss = jnp.min(per_perm, axis=-1)             # [B]
    assignment = jnp.asarray(perms)[best]         # [B, K]
    return loss, assignment
