"""Paraformer-style feature processors: LFR stacking + CMVN.

Behavioral contract (reference: speakerlab/process/processor_para.py):
  - apply_lfr: low-frame-rate stacking — window lfr_m frames, hop lfr_n,
    (lfr_m-1)//2 left-padding by repeating the first frame, last-frame
    padding by repeating the final frame (:16-33).
  - apply_cmvn: x = (x + means) * vars from a Kaldi-style am.mvn file with
    <AddShift>/<Rescale> blocks (:35-75).

These feed a frozen Paraformer ASR encoder in the reference's train_para
variant (bin/train_para.py:36-38); the encoder itself is an external funasr
asset (zero-egress here), so the fusion trainer accepts any callable
``asr_encoder(lfr_cmvn_feats) -> [B, T, D]`` (e.g. a converted checkpoint).
"""

from __future__ import annotations

import numpy as np


def apply_lfr(inputs: np.ndarray, lfr_m: int, lfr_n: int) -> np.ndarray:
    """inputs [T, D] -> [ceil(T/lfr_n), lfr_m*D]."""
    inputs = np.asarray(inputs)
    T = inputs.shape[0]
    T_lfr = int(np.ceil(T / lfr_n))
    left = np.repeat(inputs[:1], (lfr_m - 1) // 2, axis=0)
    x = np.concatenate([left, inputs], axis=0)
    T_pad = x.shape[0]
    out = []
    for i in range(T_lfr):
        if lfr_m <= T_pad - i * lfr_n:
            out.append(x[i * lfr_n:i * lfr_n + lfr_m].reshape(-1))
        else:
            frame = x[i * lfr_n:].reshape(-1)
            num_pad = lfr_m - (T_pad - i * lfr_n)
            frame = np.concatenate([frame] + [x[-1]] * num_pad)
            out.append(frame)
    return np.stack(out).astype(np.float32)


def apply_cmvn(inputs: np.ndarray, cmvn: np.ndarray) -> np.ndarray:
    """x = (x + means) * vars. cmvn: [2, D]."""
    dim = inputs.shape[-1]
    return ((inputs + cmvn[0:1, :dim]) * cmvn[1:2, :dim]).astype(np.float32)


def load_cmvn(cmvn_file: str) -> np.ndarray:
    """Parse a Kaldi-nnet-style am.mvn (<AddShift>/<Rescale>)."""
    with open(cmvn_file, encoding="utf-8") as f:
        lines = f.readlines()
    means_list, vars_list = [], []
    for i, line in enumerate(lines):
        item = line.split()
        if not item:
            continue
        if item[0] == "<AddShift>":
            nxt = lines[i + 1].split()
            if nxt[0] == "<LearnRateCoef>":
                means_list = nxt[3:len(nxt) - 1]
        elif item[0] == "<Rescale>":
            nxt = lines[i + 1].split()
            if nxt[0] == "<LearnRateCoef>":
                vars_list = nxt[3:len(nxt) - 1]
    return np.stack([np.array(means_list, np.float32),
                     np.array(vars_list, np.float32)])


def apply_lfr_device(x, lfr_m: int, lfr_n: int):
    """Batched on-device LFR: [B, T, D] -> [B, ceil(T/lfr_n), lfr_m*D].

    Same semantics as apply_lfr (left-pad by repeating the first frame,
    tail-pad by repeating the last), built from strided slices + concat —
    gather-free so XLA tiles it cheaply (see ops/fbank.py framing notes).
    Runs inside the jitted train step right after the fbank frontend.
    """
    import jax.numpy as jnp

    b, t, d = x.shape
    t_lfr = -(-t // lfr_n)
    left = (lfr_m - 1) // 2
    x = jnp.concatenate([jnp.repeat(x[:, :1], left, axis=1), x], axis=1)
    need = (t_lfr - 1) * lfr_n + lfr_m
    if need > x.shape[1]:
        x = jnp.concatenate(
            [x, jnp.repeat(x[:, -1:], need - x.shape[1], axis=1)], axis=1)
    taps = [x[:, i:i + (t_lfr - 1) * lfr_n + 1:lfr_n] for i in range(lfr_m)]
    return jnp.concatenate(taps, axis=-1)
