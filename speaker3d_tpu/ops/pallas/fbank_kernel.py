"""Pallas TPU kernel: fused fbank spectral pipeline.

The kernel fuses the per-frame analysis chain — (DC-removal + pre-emphasis +
window + padded rFFT as one matmul) -> power spectrum -> mel projection ->
log — into a single VMEM-resident pipeline, so the rFFT output and the power
spectrum (the 514- and 257-wide intermediates, ~6.4x the feature bytes)
never round-trip through HBM. Framing itself stays in XLA (strided slices
are not Mosaic-lowerable as vector ops); the frames tensor streams through
the kernel tile by tile.

Numerically identical (float32) to speaker3d_tpu.ops.fbank.KaldiFbank with
the same analysis matrices (tested in interpret mode and on TPU).

Grid: (batch, frame_tiles) with TILE_T frames per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speaker3d_tpu.ops.fbank import (
    FbankConfig,
    _frames,
    analysis_matrix,
    mel_banks,
)

_EPSILON = float(np.finfo(np.float32).eps)
TILE_T = 128  # frames per grid step


def _fbank_kernel(frames_ref, B_ref, mel_ref, out_ref, *, n_bins, use_log,
                  use_power):
    frames = frames_ref[0]                            # [tile_t, frame_length]
    y = jnp.dot(frames, B_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    power = jnp.square(y[:, :n_bins]) + jnp.square(y[:, n_bins:])
    if not use_power:  # magnitude spectrum (KaldiFbank use_power=False)
        power = jnp.sqrt(power)
    feats = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    if use_log:
        feats = jnp.log(jnp.maximum(feats, _EPSILON))
    out_ref[:] = feats[None]


def pallas_fbank(wav, cfg: FbankConfig = FbankConfig(),
                 mean_norm: bool = False, interpret: bool = False):
    """wav: [B, N] (or [N]) float32 -> [B, T, n_mels] log-mel."""
    fn = _build(cfg, mean_norm, interpret)
    if wav.ndim == 1:
        return fn(wav[None])[0]
    return fn(wav)


@functools.lru_cache(maxsize=8)
def _build(cfg: FbankConfig, mean_norm: bool, interpret: bool):
    L, S = cfg.frame_length, cfg.frame_shift
    n_bins = cfg.padded_window_size // 2 + 1
    B = jnp.asarray(analysis_matrix(cfg), jnp.float32)
    mel = jnp.asarray(mel_banks(cfg), jnp.float32)

    kernel = functools.partial(_fbank_kernel, n_bins=n_bins,
                               use_log=cfg.use_log_fbank,
                               use_power=cfg.use_power)

    @jax.jit
    def fn(wav):
        n = wav.shape[-1]
        T = cfg.num_frames(n)
        n_tiles = -(-T // TILE_T)
        frames = _frames(wav, L, S)                    # [B, T, L]
        frames = jnp.pad(frames, ((0, 0), (0, n_tiles * TILE_T - T), (0, 0)))

        out = pl.pallas_call(
            kernel,
            grid=(wav.shape[0], n_tiles),
            in_specs=[
                pl.BlockSpec((1, TILE_T, L), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B.shape[0], B.shape[1]), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mel.shape[0], mel.shape[1]), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_T, mel.shape[1]),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (wav.shape[0], n_tiles * TILE_T, mel.shape[1]), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_tiles * TILE_T * (L * 2 * n_bins + n_bins
                                              * mel.shape[1]) * wav.shape[0],
                bytes_accessed=frames.size * 4,
                transcendentals=n_tiles * TILE_T * mel.shape[1] * wav.shape[0],
            ),
            interpret=interpret,
        )(frames, B, mel)
        feats = out[:, :T]
        if mean_norm:
            feats = feats - jnp.mean(feats, axis=1, keepdims=True)
        return feats

    return fn
