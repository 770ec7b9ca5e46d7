"""Batched embedding extraction: wav batch -> fbank -> backbone, one jit.

The returned callable is the device hot path of diarization and batch SV
inference (reference: bin/infer_diarization.py:621-639 uses
torch.vmap(FBank) + model; here fbank IS already batched and the whole
chain compiles into a single XLA executable with static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank


def build_embedding_fn(model, variables, *, sample_rate: int = 16000,
                       num_mel_bins: int = 80, mean_norm: bool = True,
                       dtype=None, precision: str | None = "float32",
                       donate: bool = False) -> Callable:
    """Return jitted fn: float32 wav batch [B, L] -> embeddings [B, D].

    ``dtype``: optional compute dtype for the backbone (e.g. jnp.bfloat16 for
    throughput); fbank always runs float32 for numerical parity, and the
    embedding is returned float32.
    ``precision``: default matmul/conv precision for the backbone. This jax
    build (like the TPU MXU) uses reduced bf16 accumulate by default;
    'float32' gives bit-parity-grade accuracy, None keeps the fast default.
    """
    fbank = KaldiFbank(
        FbankConfig(sample_rate=sample_rate, num_mel_bins=num_mel_bins),
        mean_norm=mean_norm)

    @jax.jit
    def embed(wavs):
        if wavs.dtype == jnp.int16:
            # PCM16 wire: k/32768 is a power-of-two scale, bitwise equal
            # to the host float conversion (utils/wire.py) — half the
            # host->device bytes of float32
            wavs = wavs.astype(jnp.float32) * jnp.float32(1 / 32768)
        feats = fbank(wavs)
        if dtype is not None:
            feats = feats.astype(dtype)
        if precision is not None:
            with jax.default_matmul_precision(precision):
                emb = model.apply(variables, feats)
        else:
            emb = model.apply(variables, feats)
        return emb.astype(jnp.float32)

    return embed


def build_feature_fn(*, sample_rate: int = 16000, num_mel_bins: int = 80,
                     mean_norm: bool = True) -> Callable:
    """Jitted fbank-only fn for extract-style pipelines."""
    fbank = KaldiFbank(
        FbankConfig(sample_rate=sample_rate, num_mel_bins=num_mel_bins),
        mean_norm=mean_norm)
    # jit only over the wav: a runtime mean_norm override would reach
    # _fbank_apply's static argname as a tracer and fail
    return jax.jit(lambda wav: fbank(wav))


def build_sharded_embedding_fn(model, variables, mesh, *,
                               sample_rate: int = 16000,
                               num_mel_bins: int = 80, mean_norm: bool = True,
                               dtype=None,
                               precision: str | None = "float32") -> Callable:
    """Data-parallel embedding extraction over the mesh's 'data' axis:
    params replicated, batch sharded — the multi-chip scaling path for
    extract/diarization (SURVEY.md §2.6: audio-seconds/s scales with chips;
    batch size must be divisible by the data-axis size)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    fbank = KaldiFbank(
        FbankConfig(sample_rate=sample_rate, num_mel_bins=num_mel_bins),
        mean_norm=mean_norm)
    n_data = mesh.shape["data"]
    rep = NamedSharding(mesh, P())
    variables = jax.device_put(variables, jax.tree_util.tree_map(
        lambda _: rep, variables))
    batch_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, out_shardings=rep)
    def embed(wavs):
        if wavs.dtype == jnp.int16:
            wavs = wavs.astype(jnp.float32) * jnp.float32(1 / 32768)
        feats = fbank(wavs)
        if dtype is not None:
            feats = feats.astype(dtype)
        if precision is not None:
            with jax.default_matmul_precision(precision):
                emb = model.apply(variables, feats)
        else:
            emb = model.apply(variables, feats)
        return emb.astype(jnp.float32)

    def run(wavs):
        assert wavs.shape[0] % n_data == 0, (
            f"batch {wavs.shape[0]} not divisible by data axis {n_data}")
        # device_put directly (no jnp.asarray): accepts host numpy AND the
        # diarization pipeline's device-resident chunk batches without an
        # extra default-device hop or a host round-trip
        return embed(jax.device_put(wavs, batch_sharding))

    return run
