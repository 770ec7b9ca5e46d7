"""Python side of the native serving runtime.

The C++ CLI (runtime/bin/extract_speaker_embedding.cpp) embeds CPython and
calls these two functions; everything else (WAV decode, fbank, batching,
timing) is native C++. This is the TPU-era analogue of the reference's ONNX
runtime session (reference: runtime/onnxruntime/model/
speaker_embedding_model.{h,cpp}): the model is one jit-compiled XLA
executable, compiled once at init and reused per batch.
"""

from __future__ import annotations

import numpy as np

_STATE = {}


def init(model_spec: str, local_model_dir: str = "pretrained",
         feat_dim: int = 80, precision: str = "high") -> int:
    """model_spec: a registry model id OR an exp_dir path. Returns 0 on ok."""
    import jax

    if model_spec in _registry_ids():
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(model_spec, local_model_dir)
    else:
        from speaker3d_tpu.cli.extract import build_model_from_exp

        model, variables, _ = build_model_from_exp(model_spec)

    @jax.jit
    def run(feats):
        with jax.default_matmul_precision(precision):
            return model.apply(variables, feats)

    _STATE["run"] = run
    _STATE["feat_dim"] = feat_dim
    return 0


def _registry_ids():
    from speaker3d_tpu.cli.registry import SUPPORTS

    return SUPPORTS


def embed(feats_bytes: bytes, num_frames: int, feat_dim: int) -> bytes:
    """float32 features [num_frames, feat_dim] (one utterance) -> float32
    embedding bytes."""
    feats = np.frombuffer(feats_bytes, dtype=np.float32).reshape(
        1, num_frames, feat_dim)
    out = np.asarray(_STATE["run"](feats))[0].astype(np.float32)
    return out.tobytes()
