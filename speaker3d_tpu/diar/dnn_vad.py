"""DNN VAD inference wrapper: trained DFSMN -> frame flags for diarization.

Plugs into DiarizationPipeline as the `vad` callable
(wav[n] -> (flags, wav)) replacing the reference's external TenVad/FSMN-VAD
downloads (reference: speakerlab/bin/infer_diarization.py:120-166). Flags
come out at the model's native 10 ms fbank hop; the pipeline reads
`.frame_ms` so its post-processing windows (fill<=300 ms, drop<200 ms)
stay duration-correct.

TPU-first notes
---------------
- STATIC SHAPES: arbitrary-length audio is cut into fixed-size frame chunks
  with a context overlap of at least the model's receptive field on each
  side; every window is the same [batch, samples] shape, so ONE jitted
  fbank+FSMN executable serves every file. Features are absolute log-mel
  (no per-window mean-norm, matching training — window-relative stats would
  couple the output to the chunk grid and to the zero-padding at file
  edges), and the FIR memory has no recurrent state, so core-region outputs
  are exactly chunk-grid invariant.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from speaker3d_tpu.models.fsmn_vad import FSMNVad
from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank


class DnnVAD:
    """Callable VAD with the TenVad-wrapper interface (diar/vad.py)."""

    def __init__(self, model: FSMNVad, variables, sample_rate: int = 16000,
                 threshold: float = 0.5, chunk_frames: int = 512,
                 ctx_frames: Optional[int] = None, batch_size: int = 4):
        import jax

        self.fs = sample_rate
        self.threshold = threshold
        self.frame_ms = 10.0
        cfg = FbankConfig(sample_rate=sample_rate,
                          num_mel_bins=model.feat_dim)
        self.frame_length = cfg.frame_length
        self.frame_shift = cfg.frame_shift
        left, right = model.receptive_field
        if ctx_frames is None:
            ctx_frames = max(left, right)
        self.chunk = chunk_frames
        self.ctx = ctx_frames
        self.batch = batch_size
        self.win_frames = chunk_frames + 2 * ctx_frames
        self.win_samples = (self.win_frames - 1) * self.frame_shift \
            + self.frame_length

        fbank = KaldiFbank(cfg, mean_norm=False)
        params = variables["params"] if "params" in variables else variables

        def forward(wavs):
            feats = fbank(wavs)
            logits = model.apply({"params": params}, feats, train=False)
            return jax.nn.sigmoid(logits)

        self._forward = jax.jit(forward)

    def __call__(self, wav_1d):
        x = np.clip(np.asarray(wav_1d, np.float32).reshape(-1), -1.0, 1.0)
        n = x.shape[0]
        if n < self.frame_length:
            return [], x
        t = 1 + (n - self.frame_length) // self.frame_shift
        n_chunks = -(-t // self.chunk)

        windows = np.zeros((n_chunks, self.win_samples), np.float32)
        for k in range(n_chunks):
            f0 = k * self.chunk - self.ctx  # first frame of the window
            s0 = f0 * self.frame_shift
            s1 = s0 + self.win_samples
            src_lo, src_hi = max(s0, 0), min(s1, n)
            dst_lo = src_lo - s0
            windows[k, dst_lo:dst_lo + (src_hi - src_lo)] = x[src_lo:src_hi]

        probs = np.zeros((n_chunks, self.chunk), np.float32)
        b = self.batch
        n_batches = -(-n_chunks // b)
        for i in range(n_batches):
            batch = np.zeros((b, self.win_samples), np.float32)
            got = min(b, n_chunks - i * b)
            batch[:got] = windows[i * b:i * b + got]
            out = np.asarray(self._forward(batch))
            probs[i * b:i * b + got] = out[:got, self.ctx:self.ctx + self.chunk]

        flags = (probs.reshape(-1)[:t] > self.threshold).astype(int).tolist()
        return flags, x


def load_vad_exp(exp_dir: str, sample_rate: int = 16000,
                 threshold: float = 0.5, **vad_kwargs) -> DnnVAD:
    """Build a DnnVAD from a cli/train_vad.py experiment directory."""
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.config import build_config

    config = build_config(os.path.join(exp_dir, "config.yaml"), [],
                          copy_to_exp_dir=False)
    margs = dict(config.get("model", {}).get("args", {}))
    model = FSMNVad(**margs)
    ckpt = Checkpointer(os.path.join(exp_dir, "models"))
    recovered = ckpt.recover_if_possible()
    if recovered is None or "train_state" not in recovered:
        raise FileNotFoundError(f"no checkpoint under {exp_dir}/models")
    params = recovered["train_state"]["params"]
    return DnnVAD(model, {"params": params}, sample_rate=sample_rate,
                  threshold=threshold, **vad_kwargs)
