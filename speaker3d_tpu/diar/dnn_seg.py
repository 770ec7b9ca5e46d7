"""DNN segmentation inference: trained FSMNSegmenter -> SlidingSegmentation.

Plugs into DiarizationPipeline as the `segmentation_model` callable
(wav[n], fs) -> SlidingSegmentation, replacing the reference's pyannote
segmentation-3.0 download (reference: speakerlab/bin/infer_diarization.py:
168-188, 591-604). The overlap-aware post-processing (diar/overlap.py)
consumes the result unchanged: per-frame speaker counts gate cluster
activations and Hungarian alignment maps window-local channels to global
clusters.

TPU-first notes
---------------
- STATIC SHAPES: the file is covered by overlapping fixed-length windows
  (window_dur, step); all windows share one [batch, samples] shape so ONE
  jitted fbank+FSMN executable serves every file. Features are absolute
  log-mel (no per-window mean-norm), matching training (train/seg_train.py)
  so window placement does not change the features underneath it.
- The window step is snapped to the 10 ms fbank hop so chunk starts land
  exactly on the aggregation frame grid (diar/overlap.py::aggregate_count).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from speaker3d_tpu.diar.overlap import SlidingSegmentation
from speaker3d_tpu.models.segmentation import FSMNSegmenter
from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank


class DnnSegmenter:
    """Callable sliding-window segmentation with the pipeline interface."""

    def __init__(self, model: FSMNSegmenter, variables,
                 sample_rate: int = 16000, window_dur: float = 5.0,
                 step_dur: float = 0.5, batch_size: int = 8):
        import jax

        self.fs = sample_rate
        cfg = FbankConfig(sample_rate=sample_rate,
                          num_mel_bins=model.feat_dim)
        self.frame_length = cfg.frame_length
        self.frame_shift = cfg.frame_shift
        self.frame_step = cfg.frame_shift / sample_rate
        self.frame_duration = cfg.frame_length / sample_rate
        self.win_samples = int(window_dur * sample_rate)
        # snap the step to the fbank hop so chunk starts hit the frame grid
        self.step_samples = max(
            int(round(step_dur * sample_rate / cfg.frame_shift))
            * cfg.frame_shift, cfg.frame_shift)
        self.frames_per_win = 1 + (self.win_samples
                                   - self.frame_length) // self.frame_shift
        self.batch = batch_size
        self.num_classes = model.max_speakers

        fbank = KaldiFbank(cfg, mean_norm=False)
        params = variables["params"] if "params" in variables else variables

        def forward(wavs):
            feats = fbank(wavs)
            logits = model.apply({"params": params}, feats, train=False)
            return jax.nn.sigmoid(logits)

        self._forward = jax.jit(forward)

    def __call__(self, wav_1d, sample_rate: Optional[int] = None
                 ) -> SlidingSegmentation:
        if sample_rate is not None and sample_rate != self.fs:
            raise ValueError(f"expected {self.fs} Hz audio, got {sample_rate}")
        x = np.clip(np.asarray(wav_1d, np.float32).reshape(-1), -1.0, 1.0)
        n = x.shape[0]
        # windows covering [0, n): starts every step, last window zero-padded
        n_win = max(1, 1 + -(-max(n - self.win_samples, 0)
                             // self.step_samples))
        windows = np.zeros((n_win, self.win_samples), np.float32)
        starts = np.zeros(n_win, np.float64)
        for k in range(n_win):
            s0 = k * self.step_samples
            s1 = min(s0 + self.win_samples, n)
            windows[k, :s1 - s0] = x[s0:s1]
            starts[k] = s0 / self.fs

        probs = np.zeros((n_win, self.frames_per_win, self.num_classes),
                         np.float32)
        b = self.batch
        for i in range(-(-n_win // b)):
            batch = np.zeros((b, self.win_samples), np.float32)
            got = min(b, n_win - i * b)
            batch[:got] = windows[i * b:i * b + got]
            out = np.asarray(self._forward(batch))
            probs[i * b:i * b + got] = out[:got]

        return SlidingSegmentation(data=probs, chunk_starts=starts,
                                   frame_step=self.frame_step,
                                   frame_duration=self.frame_duration)


def load_segmentation_exp(exp_dir: str, sample_rate: int = 16000,
                          **seg_kwargs) -> DnnSegmenter:
    """Build a DnnSegmenter from a cli/train_segmentation.py experiment."""
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.config import build_config

    config = build_config(os.path.join(exp_dir, "config.yaml"), [],
                          copy_to_exp_dir=False)
    margs = dict(config.get("model", {}).get("args", {}))
    if "max_speakers" in config:
        margs.setdefault("max_speakers", config["max_speakers"])
    model = FSMNSegmenter(**margs)
    ckpt = Checkpointer(os.path.join(exp_dir, "models"))
    recovered = ckpt.recover_if_possible()
    if recovered is None or "train_state" not in recovered:
        raise FileNotFoundError(f"no checkpoint under {exp_dir}/models")
    params = recovered["train_state"]["params"]
    seg_kwargs.setdefault("window_dur", config.get("window_dur", 5.0))
    return DnnSegmenter(model, {"params": params}, sample_rate=sample_rate,
                        **seg_kwargs)
