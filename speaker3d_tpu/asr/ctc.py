"""In-repo ASR: SAN-M encoder + CTC head with greedy timestamped decoding.

Why this exists: the reference's speaker-attributed transcription downloads
a modelscope Paraformer (reference: egs/3dspeaker/speaker-diarization/local/
out_transcription.py:29) — an external asset. This module closes the loop
in-repo (VERDICT r1 item 8): a CTC head on the native SAN-M encoder
(models/sanm.py — the same funasr-parity encoder used by train_para),
trained with optax.ctc_loss, greedy-decoded on host into the exact
(text, raw_text, timestamp) triple diar/transcribe.py consumes. The
external-engine JSON hook stays (cli/transcribe_diarization.py --asr_dir).

TPU-first notes: the whole train step (fbank -> encoder -> CTC loss ->
Adam) traces into one shard_map'ed XLA executable over the 'data' mesh
axis; decoding is a trivial argmax on device + run-length collapse on host.
"""

from __future__ import annotations

import json
import os
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.linen as nn

from speaker3d_tpu.models.sanm import SANMEncoder
from speaker3d_tpu.train.schedulers import warmup_cosine_lr

BLANK_ID = 0  # vocab token ids start at 1


class SANMCTC(nn.Module):
    """Log-mel features [B, T, feat_dim] -> CTC logits over LFR frames
    [B, ceil(T/lfr_n), vocab+1]. LFR stacking (the Paraformer frontend,
    data/processor_para.py) both matches the reference encoder's input
    contract and shortens the CTC alignment lattice — small models train
    far better at 10*lfr_n ms hops than at raw 10 ms frames."""

    vocab_size: int
    feat_dim: int = 80
    d_model: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    num_layers: int = 4
    kernel_size: int = 11
    lfr_m: int = 5
    lfr_n: int = 4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from speaker3d_tpu.data.processor_para import apply_lfr_device

        if self.lfr_n > 1 or self.lfr_m > 1:
            feats = apply_lfr_device(feats, self.lfr_m, self.lfr_n)
        h = SANMEncoder(input_dim=self.feat_dim * self.lfr_m,
                        d_model=self.d_model,
                        num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                        num_layers=self.num_layers,
                        kernel_size=self.kernel_size,
                        name="encoder")(feats, train=train)

        def blank_prior_bias(key, shape, dtype=jnp.float32):
            # start in the blank-dominant regime: without this, small models
            # can settle into the degenerate no-blank CTC solution (every
            # frame emits a token, silence included), which destroys the
            # run-length word timestamps greedy_decode derives
            b = jnp.zeros(shape, dtype)
            return b.at[BLANK_ID].set(2.0)

        return nn.Dense(self.vocab_size + 1, name="ctc_out",
                        bias_init=blank_prior_bias)(h)


class CTCTrainConfig(NamedTuple):
    min_lr: float = 1e-5
    max_lr: float = 2e-3
    warmup_epoch: int = 1
    fix_epoch: int = 20
    step_per_epoch: int = 100
    weight_decay: float = 1e-6
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8


def init_ctc_train_state(rng, model, example_feats, mesh: Mesh):
    variables = model.init(rng, example_feats, train=True)
    params = variables["params"]
    state = {
        "params": params,
        "adam_m": jax.tree_util.tree_map(jnp.zeros_like, params),
        "adam_v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, jax.tree_util.tree_map(lambda _: rep, state))


def make_ctc_train_step(model, cfg: CTCTrainConfig, mesh: Mesh,
                        state_example,
                        feature_fn: Optional[Callable] = None) -> Callable:
    """Batches: {'wavs' [B, L] (or 'feats' [B, T, F]),
    'labels' [B, U] int32 (0-padded), 'label_lens' [B] int32}."""
    import optax

    n_data = mesh.shape["data"]
    batch_key = "wavs" if feature_fn is not None else "feats"
    batch_specs = {batch_key: P("data"), "labels": P("data"),
                   "label_lens": P("data")}

    def shard_body(state, batch):
        x, labels = batch[batch_key], batch["labels"]
        if feature_fn is not None:
            x = feature_fn(x)
        global_b = x.shape[0] * n_data
        u = labels.shape[1]
        label_pad = (jnp.arange(u)[None, :]
                     >= batch["label_lens"][:, None]).astype(jnp.float32)

        lr = warmup_cosine_lr(
            state["step"], min_lr=cfg.min_lr, max_lr=cfg.max_lr,
            warmup_epoch=cfg.warmup_epoch, fix_epoch=cfg.fix_epoch,
            step_per_epoch=cfg.step_per_epoch)

        def loss_fn(params):
            logits = model.apply({"params": params}, x, train=True)
            logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
            per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                     blank_id=BLANK_ID)
            return jnp.sum(per_seq / jnp.maximum(
                batch["label_lens"].astype(jnp.float32), 1.0)) / global_b

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")

        step = state["step"] + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - cfg.beta1 ** t
        bc2 = 1.0 - cfg.beta2 ** t

        def adam(p, g, m, v):
            g = g + cfg.weight_decay * p
            m = cfg.beta1 * m + (1 - cfg.beta1) * g
            v = cfg.beta2 * v + (1 - cfg.beta2) * g * g
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
            return p - lr * upd, m, v

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        upd = [adam(p, g, m, v) for p, g, m, v in zip(
            flat_p, jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(state["adam_m"]),
            jax.tree_util.tree_leaves(state["adam_v"]))]
        new_state = {
            "params": jax.tree_util.tree_unflatten(
                treedef, [a[0] for a in upd]),
            "adam_m": jax.tree_util.tree_unflatten(
                treedef, [a[1] for a in upd]),
            "adam_v": jax.tree_util.tree_unflatten(
                treedef, [a[2] for a in upd]),
            "step": step,
        }
        return new_state, {"loss": loss, "lr": lr}

    rep = jax.tree_util.tree_map(lambda _: P(), state_example)
    shard_fn = jax.shard_map(shard_body, mesh=mesh,
                             in_specs=(rep, batch_specs),
                             out_specs=(rep, P()), check_vma=False)
    return jax.jit(shard_fn, donate_argnums=(0,))


def greedy_decode(logits: np.ndarray,
                  frame_dur_s: float) -> List[Tuple[int, float, float]]:
    """CTC greedy decode of [T, V+1] logits -> [(token_id, st_s, ed_s)].

    Collapse repeated frame argmaxes into runs, drop blanks; each token's
    timestamps span its contiguous frame run (the word-timestamp contract
    of diar/transcribe.py)."""
    ids = np.asarray(logits).argmax(axis=-1)
    out = []
    t = 0
    T = ids.shape[0]
    while t < T:
        tok = ids[t]
        start = t
        while t < T and ids[t] == tok:
            t += 1
        if tok != BLANK_ID:
            out.append((int(tok), start * frame_dur_s, t * frame_dur_s))
    return out


def tokens_to_asr_result(decoded: Sequence[Tuple[int, float, float]],
                         vocab: Sequence[str]) -> dict:
    """(token, st, ed) runs -> the reference ASR triple: punctuated text,
    space-separated raw_text, per-word [st, ed] (out_transcription.py:29
    contract). vocab[0] corresponds to token id 1."""
    words = [vocab[tok - 1] for tok, _, _ in decoded]
    text = " ".join(words) + ("." if words else "")
    return {"text": text, "raw_text": " ".join(words),
            "timestamp": [[st, ed] for _, st, ed in decoded]}


class CTCTranscriber:
    """Load a cli/train_asr_ctc.py experiment and transcribe wavs."""

    def __init__(self, exp_dir: str, sample_rate: int = 16000):
        from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
        from speaker3d_tpu.utils.checkpoint import Checkpointer
        from speaker3d_tpu.utils.config import build_config

        config = build_config(os.path.join(exp_dir, "config.yaml"))
        with open(os.path.join(exp_dir, "vocab.json")) as f:
            self.vocab = json.load(f)
        margs = dict(config.get("model", {}).get("args", {}))
        self.model = SANMCTC(vocab_size=len(self.vocab), **margs)
        states = Checkpointer(os.path.join(exp_dir, "models")) \
            .recover_if_possible()
        if states is None or "train_state" not in states:
            raise FileNotFoundError(f"no checkpoint under {exp_dir}/models")
        self.params = states["train_state"]["params"]
        self.fbank = KaldiFbank(FbankConfig(
            sample_rate=config.get("sample_rate", sample_rate),
            num_mel_bins=config.get("n_mels", 80)), mean_norm=False)
        # global CMVN saved by the trainer (Paraformer am.mvn convention)
        self.cmvn = np.load(os.path.join(exp_dir, "cmvn.npy"))
        self.frame_dur_s = 0.010 * self.model.lfr_n  # fbank hop x LFR
        self.sample_rate = config.get("sample_rate", sample_rate)
        self.window_s = float(config.get("wav_len", 4.0))
        self.overlap_s = 0.5
        cmvn = jnp.asarray(self.cmvn)
        self._jit_logits = jax.jit(
            lambda wav: self.model.apply(
                {"params": self.params},
                (self.fbank(wav[None]) - cmvn[0]) / cmvn[1])[0])

    def _decode_window(self, wav: np.ndarray):
        logits = np.asarray(self._jit_logits(jnp.asarray(wav)))
        return greedy_decode(logits, self.frame_dur_s)

    def transcribe(self, wav: np.ndarray) -> dict:
        """Sliding-window decode at the TRAINED window length: the encoder's
        positional attention does not generalize past positions it saw in
        training, so long recordings are transcribed in wav_len windows
        with 0.5 s overlap; each token is claimed by the window that owns
        its midpoint (every instant claimed exactly once), timestamps are
        offset to global time."""
        fs = self.sample_rate
        win = int(self.window_s * fs)
        if wav.shape[0] <= win:
            return tokens_to_asr_result(self._decode_window(wav), self.vocab)
        ovl = int(self.overlap_s * fs)
        step = win - ovl
        half_ovl_s = self.overlap_s / 2.0
        tokens = []
        n_windows = -(-max(wav.shape[0] - ovl, 1) // step)
        for k in range(n_windows):
            s0 = k * step
            piece = wav[s0:s0 + win]
            if piece.shape[0] < win:
                piece = np.pad(piece, (0, win - piece.shape[0]))
            t0 = s0 / fs
            lo = t0 + (half_ovl_s if k > 0 else 0.0)
            hi = t0 + step / fs + half_ovl_s if k < n_windows - 1 \
                else wav.shape[0] / fs
            for tok, st, ed in self._decode_window(piece):
                mid = t0 + 0.5 * (st + ed)
                if lo <= mid < hi:
                    tokens.append((tok, t0 + st, t0 + ed))
        return tokens_to_asr_result(tokens, self.vocab)
