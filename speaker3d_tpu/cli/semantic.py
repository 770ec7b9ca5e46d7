"""Semantic-speaker CLIs: dialogue detection & speaker-turn detection.

Behavioral contract (reference: egs/semantic_speaker/bert/bin/
run_dialogue_detection.py, run_speaker_turn_detection.py): JSON data in,
BERT fine-tuning, accuracy/precision/recall/F1 report on the eval split.

Data format: JSONL; dialogue detection lines {"text": str, "label": 0|1},
turn detection lines {"text": str, "labels": [0|1 per char/token]}.
Tokenizer: a local HF tokenizer dir (zero-egress) or the built-in char-level
fallback.

Usage:
  python -m speaker3d_tpu.cli.semantic dialogue --train train.jsonl \
      --eval eval.jsonl --exp_dir exp/sem [--pretrained DIR] [--epochs 3]
  python -m speaker3d_tpu.cli.semantic turn --train ... --eval ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


class CharTokenizer:
    """Char-level fallback tokenizer (vocab built from training data)."""

    def __init__(self, texts, max_vocab=8000):
        from collections import Counter

        counts = Counter(c for t in texts for c in t)
        self.vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
        for ch, _ in counts.most_common(max_vocab - len(self.vocab)):
            self.vocab[ch] = len(self.vocab)

    @property
    def vocab_size(self):
        return max(len(self.vocab), 5)

    def __call__(self, text, max_length):
        ids = [2] + [self.vocab.get(c, 1) for c in text[:max_length - 2]] + [3]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        return ids + [0] * pad, mask + [0] * pad


def load_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def encode(rows, tokenizer, max_length, token_level):
    ids, masks, labels = [], [], []
    for row in rows:
        i, m = tokenizer(row["text"], max_length)
        ids.append(i)
        masks.append(m)
        if token_level:
            lab = [-100] + list(row["labels"][:max_length - 2])
            lab += [-100] * (max_length - len(lab))
            labels.append(lab)
        else:
            labels.append(int(row["label"]))
    return (np.asarray(ids, np.int32), np.asarray(masks, np.int32),
            np.asarray(labels, np.int32))


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.semantic.bert import (
        SemanticTrainConfig,
        build_model,
        classification_metrics,
        init_semantic_state,
        make_semantic_train_step,
    )

    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["dialogue", "turn"])
    p.add_argument("--train", required=True)
    p.add_argument("--eval", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=4)
    args = p.parse_args(argv)
    os.makedirs(args.exp_dir, exist_ok=True)
    token_level = args.task == "turn"

    train_rows = load_jsonl(args.train)
    eval_rows = load_jsonl(args.eval)
    if args.pretrained:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.pretrained)
        tokenizer = lambda text, L: (
            lambda e: (e["input_ids"], e["attention_mask"]))(
                tok(text, max_length=L, truncation=True, padding="max_length"))
        vocab_size = tok.vocab_size
    else:
        ct = CharTokenizer([r["text"] for r in train_rows])
        tokenizer, vocab_size = ct, ct.vocab_size

    model = build_model("token" if token_level else "sequence",
                        pretrained_dir=args.pretrained,
                        vocab_size=vocab_size, hidden_size=args.hidden_size,
                        num_hidden_layers=args.num_layers,
                        num_attention_heads=max(2, args.hidden_size // 64))
    mesh = make_mesh(model=1)

    tr = encode(train_rows, tokenizer, args.max_seq_length, token_level)
    ev = encode(eval_rows, tokenizer, args.max_seq_length, token_level)
    n = (len(tr[0]) // args.batch_size) * args.batch_size
    steps_per_epoch = max(n // args.batch_size, 1)
    cfg = SemanticTrainConfig(lr=args.lr,
                              total_steps=steps_per_epoch * args.epochs,
                              warmup_steps=steps_per_epoch // 10)
    state = init_semantic_state(model, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_semantic_train_step(model, cfg, mesh, host["params"],
                                    token_level)

    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        order = rng.permutation(len(tr[0]))[:n]
        losses = []
        for s in range(0, n, args.batch_size):
            idx = order[s:s + args.batch_size]
            batch = {"input_ids": tr[0][idx], "attention_mask": tr[1][idx],
                     "labels": tr[2][idx]}
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        print(f"epoch {epoch+1}: loss {np.mean(losses):.4f}")

    # eval
    import jax.numpy as jnp

    params = jax.device_get(state)["params"]

    @jax.jit
    def predict(ids, mask):
        token_type = jnp.zeros_like(ids)
        positions = jnp.broadcast_to(jnp.arange(ids.shape[-1])[None], ids.shape)
        return model.module.apply({"params": params}, ids, mask, token_type,
                                  positions, None, deterministic=True).logits

    preds = []
    for s in range(0, len(ev[0]), args.batch_size):
        logits = predict(ev[0][s:s + args.batch_size],
                         ev[1][s:s + args.batch_size])
        preds.append(np.argmax(np.asarray(logits), axis=-1))
    preds = np.concatenate(preds)
    m = classification_metrics(ev[2], preds)
    with open(os.path.join(args.exp_dir, "metrics.json"), "w") as f:
        json.dump(m, f, indent=2)
    print("eval:", m)


if __name__ == "__main__":
    main()
