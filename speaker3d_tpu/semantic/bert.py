"""Semantic speaker analysis: BERT dialogue detection & speaker-turn
detection, TPU-native.

Behavioral contract (reference: egs/semantic_speaker/bert/bin/
run_dialogue_detection.py, run_speaker_turn_detection.py): fine-tune BERT
for (a) sequence classification — is this text a dialogue? — and (b) token
classification — per-token speaker-turn boundaries — reporting accuracy /
precision / recall / F1. The reference uses the HF torch Trainer; here the
models are HF *Flax* BERT heads driven by a jit-compiled shard_map AdamW
step over the data mesh axis.

Zero-egress note: pretrained weights/tokenizers must be local
(``from_pretrained(local_dir)``); with none given, models initialize from a
config (the task machinery, metrics and CLIs are identical either way).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_model(task: str, *, num_labels: int = 2,
                pretrained_dir: Optional[str] = None, vocab_size: int = 21128,
                hidden_size: int = 768, num_hidden_layers: int = 12,
                num_attention_heads: int = 12, seed: int = 0):
    """task: 'sequence' (dialogue detection) or 'token' (turn detection)."""
    from transformers import (
        BertConfig,
        FlaxBertForSequenceClassification,
        FlaxBertForTokenClassification,
    )

    cls = (FlaxBertForSequenceClassification if task == "sequence"
           else FlaxBertForTokenClassification)
    if pretrained_dir:
        model = cls.from_pretrained(pretrained_dir, num_labels=num_labels)
    else:
        config = BertConfig(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            intermediate_size=hidden_size * 4, num_labels=num_labels)
        model = cls(config, seed=seed)
    return model


class SemanticTrainConfig(NamedTuple):
    lr: float = 2e-5
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    warmup_steps: int = 0
    total_steps: int = 10000


def make_semantic_train_step(model, cfg: SemanticTrainConfig, mesh: Mesh,
                             params_example, token_level: bool) -> Callable:
    """Batch: input_ids/attention_mask [B, L] (+ labels [B] or [B, L];
    token-level ignores label -100)."""
    specs = jax.tree_util.tree_map(lambda _: P(), params_example)
    state_specs = {"params": specs,
                   "mu": specs, "nu": specs, "step": P()}
    batch_specs = {"input_ids": P("data"), "attention_mask": P("data"),
                   "labels": P("data")}

    def shard_body(state, batch):
        step = state["step"]
        lin = jnp.minimum(1.0, (step + 1) / jnp.maximum(cfg.warmup_steps, 1))
        decay = jnp.maximum(
            0.0, 1.0 - step / jnp.maximum(cfg.total_steps, 1))
        lr = cfg.lr * lin * decay

        def loss_fn(params):
            ids = batch["input_ids"]
            att = batch["attention_mask"]
            token_type = jnp.zeros_like(ids)
            positions = jnp.broadcast_to(
                jnp.arange(ids.shape[-1])[None], ids.shape)
            logits = model.module.apply(
                {"params": params}, ids, att, token_type, positions,
                None, deterministic=True).logits
            labels = batch["labels"]
            if token_level:
                mask = (labels != -100) & (batch["attention_mask"] > 0)
                safe = jnp.where(mask, labels, 0)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
            else:
                logp = jax.nn.log_softmax(logits, axis=-1)
                loss = -jnp.mean(
                    jnp.take_along_axis(logp, labels[:, None], axis=1))
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = jax.lax.pmean(grads, "data")
        t = (step + 1).astype(jnp.float32)

        def adamw(p, g, mu, nu):
            mu = cfg.beta1 * mu + (1 - cfg.beta1) * g
            nu = cfg.beta2 * nu + (1 - cfg.beta2) * jnp.square(g)
            mu_hat = mu / (1 - jnp.power(cfg.beta1, t))
            nu_hat = nu / (1 - jnp.power(cfg.beta2, t))
            upd = mu_hat / (jnp.sqrt(nu_hat) + cfg.eps) + cfg.weight_decay * p
            return p - lr * upd, mu, nu

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        upd = [adamw(p, g, mu, nu) for p, g, mu, nu in zip(
            flat_p, jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(state["mu"]),
            jax.tree_util.tree_leaves(state["nu"]))]
        new_state = {
            "params": jax.tree_util.tree_unflatten(treedef,
                                                   [u[0] for u in upd]),
            "mu": jax.tree_util.tree_unflatten(treedef, [u[1] for u in upd]),
            "nu": jax.tree_util.tree_unflatten(treedef, [u[2] for u in upd]),
            "step": step + 1,
        }
        preds = jnp.argmax(logits, axis=-1)
        return new_state, {"loss": jax.lax.pmean(loss, "data"),
                           "lr": lr, "preds": preds}

    fn = jax.shard_map(
        shard_body, mesh=mesh, in_specs=(state_specs, batch_specs),
        out_specs=(state_specs, {"loss": P(), "lr": P(), "preds": P("data")}),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def init_semantic_state(model, mesh: Mesh):
    params = model.params
    state = {
        "params": params,
        "mu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    shardings = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()),
                                       state)
    return jax.device_put(state, shardings)


def classification_metrics(labels, preds, ignore: int = -100):
    """accuracy / precision / recall / F1 (reference: sklearn usage)."""
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds).reshape(-1)
    keep = labels != ignore
    labels, preds = labels[keep], preds[keep]
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
    )

    return {
        "accuracy": float(accuracy_score(labels, preds)),
        "precision": float(precision_score(labels, preds,
                                           average="macro", zero_division=0)),
        "recall": float(recall_score(labels, preds, average="macro",
                                     zero_division=0)),
        "f1": float(f1_score(labels, preds, average="macro",
                             zero_division=0)),
    }
