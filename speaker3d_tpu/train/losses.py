"""Margin softmax losses, plain and vocab-parallel.

Behavioral contract (reference: speakerlab/loss/margin_loss.py): AAM-softmax
(ArcMargin) with the reference's exact mmm fallback, AddMargin (CosFace), and
plain cross entropy. The margin is a *traced argument* (the MarginScheduler
is a pure function of step), so one compiled train step serves the whole
margin ramp.

TPU-first: ``sharded_arc_margin_loss`` computes the AAM cross entropy with
the classifier's class axis sharded over the ``model`` mesh axis
(vocab-parallel, Megatron-style): per-shard logits, global max / sum-exp /
target-logit via psum over the model axis. This is the tensor-parallel shard
point of speaker-ID training (class counts scale with corpus speakers, up to
100k+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def arc_margin_logits(cosine, labels, margin, scale=32.0, easy_margin=False):
    """Scaled AAM logits. (reference: loss/margin_loss.py:24-49)"""
    cos_m = jnp.cos(margin)
    sin_m = jnp.sin(margin)
    th = jnp.cos(jnp.pi - margin)
    mmm = 1.0 + jnp.cos(jnp.pi - margin)

    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > th, phi, cosine - mmm)
    one_hot = jax.nn.one_hot(labels, cosine.shape[-1], dtype=cosine.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * scale


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def arc_margin_loss(cosine, labels, margin, scale=32.0, easy_margin=False):
    """(reference: loss/margin_loss.py:9-49 ArcMarginLoss)"""
    return cross_entropy(arc_margin_logits(cosine, labels, margin, scale,
                                           easy_margin), labels)


def add_margin_loss(cosine, labels, margin, scale=32.0):
    """(reference: loss/margin_loss.py:52-80 AddMarginLoss)"""
    one_hot = jax.nn.one_hot(labels, cosine.shape[-1], dtype=cosine.dtype)
    logits = (one_hot * (cosine - margin) + (1.0 - one_hot) * cosine) * scale
    return cross_entropy(logits, labels)


def entropy_loss(logits, labels):
    """(reference: loss/margin_loss.py:83-98 EntropyLoss)"""
    logits = logits.reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    return cross_entropy(logits, labels)


def sharded_arc_margin_loss(local_cosine, labels, shard_offset, margin,
                            scale=32.0, easy_margin=False, axis_name="model"):
    """AAM cross entropy with classes sharded over ``axis_name``.

    local_cosine: [B, C_local] — this shard's slice of the cosine logits.
    labels: [B] global class ids (replicated across the model axis).
    shard_offset: scalar — first global class id owned by this shard.

    Returns per-example CE [B]; identical on every model-axis member.
    """
    c_local = local_cosine.shape[-1]
    local_label = labels - shard_offset
    owned = (local_label >= 0) & (local_label < c_local)
    safe_label = jnp.where(owned, local_label, 0)

    cos_m = jnp.cos(margin)
    sin_m = jnp.sin(margin)
    th = jnp.cos(jnp.pi - margin)
    mmm = 1.0 + jnp.cos(jnp.pi - margin)

    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(local_cosine), 0.0, 1.0))
    phi = local_cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(local_cosine > 0, phi, local_cosine)
    else:
        phi = jnp.where(local_cosine > th, phi, local_cosine - mmm)

    one_hot = (jax.nn.one_hot(safe_label, c_local, dtype=local_cosine.dtype)
               * owned[:, None])
    logits = (one_hot * phi + (1.0 - one_hot) * local_cosine) * scale

    # numerically stable CE with cross-shard reductions; the max shift is
    # mathematically inert (logsumexp invariance), so stop_gradient keeps AD
    # from routing spurious cotangents through pmax
    local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    global_max = jax.lax.pmax(local_max, axis_name)
    sumexp = jnp.sum(jnp.exp(logits - global_max[:, None]), axis=-1)
    global_sumexp = jax.lax.psum(sumexp, axis_name)
    target_logit_local = jnp.where(
        owned, jnp.take_along_axis(logits, safe_label[:, None], axis=1)[:, 0],
        0.0)
    target_logit = jax.lax.psum(target_logit_local, axis_name)
    return global_max + jnp.log(global_sumexp) - target_logit
