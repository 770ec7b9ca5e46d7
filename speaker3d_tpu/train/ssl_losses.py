"""Self-supervised losses: DINO, VICReg-style regularizer, SDPN, KoLeo.

Behavioral contracts:
  - dino_loss (reference: loss/dino_loss.py:12-69): teacher centering +
    temperature sharpening, cross-view CE skipping same-view pairs, center
    EMA with a cross-replica all-reduce.
  - reg_loss (reference: loss/dino_loss.py:72-113): VICReg std + covariance
    terms on cross-replica gathered crop-averaged outputs (the gather is
    differentiable — FullGatherLayer semantics == jax all_gather AD).
  - sdpn_loss (reference: loss/sdpn_loss.py): soft-nearest-neighbour
    classification against learnable prototypes, sharpened targets with
    distributed Sinkhorn-Knopp normalization (all-reduce per iteration),
    ME-MAX regularizer.
  - koleo_loss (reference: loss/keleo_loss.py): Kozachenko-Leonenko spread
    regularizer via nearest-neighbour log-distances.

All functions are pure; ``axis_name=None`` gives the single-replica path,
otherwise cross-replica reductions use psum/all_gather over the mesh axis
(inside shard_map).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _psum_or_id(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _axis_size(axis_name):
    return jax.lax.psum(1, axis_name) if axis_name is not None else 1


def dino_loss(student_output, teacher_output, center, *, ncrops: int,
              teacher_temp, student_temp: float = 0.1,
              center_momentum: float = 0.9,
              axis_name: Optional[str] = None):
    """Returns (loss, new_center).

    student_output: [ncrops*B, K]; teacher_output: [2*B, K]; center: [1, K].
    """
    student_out = (student_output / student_temp).reshape(
        ncrops, -1, student_output.shape[-1])
    teacher_out = jax.nn.softmax(
        (teacher_output - center) / teacher_temp, axis=-1)
    teacher_out = jax.lax.stop_gradient(
        teacher_out.reshape(2, -1, teacher_output.shape[-1]))

    total = 0.0
    n_terms = 0
    for iq in range(2):
        q = teacher_out[iq]
        for v in range(ncrops):
            if v == iq:
                continue
            ce = jnp.sum(-q * jax.nn.log_softmax(student_out[v], axis=-1),
                         axis=-1)
            total = total + jnp.mean(ce)
            n_terms += 1
    loss = total / n_terms

    # center EMA (all-reduced batch mean; reference: dino_loss.py:59-69)
    batch_sum = _psum_or_id(
        jnp.sum(jax.lax.stop_gradient(teacher_output), axis=0, keepdims=True),
        axis_name)
    denom = teacher_output.shape[0] * _axis_size(axis_name)
    batch_center = batch_sum / denom
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, new_center


def _off_diagonal_sumsq(x):
    n = x.shape[0]
    return jnp.sum(jnp.square(x)) - jnp.sum(jnp.square(jnp.diagonal(x)))


def reg_loss(tea_reg_out, stu_reg_out, *, std_coeff: float, cov_coeff: float,
             global_ncrops: int = 2, axis_name: Optional[str] = None):
    """VICReg-style std + covariance regularizer on crop-averaged outputs.
    (reference: loss/dino_loss.py:72-113)"""
    dim = tea_reg_out.shape[-1]
    x = jnp.mean(stu_reg_out.reshape(global_ncrops, -1, dim), axis=0)
    y = jnp.mean(tea_reg_out.reshape(global_ncrops, -1, dim), axis=0)
    if axis_name is not None:
        # differentiable cross-replica gather (FullGatherLayer semantics)
        x = jax.lax.all_gather(x, axis_name).reshape(-1, dim)
        y = jax.lax.all_gather(y, axis_name).reshape(-1, dim)
    batch = x.shape[0]
    x = x - jnp.mean(x, axis=0)
    y = y - jnp.mean(y, axis=0)

    std_x = jnp.sqrt(jnp.var(x, axis=0, ddof=1) + 1e-4)
    std_y = jnp.sqrt(jnp.var(y, axis=0, ddof=1) + 1e-4)
    std_loss = (jnp.mean(nn_relu(1 - std_x)) / 2
                + jnp.mean(nn_relu(1 - std_y)) / 2)

    cov_x = (x.T @ x) / (batch - 1)
    cov_y = (y.T @ y) / (batch - 1)
    cov_loss = (_off_diagonal_sumsq(cov_x) / dim
                + _off_diagonal_sumsq(cov_y) / dim)
    return std_coeff * std_loss + cov_coeff * cov_loss


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def sharpen(p, T):
    sharp = jnp.power(p, 1.0 / T)
    return sharp / jnp.sum(sharp, axis=1, keepdims=True)


def snn(query, supports, support_labels, tau: float = 0.1):
    """Soft nearest-neighbour classifier. (reference: loss/sdpn_loss.py:24-28)"""
    q = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
    s = supports / jnp.maximum(jnp.linalg.norm(supports, axis=-1, keepdims=True),
                               1e-12)
    return jax.nn.softmax(q @ s.T / tau, axis=1) @ support_labels


def distributed_sinkhorn(Q, num_itr: int = 3,
                         axis_name: Optional[str] = None):
    """(reference: loss/sdpn_loss.py:63-97). Q: [B_local, K] targets."""
    Q = Q.T  # [K, B_local]
    world = _axis_size(axis_name)
    B = Q.shape[1] * world
    K = Q.shape[0]

    Q = Q / _psum_or_id(jnp.sum(Q), axis_name)
    for _ in range(num_itr):
        rows = _psum_or_id(jnp.sum(Q, axis=1, keepdims=True), axis_name)
        Q = Q / rows / K
        Q = Q / jnp.sum(Q, axis=0, keepdims=True) / B
    return (Q * B).T


def sdpn_loss(anchor_views, target_views, prototypes, proto_labels, *,
              tau: float = 0.1, T: float = 0.25, num_views: int = 4,
              me_max: bool = True, use_sinkhorn: bool = True,
              axis_name: Optional[str] = None):
    """Returns (loss, rloss, targets). (reference: loss/sdpn_loss.py:31-60)"""
    probs = snn(anchor_views, prototypes, proto_labels, tau)
    targets = sharpen(snn(jax.lax.stop_gradient(target_views),
                          jax.lax.stop_gradient(prototypes),
                          proto_labels, tau), T)
    if use_sinkhorn:
        targets = distributed_sinkhorn(targets, axis_name=axis_name)
    targets = jax.lax.stop_gradient(
        jnp.concatenate([targets] * num_views, axis=0))

    loss = jnp.mean(jnp.sum(-targets * jnp.log(jnp.maximum(probs, 1e-12)),
                            axis=1))
    rloss = 0.0
    if me_max:
        avg = jnp.mean(probs, axis=0)
        if axis_name is not None:
            # The reference's AllReduce autograd fn (utils_rdino.py:21-36)
            # averages in the FORWARD but is IDENTITY in the backward; DDP's
            # grad-mean then makes the ME-MAX gradient exactly equal the
            # single-process global-batch gradient. A plain pmean here would
            # under-count that gradient by the axis size (its transpose
            # divides by N a second time), so: pmean forward, identity
            # backward. Pinned by test_sdpn_multi_device_matches_single_device.
            avg = avg + jax.lax.stop_gradient(
                jax.lax.pmean(avg, axis_name) - avg)
        rloss = (jnp.sum(avg * jnp.log(jnp.maximum(avg, 1e-12)))
                 + jnp.log(float(avg.shape[0])))
    return loss, rloss, targets


def koleo_loss(student_output, eps: float = 1e-8):
    """(reference: loss/keleo_loss.py:12-41)"""
    x = student_output / jnp.maximum(
        jnp.linalg.norm(student_output, axis=-1, keepdims=True), eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = dots - 2.0 * jnp.eye(n)  # exclude self (diag -> below -1)
    nn_idx = jnp.argmax(dots, axis=1)
    diffs = x - x[nn_idx]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(diffs), axis=-1), 0.0) + 1e-16)
    return -jnp.mean(jnp.log(dist + eps))
