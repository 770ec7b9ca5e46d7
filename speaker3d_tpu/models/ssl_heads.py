"""SSL projection heads and combiners (RDINO / SDPN).

Behavioral contract:
  - RDINOHead (reference: models/rdino/RDINO_Head.py): 3-layer GELU MLP ->
    add_dim (the VICReg-regularized output) -> bottleneck -> L2 norm ->
    weight-normed final linear (gain fixed at 1 when norm_last_layer).
  - SDPNHead (reference: models/sdpn/SDPN_Head.py): MLP -> L2-normalized
    bottleneck output.
  - Combiners (reference: models/{rdino,sdpn}/combiner.py): RDINO returns
    head outputs only; SDPN returns (backbone_emb, head_out).

Module/param names mirror the torch state_dicts (mlp.0 / mlp.2 / ...,
last_layer.weight_g / weight_v) for mechanical checkpoint conversion.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std)


def _mlp_forward(x, hidden_dim, out_dim, nlayers):
    """torch nn.Sequential-style MLP with GELU; names mlp.0, mlp.2, ...
    (called inside a parent @nn.compact — modules land in the parent scope)"""
    if nlayers == 1:
        return nn.Dense(out_dim, kernel_init=_trunc_normal(0.02), name="mlp")(x)
    idx = 0
    x = nn.Dense(hidden_dim, kernel_init=_trunc_normal(0.02),
                 name=f"mlp.{idx}")(x)
    idx += 2  # GELU occupies an index in the torch Sequential
    x = nn.gelu(x, approximate=False)
    for _ in range(nlayers - 2):
        x = nn.Dense(hidden_dim, kernel_init=_trunc_normal(0.02),
                     name=f"mlp.{idx}")(x)
        idx += 2
        x = nn.gelu(x, approximate=False)
    return nn.Dense(out_dim, kernel_init=_trunc_normal(0.02),
                    name=f"mlp.{idx}")(x)


class WeightNormedLinear(nn.Module):
    """nn.utils.weight_norm(Linear(in, out, bias=False)): W = g * v/||v||_row.
    (reference: models/rdino/RDINO_Head.py last_layer)"""

    out_dim: int
    trainable_gain: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("weight_v", _trunc_normal(0.02), (self.out_dim, in_dim))
        g = self.param("weight_g", nn.initializers.ones, (self.out_dim, 1))
        if not self.trainable_gain:
            import jax

            g = jax.lax.stop_gradient(g)  # gain frozen at its value (=1)
        w = g * v / jnp.maximum(
            jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        return x @ w.T


class RDINOHead(nn.Module):
    """(reference: models/rdino/RDINO_Head.py:10-52). Returns (reg_out, out)."""

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    add_dim: int = 8192
    nlayers: int = 3
    norm_last_layer: bool = True

    @nn.compact
    def __call__(self, x):
        reg_out = _mlp_forward(x, self.hidden_dim, self.add_dim, self.nlayers)
        x = nn.Dense(self.bottleneck_dim, kernel_init=_trunc_normal(0.02),
                     name="add_layer")(reg_out)
        x = _l2norm(x)
        x = WeightNormedLinear(self.out_dim,
                               trainable_gain=not self.norm_last_layer,
                               name="last_layer")(x)
        return reg_out, x


class SDPNHead(nn.Module):
    """(reference: models/sdpn/SDPN_Head.py:10-39). L2-normalized output."""

    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3

    @nn.compact
    def __call__(self, x):
        return _l2norm(_mlp_forward(x, self.hidden_dim, self.bottleneck_dim,
                                    self.nlayers))


class RDINOCombiner(nn.Module):
    """backbone -> head; returns head outputs (reg_out, dino_out).
    (reference: models/rdino/combiner.py)"""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = self.backbone(x, train=train)
        return self.head(emb)


class SDPNCombiner(nn.Module):
    """backbone -> head; returns (backbone_emb, head_out).
    (reference: models/sdpn/combiner.py)"""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = self.backbone(x, train=train)
        return emb, self.head(emb)
