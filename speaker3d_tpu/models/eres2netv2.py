"""ERes2NetV2 speaker-embedding backbone, TPU-native (Flax/NHWC).

Behavioral contract (reference: speakerlab/models/eres2net/ERes2NetV2.py,
speakerlab/models/eres2net/fusion.py): a 2D ResNet-style trunk over the
fbank "image" with Res2Net split-cascade blocks, AFF attentional fusion in
stages 3-4 plus a single bottom-up layer3->layer4 fusion, TSTP pooling and a
linear projection to the embedding.

TPU-first notes
---------------
- Layout is NHWC ([B, F, T, C]); all convs use explicit padding so output
  sizes and window placement match the reference exactly (torch drops
  rightmost samples on strided convs; XLA explicit-padding VALID does too).
- The Res2Net split cascade is a serial chain of `scale` small 3x3 convs; the
  splits are kept channels-last so each conv is an MXU-shaped contraction and
  XLA fuses the adds/BN/clip into the conv epilogues.
- ReLU here is the reference's Hardtanh(0, 20) clip.
- Module names mirror the reference state_dict keys so the generic
  torch->flax converter (speaker3d_tpu/compat) is purely mechanical.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp

from speaker3d_tpu.models.pooling import POOLING_FUNCS


def relu20(x):
    """The reference's ReLU: Hardtanh(0, 20)."""
    return jnp.clip(x, 0.0, 20.0)


class AFF(nn.Module):
    """Attentional feature fusion: gate = 1 + tanh(MLP(x ‖ y));
    out = x*gate + y*(2-gate). (reference: models/eres2net/fusion.py:8-28)"""

    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        inter = self.channels // self.r
        h = jnp.concatenate([x, ds_y], axis=-1)
        h = nn.Conv(inter, (1, 1), name="local_att.0")(h)
        h = batch_norm(train, name="local_att.1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (1, 1), name="local_att.3")(h)
        h = batch_norm(train, name="local_att.4")(h)
        att = 1.0 + jnp.tanh(h)
        return x * att + ds_y * (2.0 - att)


class BasicBlockERes2NetV2(nn.Module):
    """Res2Net bottleneck block; optional AFF fusion between splits.

    (reference: models/eres2net/ERes2NetV2.py:31-159)
    """

    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 2
    expansion: int = 2
    use_aff: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        norm = lambda name: batch_norm(train, name=name)

        out = nn.Conv(width * self.scale, (1, 1), strides=(self.stride, self.stride),
                      use_bias=False, name="conv1")(x)
        out = relu20(norm("bn1")(out))

        splits = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        pieces = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = splits[0]
            elif self.use_aff:
                sp = AFF(channels=width, name=f"fuse_models.{i-1}")(sp, splits[i], train)
            else:
                sp = sp + splits[i]
            sp = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                         name=f"convs.{i}")(sp)
            sp = relu20(norm(f"bns.{i}")(sp))
            pieces.append(sp)
        out = jnp.concatenate(pieces, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = norm("bn3")(out)

        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            residual = nn.Conv(self.expansion * self.planes, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               name="shortcut.0")(x)
            residual = norm("shortcut.1")(residual)
        else:
            residual = x
        return relu20(out + residual)


class ERes2NetV2(nn.Module):
    """(reference: models/eres2net/ERes2NetV2.py:161-254)

    Input: log-mel features [B, T, feat_dim]. Output: [B, embedding_size].
    Default config = 17.8M params; w24s4ep4 variant uses base_width=24,
    scale=4, expansion=4 (reference: bin/infer_sv.py:77-86).
    """

    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 64
    feat_dim: int = 80
    embedding_size: int = 192
    base_width: int = 26
    scale: int = 2
    expansion: int = 2
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False
    # Per-block activation rematerialization for training: backward
    # recomputes one block at a time, so peak HBM holds only the block
    # boundaries instead of every interior activation. A single
    # jax.checkpoint around the whole backbone does NOT reduce peak (the
    # rematted forward is entirely live during the backward; measured in
    # docs/BENCH.md). nn.remat on the block class keeps parameter paths
    # identical, so checkpoints are interchangeable with remat=False.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B, T, F] -> NHWC image [B, F, T, 1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        out = nn.Conv(self.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(batch_norm(train, name="bn1")(out))

        in_planes = self.m_channels

        block_cls = (nn.remat(BasicBlockERes2NetV2, static_argnums=(2,))
                     if self.remat else BasicBlockERes2NetV2)

        def stage(out, idx, planes, blocks, stride, use_aff):
            nonlocal in_planes
            strides = [stride] + [1] * (blocks - 1)
            for bi, s in enumerate(strides):
                out = block_cls(
                    in_planes=in_planes, planes=planes, stride=s,
                    base_width=self.base_width, scale=self.scale,
                    expansion=self.expansion, use_aff=use_aff,
                    name=f"layer{idx}.{bi}")(out, train)
                in_planes = planes * self.expansion
            return out

        out1 = stage(out, 1, self.m_channels, self.num_blocks[0], 1, False)
        out2 = stage(out1, 2, self.m_channels * 2, self.num_blocks[1], 2, False)
        out3 = stage(out2, 3, self.m_channels * 4, self.num_blocks[2], 2, True)
        out4 = stage(out3, 4, self.m_channels * 8, self.num_blocks[3], 2, True)

        out3_ds = nn.Conv(self.m_channels * 8 * self.expansion, (3, 3),
                          strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                          name="layer3_ds")(out3)
        fuse34 = AFF(channels=self.m_channels * 8 * self.expansion,
                     name="fuse34")(out4, out3_ds, train)

        stats = POOLING_FUNCS[self.pooling_func](fuse34)
        embed_a = nn.Dense(self.embedding_size, name="seg_1")(stats)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = batch_norm(train, use_bias=False,
                               use_scale=False, name="seg_bn_1")(out)
            return nn.Dense(self.embedding_size, name="seg_2")(out)
        return embed_a


def eres2netv2_w24s4ep4(**kw) -> ERes2NetV2:
    """The fork's flagship diarization embedder (53.5M params).
    (reference: bin/infer_diarization.py:69-103 — iic/speech_eres2netv2w24s4ep4)"""
    return ERes2NetV2(base_width=24, scale=4, expansion=4, **kw)
