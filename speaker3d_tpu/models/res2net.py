"""Res2Net speaker-embedding backbone, TPU-native (Flax/NHWC).

Behavioral contract (reference: speakerlab/models/res2net/Res2Net.py — a
wespeaker port): plain Res2Net trunk (no AFF fusion); within a block only the
first ``scale-1`` splits are convolved, the last split passes through
unconvolved and is concatenated at the end (Res2Net.py:76).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp

from speaker3d_tpu.models.eres2netv2 import relu20
from speaker3d_tpu.models.pooling import POOLING_FUNCS


class BasicBlockRes2Net(nn.Module):
    """(reference: models/res2net/Res2Net.py:28-85)"""

    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        norm = lambda name: batch_norm(train, name=name)
        nums = self.scale - 1

        out = nn.Conv(width * self.scale, (1, 1),
                      strides=(self.stride, self.stride), use_bias=False,
                      name="conv1")(x)
        out = relu20(norm("bn1")(out))
        splits = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        pieces = []
        sp = None
        for i in range(nums):
            sp = splits[i] if i == 0 else sp + splits[i]
            sp = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                         name=f"convs.{i}")(sp)
            sp = relu20(norm(f"bns.{i}")(sp))
            pieces.append(sp)
        pieces.append(splits[nums])  # last split unconvolved
        out = jnp.concatenate(pieces, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = norm("bn3")(out)

        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            residual = nn.Conv(self.expansion * self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut.0")(x)
            residual = norm("shortcut.1")(residual)
        else:
            residual = x
        return relu20(out + residual)


class Res2Net(nn.Module):
    """(reference: models/res2net/Res2Net.py:87-149). 4.03M params default."""

    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 32
    feat_dim: int = 80
    embedding_size: int = 192
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        out = nn.Conv(self.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(batch_norm(train, name="bn1")(out))

        in_planes = self.m_channels
        for idx, (planes_mult, blocks, stride) in enumerate(
                zip((1, 2, 4, 8), self.num_blocks, (1, 2, 2, 2)), start=1):
            planes = self.m_channels * planes_mult
            strides = [stride] + [1] * (blocks - 1)
            for bi, s in enumerate(strides):
                out = BasicBlockRes2Net(
                    in_planes=in_planes, planes=planes, stride=s,
                    base_width=self.base_width, scale=self.scale,
                    expansion=self.expansion, name=f"layer{idx}.{bi}")(out, train)
                in_planes = planes * self.expansion

        stats = POOLING_FUNCS[self.pooling_func](out)
        embed_a = nn.Dense(self.embedding_size, name="seg_1")(stats)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = batch_norm(train, use_bias=False,
                               use_scale=False, name="seg_bn_1")(out)
            return nn.Dense(self.embedding_size, name="seg_2")(out)
        return embed_a
