"""ResNet34 speaker-embedding backbone, TPU-native (Flax/NHWC).

Behavioral contract (reference: speakerlab/models/resnet/ResNet.py — a
wespeaker port): plain BasicBlock ResNet over the fbank image + temporal
stats pooling, optional two-layer embedding head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp

from speaker3d_tpu.models.pooling import POOLING_FUNCS


class BasicBlock(nn.Module):
    """(reference: models/resnet/ResNet.py:15-36)"""

    in_planes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(train, name=name)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = norm("bn2")(out)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, name="shortcut.0")(x)
            sc = norm("shortcut.1")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """(reference: models/resnet/ResNet.py:39-99). ResNet34 = (3,4,6,3)."""

    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 32
    feat_dim: int = 40
    embedding_size: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        out = nn.Conv(self.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(batch_norm(train, name="bn1")(out))

        in_planes = self.m_channels
        for idx, (mult, blocks, stride) in enumerate(
                zip((1, 2, 4, 8), self.num_blocks, (1, 2, 2, 2)), start=1):
            planes = self.m_channels * mult
            strides = [stride] + [1] * (blocks - 1)
            for bi, s in enumerate(strides):
                out = BasicBlock(in_planes=in_planes, planes=planes, stride=s,
                                 name=f"layer{idx}.{bi}")(out, train)
                in_planes = planes

        stats = POOLING_FUNCS[self.pooling_func](out)
        embed_a = nn.Dense(self.embedding_size, name="seg_1")(stats)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = batch_norm(train, use_bias=False,
                               use_scale=False, name="seg_bn_1")(out)
            return nn.Dense(self.embedding_size, name="seg_2")(out)
        return embed_a
