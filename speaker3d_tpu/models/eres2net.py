"""ERes2Net (base / large / huge) speaker-embedding backbone, TPU-native.

Behavioral contract (reference: speakerlab/models/eres2net/ERes2Net.py,
ERes2Net_huge.py): like ERes2NetV2 but with cascading bottom-up global
feature fusion after *every* stage:

    fuse12   = AFF(out2, ds(out1));
    fuse123  = AFF(out3, ds(fuse12));
    fuse1234 = AFF(out4, ds(fuse123));  -> pool

Block math is identical to ERes2NetV2's BasicBlock (reused here); variants
differ only in (m_channels, base_width, scale, expansion):
  base:  m=32, bw=32, s=2, exp=2  (6.61M)
  large: m=64, bw=32, s=2, exp=2  (22.46M)
  huge:  m=64, bw=24, s=3, exp=4  (~55M; reference: ERes2Net_huge.py:31-34)

Same NHWC/explicit-padding TPU conventions as eres2netv2.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp

from speaker3d_tpu.models.eres2netv2 import AFF, BasicBlockERes2NetV2
from speaker3d_tpu.models.pooling import POOLING_FUNCS


class ERes2Net(nn.Module):
    """(reference: models/eres2net/ERes2Net.py:154-231)"""

    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 32
    feat_dim: int = 80
    embedding_size: int = 192
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False
    # per-block activation rematerialization (see eres2netv2.py: a whole-
    # backbone jax.checkpoint does not reduce peak HBM; per-block does)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        m, exp = self.m_channels, self.expansion
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        out = nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      name="conv1")(x)
        out = nn.relu(batch_norm(train, name="bn1")(out))

        in_planes = m
        block_cls = (nn.remat(BasicBlockERes2NetV2, static_argnums=(2,))
                     if self.remat else BasicBlockERes2NetV2)

        def stage(out, idx, planes, blocks, stride, use_aff):
            nonlocal in_planes
            strides = [stride] + [1] * (blocks - 1)
            for bi, s in enumerate(strides):
                out = block_cls(
                    in_planes=in_planes, planes=planes, stride=s,
                    base_width=self.base_width, scale=self.scale,
                    expansion=exp, use_aff=use_aff,
                    name=f"layer{idx}.{bi}")(out, train)
                in_planes = planes * exp
            return out

        def ds(name, channels):
            return nn.Conv(channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), use_bias=False, name=name)

        out1 = stage(out, 1, m, self.num_blocks[0], 1, False)
        out2 = stage(out1, 2, m * 2, self.num_blocks[1], 2, False)
        out1_ds = ds("layer1_downsample", m * 2 * exp)(out1)
        fuse12 = AFF(channels=m * 2 * exp, name="fuse_mode12")(out2, out1_ds, train)
        out3 = stage(out2, 3, m * 4, self.num_blocks[2], 2, True)
        fuse12_ds = ds("layer2_downsample", m * 4 * exp)(fuse12)
        fuse123 = AFF(channels=m * 4 * exp, name="fuse_mode123")(out3, fuse12_ds, train)
        out4 = stage(out3, 4, m * 8, self.num_blocks[3], 2, True)
        fuse123_ds = ds("layer3_downsample", m * 8 * exp)(fuse123)
        fuse1234 = AFF(channels=m * 8 * exp, name="fuse_mode1234")(out4, fuse123_ds,
                                                                   train)

        stats = POOLING_FUNCS[self.pooling_func](fuse1234)
        embed_a = nn.Dense(self.embedding_size, name="seg_1")(stats)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = batch_norm(train, use_bias=False,
                               use_scale=False, name="seg_bn_1")(out)
            return nn.Dense(self.embedding_size, name="seg_2")(out)
        return embed_a


def eres2net_base(**kw) -> ERes2Net:
    return ERes2Net(m_channels=32, base_width=32, scale=2, expansion=2, **kw)


def eres2net_large(**kw) -> ERes2Net:
    return ERes2Net(m_channels=64, base_width=32, scale=2, expansion=2, **kw)


def eres2net_huge(**kw) -> ERes2Net:
    """(reference: models/eres2net/ERes2Net_huge.py — exp 4, bw 24, scale 3)"""
    return ERes2Net(m_channels=64, base_width=24, scale=3, expansion=4, **kw)
