"""x-vector (TDNN) speaker-embedding backbone, TPU-native (Flax).

Behavioral contract (reference: speakerlab/models/xvector/TDNN.py — a
wespeaker port): 5 VALID-padding TDNN layers (conv -> relu -> affine-free BN
for Kaldi parity) + stats pooling + linear embedding.
"""

from __future__ import annotations

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm

from speaker3d_tpu.models.pooling import POOLING_FUNCS


class TdnnLayer(nn.Module):
    """conv(valid) -> relu -> BN(affine=False).
    (reference: models/xvector/TDNN.py:13-44)"""

    out_dim: int
    context_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_dim, (self.context_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv_1d")(x)
        x = nn.relu(x)
        return batch_norm(train, use_bias=False,
                            use_scale=False, name="bn")(x)


class Xvector(nn.Module):
    """(reference: models/xvector/TDNN.py:47-86). 4.34M params default."""

    feat_dim: int = 40
    hid_dim: int = 512
    stats_dim: int = 1500
    embed_dim: int = 512
    pooling_func: str = "TSTP"

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TdnnLayer(self.hid_dim, 5, 1, name="frame_1")(x, train)
        out = TdnnLayer(self.hid_dim, 3, 2, name="frame_2")(out, train)
        out = TdnnLayer(self.hid_dim, 3, 3, name="frame_3")(out, train)
        out = TdnnLayer(self.hid_dim, 1, 1, name="frame_4")(out, train)
        out = TdnnLayer(self.stats_dim, 1, 1, name="frame_5")(out, train)
        stats = POOLING_FUNCS[self.pooling_func](out)
        return nn.Dense(self.embed_dim, name="seg_1")(stats)
