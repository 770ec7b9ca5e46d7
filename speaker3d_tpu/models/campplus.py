"""CAM++ (CAMPPlus) speaker-embedding backbone, TPU-native (Flax).

Behavioral contract (reference: speakerlab/models/campplus/DTDNN.py,
speakerlab/models/campplus/layers.py): a 2D-conv FCM head (freq /8) feeding a
densely-connected D-TDNN with context-aware masking (CAM) on every dense
layer, stats pooling, and a dense embedding layer with a final affine-free
BatchNorm.

TPU-first notes
---------------
- 1D trunk runs channels-last [B, T, C]: every TDNN conv is an MXU
  contraction over (k, C_in); the dense concatenation grows the channel
  (lane) dimension, which XLA handles as pure layout.
- The CAM "segment pooling" (100-frame average, ceil-mode) is a reshape
  sum + broadcast — no pooling primitive, no dynamic shapes.
- Module names mirror the reference state_dict keys for the mechanical
  torch->flax converter.
"""

from __future__ import annotations

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp


def _bn(train: bool, name: str, affine: bool = True):
    return batch_norm(train, use_bias=affine,
                        use_scale=affine, name=name)


class NonLinear(nn.Module):
    """'batchnorm-relu'-style config string applied in order.
    (reference: models/campplus/layers.py:10-24)"""

    config_str: str = "batchnorm-relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for part in self.config_str.split("-"):
            if part == "relu":
                x = nn.relu(x)
            elif part == "batchnorm":
                x = _bn(train, "batchnorm")(x)
            elif part == "batchnorm_":
                x = _bn(train, "batchnorm", affine=False)(x)
            else:
                raise ValueError(f"unexpected nonlinear part {part!r}")
        return x


class BasicResBlock(nn.Module):
    """2D residual block with freq-only stride. x: [B, F, T, C].
    (reference: models/campplus/layers.py:218-253)"""

    in_planes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                         use_bias=False, name="shortcut.0")(x)
            sc = _bn(train, "shortcut.1")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class FCM(nn.Module):
    """2D front-end convolution module: freq /8, reshape C*F' into channels.
    (reference: models/campplus/DTDNN.py:13-48)"""

    num_blocks: tuple = (2, 2)
    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, F] -> NHWC [B, F, T, 1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        out = nn.Conv(self.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        in_planes = self.m_channels
        for li, blocks in enumerate(self.num_blocks, start=1):
            strides = [2] + [1] * (blocks - 1)
            for bi, s in enumerate(strides):
                out = BasicResBlock(in_planes, self.m_channels, s,
                                    name=f"layer{li}.{bi}")(out, train)
                in_planes = self.m_channels
        out = nn.Conv(self.m_channels, (3, 3), strides=(2, 1),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        out = nn.relu(_bn(train, "bn2")(out))
        # [B, F', T, C] -> [B, T, C*F'] in the reference's (C, F') order
        b, f, t, c = out.shape
        return jnp.transpose(out, (0, 2, 3, 1)).reshape(b, t, c * f)


def seg_avg_pool_expand(x, seg_len: int = 100):
    """Ceil-mode 100-frame average pooling, expanded back to T frames.
    (reference: models/campplus/layers.py:100-110)"""
    b, t, c = x.shape
    nseg = -(-t // seg_len)
    pad = nseg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, nseg, seg_len, c).sum(axis=2)
    counts = jnp.minimum(
        jnp.arange(1, nseg + 1) * seg_len, t) - jnp.arange(nseg) * seg_len
    seg_mean = sums / counts[None, :, None]
    rep = jnp.repeat(seg_mean, seg_len, axis=1)
    return rep[:, :t]


class CAMLayer(nn.Module):
    """Context-aware mask: sigmoid(MLP(global-mean + segment-mean)) gates a
    local conv. (reference: models/campplus/layers.py:70-110)"""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int = 1
    reduction: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=((pad, pad),),
                    use_bias=False, name="linear_local")(x)
        context = jnp.mean(x, axis=1, keepdims=True) + seg_avg_pool_expand(x)
        context = nn.relu(
            nn.Conv(self.bn_channels // self.reduction, (1,), name="linear1")(context))
        m = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="linear2")(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    """(reference: models/campplus/layers.py:113-149)"""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int = 1
    config_str: str = "batchnorm-relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = NonLinear(self.config_str, name="nonlinear1")(x, train)
        x = nn.Conv(self.bn_channels, (1,), use_bias=False, name="linear1")(x)
        x = NonLinear(self.config_str, name="nonlinear2")(x, train)
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.dilation, name="cam_layer")(x, train)


class TDNNLayer(nn.Module):
    """conv -> nonlinear. (reference: models/campplus/layers.py:40-67)"""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    config_str: str = "batchnorm-relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,), kernel_dilation=(self.dilation,),
                    padding=((pad, pad),), use_bias=False, name="linear")(x)
        return NonLinear(self.config_str, name="nonlinear")(x, train)


class CAMPPlus(nn.Module):
    """(reference: models/campplus/DTDNN.py:50-115)

    Input: log-mel features [B, T, feat_dim]. Output: [B, embedding_size].
    7.2M params at the default config.
    """

    feat_dim: int = 80
    embedding_size: int = 512
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    config_str: str = "batchnorm-relu"
    # The reference's memory_efficient flag (DTDNN.py:50, torch checkpointing
    # at layers.py:144-145): rematerialize each dense layer in the backward
    # pass instead of storing its interior activations. nn.remat keeps
    # parameter paths identical, so checkpoints are interchangeable.
    memory_efficient: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense_cls = (nn.remat(CAMDenseTDNNLayer, static_argnums=(2,))
                     if self.memory_efficient else CAMDenseTDNNLayer)
        x = FCM(feat_dim=self.feat_dim, name="head")(x, train)
        x = TDNNLayer(self.init_channels, 5, stride=2,
                      config_str=self.config_str, name="xvector.tdnn")(x, train)
        channels = self.init_channels
        for i, (num_layers, kernel_size, dilation) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2)), start=1):
            for j in range(1, num_layers + 1):
                y = dense_cls(
                    bn_channels=self.bn_size * self.growth_rate,
                    out_channels=self.growth_rate,
                    kernel_size=kernel_size, dilation=dilation,
                    config_str=self.config_str,
                    name=f"xvector.block{i}.tdnnd{j}")(x, train)
                x = jnp.concatenate([x, y], axis=-1)
            channels += num_layers * self.growth_rate
            # TransitLayer: nonlinear then 1x1 conv, channels // 2
            x = NonLinear(self.config_str,
                          name=f"xvector.transit{i}.nonlinear")(x, train)
            x = nn.Conv(channels // 2, (1,), use_bias=False,
                        name=f"xvector.transit{i}.linear")(x)
            channels //= 2
        x = NonLinear(self.config_str, name="xvector.out_nonlinear")(x, train)

        # StatsPool: mean ‖ unbiased std over time (layers.py:26-37)
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.var(x, axis=1, ddof=1))
        stats = jnp.concatenate([mean, std], axis=-1)

        # DenseLayer with affine-free batchnorm (DTDNN.py:101-103)
        emb = nn.Dense(self.embedding_size, use_bias=False,
                       name="xvector.dense.linear")(stats)
        emb = NonLinear("batchnorm_", name="xvector.dense.nonlinear")(emb, train)
        return emb
