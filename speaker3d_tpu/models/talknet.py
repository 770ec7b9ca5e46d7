"""TalkNet audio-visual active speaker detection model, TPU-native (Flax).

Behavioral contract (reference: speakerlab/models/talknet/ — TalkNet-ASD):
  - audio encoder: SE-ResNet34-style 2D CNN over MFCC [B, 4T, 13] with
    freq-mean pooling -> [B, T, 128] (audioEncoder.py; note conv->relu->bn
    ordering inside SEBasicBlock).
  - visual frontend: 3D conv (over the flattened batch*time depth axis,
    faithfully reproducing the reference's view/transpose quirks) +
    lip-reading ResNet18 -> 512-d per frame, then a depthwise-separable TCN
    (5x DSConv1d with PReLU + global layer norm) and a Conv1D head -> 128-d
    (visualEncoder.py).
  - cross attention A<->V (queries from the OTHER modality, reference
    attentionLayer.py: attn(q=tar, k=src, v=src)), then self attention on
    the 256-d concat; three FC heads (AV / A / V), each 2-way
    (talknet.py:16-70).

Dropout layers are inference-disabled (train-mode dropout can be added via
rngs when the ASD trainer runs); module names mirror the torch state_dict.
"""

from __future__ import annotations

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- attention
class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention with torch parameter layout
    (in_proj_weight [3d, d], out_proj)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, query, key, value):
        d = self.d_model
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = query @ in_w[:d].T + in_b[:d]
        k = key @ in_w[d:2 * d].T + in_b[d:2 * d]
        v = value @ in_w[2 * d:].T + in_b[2 * d:]

        b, tq, _ = q.shape
        tk = k.shape[1]
        h = self.nhead
        dh = d // h
        q = q.reshape(b, tq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        out_w = self.param("out_proj.weight", nn.initializers.xavier_uniform(),
                           (d, d))
        out_b = self.param("out_proj.bias", nn.initializers.zeros, (d,))
        return out @ out_w.T + out_b


class AttentionLayer(nn.Module):
    """(reference: models/talknet/attentionLayer.py). Note: q comes from
    ``tar``, k/v from ``src``, and the residual updates ``src``."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, src, tar):
        src2 = TorchMHA(self.d_model, self.nhead, name="self_attn")(tar, src, src)
        src = src + src2
        src = nn.LayerNorm(name="norm1")(src)
        src2 = nn.Dense(self.d_model * 4, name="linear1")(src)
        src2 = nn.Dense(self.d_model, name="linear2")(nn.relu(src2))
        src = src + src2
        return nn.LayerNorm(name="norm2")(src)


# ------------------------------------------------------------ audio encoder
class SEBasicBlock(nn.Module):
    """(reference: models/talknet/audioEncoder.py:5-34 — conv->relu->bn1!)"""

    planes: int
    stride: tuple = (1, 1)
    has_downsample: bool = False
    reduction: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(train, name=name)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        out = norm("bn1")(nn.relu(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = norm("bn2")(out)
        # SE gate over global average
        s = jnp.mean(out, axis=(1, 2))
        s = nn.relu(nn.Dense(self.planes // self.reduction, name="se.fc.0")(s))
        s = nn.sigmoid(nn.Dense(self.planes, name="se.fc.2")(s))
        out = out * s[:, None, None, :]
        if self.has_downsample:
            res = nn.Conv(self.planes, (1, 1), strides=self.stride,
                          use_bias=False, name="downsample.0")(x)
            res = norm("downsample.1")(res)
        else:
            res = x
        return nn.relu(out + res)


class AudioEncoder(nn.Module):
    """(reference: models/talknet/audioEncoder.py:54-108).
    Input MFCC [B, 4T, n_mfcc(13)] -> [B, T, 128]."""

    layers: tuple = (3, 4, 6, 3)
    num_filters: tuple = (16, 32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B, Ta, F] -> image [B, F, Ta, 1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = nn.Conv(self.num_filters[0], (7, 7), strides=(2, 1),
                    padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        x = nn.relu(batch_norm(train, name="bn1")(x))

        inplanes = self.num_filters[0]
        strides = [(1, 1), (2, 2), (2, 2), (1, 1)]
        for li, (blocks, planes, st) in enumerate(
                zip(self.layers, self.num_filters, strides), start=1):
            for bi in range(blocks):
                s = st if bi == 0 else (1, 1)
                ds = bi == 0 and (s != (1, 1) or inplanes != planes)
                x = SEBasicBlock(planes, s, has_downsample=ds,
                                 name=f"layer{li}.{bi}")(x, train)
                inplanes = planes
        x = jnp.mean(x, axis=1)  # freq-mean -> [B, T', C]
        return x


# ----------------------------------------------------------- visual encoder
class ResNetLayer(nn.Module):
    """(reference: models/talknet/visualEncoder.py:11-49)"""

    outplanes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(train,
                                         momentum=0.99, epsilon=0.001,
                                         name=name)
        b = nn.Conv(self.outplanes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1a")(x)
        b = nn.relu(norm("bn1a")(b))
        b = nn.Conv(self.outplanes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2a")(b)
        res = x if self.stride == 1 else nn.Conv(
            self.outplanes, (1, 1), strides=(self.stride, self.stride),
            use_bias=False, name="downsample")(x)
        b = b + res
        inter = b
        b = nn.relu(norm("outbna")(b))
        b2 = nn.Conv(self.outplanes, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, name="conv1b")(b)
        b2 = nn.relu(norm("bn1b")(b2))
        b2 = nn.Conv(self.outplanes, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, name="conv2b")(b2)
        out = nn.relu(norm("outbnb")(b2 + inter))
        return out


class VisualFrontend(nn.Module):
    """3D conv + lip ResNet18 -> 512-d per frame.
    (reference: models/talknet/visualEncoder.py:96-126)"""

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, H, W] normalized frames
        bsz, t, h, w = x.shape
        # reference flattens batch*time into the 3D-conv depth axis
        v = x.reshape(1, bsz * t, h, w, 1)
        v = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    name="frontend3D.0")(v)
        v = batch_norm(train, momentum=0.99,
                         epsilon=0.001, name="frontend3D.1")(v)
        v = nn.relu(v)
        v = nn.max_pool(v, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        v = v.reshape(bsz * t, v.shape[2], v.shape[3], 64)
        v = ResNetLayer(64, 1, name="resnet.layer1")(v, train)
        v = ResNetLayer(128, 2, name="resnet.layer2")(v, train)
        v = ResNetLayer(256, 2, name="resnet.layer3")(v, train)
        v = ResNetLayer(512, 2, name="resnet.layer4")(v, train)
        v = nn.avg_pool(v, (4, 4), strides=(1, 1))
        return v.reshape(bsz, t, 512)


class GlobalLayerNorm(nn.Module):
    """(reference: visualEncoder.py:79-94). x: [B, T, C]."""

    channels: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (1, self.channels, 1))
        beta = self.param("beta", nn.initializers.zeros, (1, self.channels, 1))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        g = jnp.transpose(gamma, (0, 2, 1))  # -> [1, 1, C]
        b = jnp.transpose(beta, (0, 2, 1))
        return g * (x - mean) / jnp.sqrt(var + 1e-8) + b


class DSConv1d(nn.Module):
    """Depthwise-separable temporal conv block. (reference: visualEncoder.py:128-142)"""

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(x)
        out = batch_norm(train, name="net.1")(out)
        out = nn.Conv(512, (3,), padding=((1, 1),), feature_group_count=512,
                      use_bias=False, name="net.2")(out)
        alpha = self.param("net.3.weight",
                           nn.initializers.constant(0.25), (1,))
        out = jnp.where(out >= 0, out, alpha * out)  # PReLU
        out = GlobalLayerNorm(512, name="net.4")(out)
        out = nn.Conv(512, (1,), use_bias=False, name="net.5")(out)
        return out + x


class TalkNetModel(nn.Module):
    """(reference: models/talknet/talknet.py:8-70)

    forward(audio_mfcc [B, 4T, 13], faces [B, T, H, W]) ->
    (scores_av [B, T, 2], scores_a [B, T, 2], scores_v [B, T, 2]).
    """

    @nn.compact
    def __call__(self, audio, visual, train: bool = False):
        a = AudioEncoder(name="audioEncoder")(audio, train)

        v = (visual / 255.0 - 0.4161) / 0.1688
        v = VisualFrontend(name="visualFrontend")(v, train)
        for i in range(5):
            v = DSConv1d(name=f"visualTCN.net.{i}")(v, train)
        v = nn.Conv(256, (5,), padding=((2, 2),), name="visualConv1D.net.0")(v)
        v = batch_norm(train,
                         name="visualConv1D.net.1")(v)
        v = nn.relu(v)
        v = nn.Conv(128, (1,), name="visualConv1D.net.3")(v)

        a_c = AttentionLayer(128, 8, name="crossA2V")(a, v)
        v_c = AttentionLayer(128, 8, name="crossV2A")(v, a)
        av = jnp.concatenate([a_c, v_c], axis=2)
        av = AttentionLayer(256, 8, name="selfAV")(av, av)

        return (nn.Dense(2, name="fcAV")(av),
                nn.Dense(2, name="fcA")(a_c),
                nn.Dense(2, name="fcV")(v_c))
