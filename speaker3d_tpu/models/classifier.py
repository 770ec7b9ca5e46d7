"""Classification heads consumed by margin losses.

Behavioral contract (reference: speakerlab/models/campplus/classifier.py):
CosineClassifier produces cosine logits from L2-normalized embeddings and
weights; LinearClassifier is a plain MLP head.

The classifier weight is the natural tensor-parallel shard point (out_neurons
= number of speakers, up to ~100k): the train step shards it over the `model`
mesh axis and computes the AAM-softmax with psum collectives
(vocab-parallel). The module itself stays sharding-agnostic.
"""

from __future__ import annotations

import flax.linen as nn

from speaker3d_tpu.models.common import batch_norm
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class CosineClassifier(nn.Module):
    """(reference: models/campplus/classifier.py:11-41)"""

    input_dim: int
    num_blocks: int = 0
    inter_dim: int = 512
    out_neurons: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = self.input_dim
        for i in range(self.num_blocks):
            x = nn.Dense(self.inter_dim, use_bias=False,
                         name=f"blocks.{i}.linear")(x)
            x = batch_norm(train,
                             name=f"blocks.{i}.nonlinear.batchnorm")(x)
            dim = self.inter_dim
        # torch layout [out_neurons, dim] kept for mechanical conversion
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (self.out_neurons, dim))
        return _l2norm(x) @ _l2norm(weight).T


class LinearClassifier(nn.Module):
    """(reference: models/campplus/classifier.py:43-70)"""

    input_dim: int
    num_blocks: int = 0
    inter_dim: int = 512
    out_neurons: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        for i in range(self.num_blocks):
            x = nn.Dense(self.inter_dim, name=f"blocks.{i}.linear")(x)
            x = batch_norm(train,
                             name=f"blocks.{i}.nonlinear.batchnorm")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_neurons, name="linear")(x)
