"""funasr Paraformer checkpoint -> native SANMEncoder converter.

The reference's `train_para` downloads a funasr Paraformer model and uses
its encoder as a frozen feature frontend (reference:
speakerlab/bin/train_para.py:36-38,73-77). This module converts the
encoder weights out of a funasr `model.pt` (keys `encoder.encoders0.0...`,
`encoder.encoders.N...`, `encoder.after_norm...`) into the parameter tree
of speaker3d_tpu.models.sanm.SANMEncoder, whose module names mirror
funasr's attribute paths so the mechanical torch->flax converter
(compat/torch_convert.py) applies directly.

Weight-for-weight parity against a torch mirror of funasr's SANM encoder is
pinned in tests/test_train_para.py; note this environment has no funasr /
network access, so the funasr-side semantics are mirrored in-repo from the
public funasr source (funasr/models/sanm/{encoder,attention}.py) and
documented in models/sanm.py.
"""

from __future__ import annotations

from typing import Any, Mapping, Union

from speaker3d_tpu.compat.torch_convert import (
    convert_torch_state_dict,
    load_torch_checkpoint,
    variables_shape_tree,
)


def extract_encoder_state(state_dict: Mapping[str, Any],
                          prefix: str = "encoder.") -> dict:
    """Keep only `<prefix>*` keys, stripped of the prefix. If no key carries
    the prefix, the dict is assumed to already be encoder-only."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    return sub if sub else dict(state_dict)


def load_funasr_encoder(ckpt: Union[str, Mapping[str, Any]], encoder,
                        example_feats):
    """funasr model.pt path (or its state_dict) -> SANMEncoder params.

    ``encoder`` must be configured to match the checkpoint (input_dim,
    d_model, heads, ffn_dim, num_layers, kernel_size); a shape mismatch
    raises with the offending key.
    """
    sd = load_torch_checkpoint(ckpt) if isinstance(ckpt, str) else dict(ckpt)
    sd = extract_encoder_state(sd)
    shapes = variables_shape_tree(encoder, example_feats, train=False)
    variables = convert_torch_state_dict(sd, shapes)
    return variables["params"]
