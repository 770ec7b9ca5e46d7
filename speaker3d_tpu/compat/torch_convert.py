"""Generic PyTorch state_dict -> Flax variables converter.

Models in speaker3d_tpu name their Flax submodules exactly like the reference
torch attribute paths (e.g. ``layer1.0.convs.1``), so conversion is purely
mechanical: walk the Flax variable tree, reconstruct the torch key, and apply
the layout transpose implied by the tensor rank:

  - Conv2d  weight [O, I, kH, kW] -> HWIO [kH, kW, I, O]
  - Conv1d  weight [O, I, K]      -> WIO  [K, I, O]
  - Linear  weight [O, I]         -> [I, O]
  - BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats

This makes reference checkpoints load bit-for-bit (embedding parity gate,
see BASELINE.md north-star targets).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

_LEAF_TO_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "embedding": "weight",
    "weight": "weight",  # raw nn.Parameter kept in torch layout (e.g. CosineClassifier)
    "weight_g": "weight_g",  # weight-normed linear (RDINO head), torch layout
    "weight_v": "weight_v",
    "gamma": "gamma",        # GlobalLayerNorm (TalkNet), torch layout
    "beta": "beta",
    "in_proj_weight": "in_proj_weight",  # torch MultiheadAttention, torch layout
    "in_proj_bias": "in_proj_bias",
}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    prefix: str = "",
    strict: bool = True,
):
    """Return a new variables pytree with values taken from ``state_dict``.

    ``variables`` is the tree from ``model.init`` ({'params': ..,
    'batch_stats': ..}); it provides the structure and expected shapes.
    ``prefix`` is prepended to every torch key (e.g. ``'module.'`` for DDP
    checkpoints — though prefer stripping those upstream).
    """
    flat = traverse_util.flatten_dict(variables)
    out = {}
    missing = []
    for path, val in flat.items():
        mods, leaf = list(path[1:-1]), path[-1]
        tleaf = _LEAF_TO_TORCH.get(leaf)
        if tleaf is None and "." in leaf:
            # dotted param name (e.g. 'out_proj.weight', kept in torch
            # layout): route the prefix into the module path
            head, tail = leaf.rsplit(".", 1)
            if tail in _LEAF_TO_TORCH:
                mods = mods + [head]
                leaf, tleaf = tail, tail  # identity mapping, no transform
        if tleaf is None:
            raise KeyError(f"no torch mapping for flax leaf {path}")
        tkey = prefix + ".".join(mods + [tleaf])
        if tkey not in state_dict:
            if strict:
                missing.append(tkey)
                continue
            out[path] = val
            continue
        t = _to_numpy(state_dict[tkey])
        if leaf == "kernel":
            if t.ndim == 5:  # Conv3d [O, I, kD, kH, kW] -> DHWIO
                t = t.transpose(2, 3, 4, 1, 0)
            elif t.ndim == 4:
                t = t.transpose(2, 3, 1, 0)
            elif t.ndim == 3:
                t = t.transpose(2, 1, 0)
            elif t.ndim == 2:
                t = t.T
        if t.shape != val.shape:
            if t.size == val.size:  # e.g. Conv1d k=1 loaded into a Dense
                t = t.reshape(val.shape)
            else:
                raise ValueError(
                    f"shape mismatch for {tkey}: torch {t.shape} vs flax "
                    f"{path} {val.shape}")
        out[path] = jnp.asarray(t, dtype=val.dtype)
    if missing:
        raise KeyError(f"torch keys not found: {missing[:10]}"
                       f"{' ...' if len(missing) > 10 else ''}")
    return traverse_util.unflatten_dict(out)


def export_torch_state_dict(variables: Mapping[str, Any],
                            prefix: str = "") -> dict:
    """Inverse of ``convert_torch_state_dict``: Flax variables -> a torch
    state_dict of numpy arrays (pass through ``torch.from_numpy`` before
    ``load_state_dict``).

    Enables round-tripping trained TPU weights back into the reference's
    torch models (reference: bin/export_speaker_embedding_onnx.py exports
    FROM torch; this is the matching bridge in the other direction).
    Caveat: a Dense layer that was populated from a k=1 Conv1d via the
    reshape branch of the forward converter exports in Dense layout.
    """
    flat = traverse_util.flatten_dict(variables)
    out = {}
    for path, val in flat.items():
        mods, leaf = list(path[1:-1]), path[-1]
        tleaf = _LEAF_TO_TORCH.get(leaf)
        if tleaf is None and "." in leaf:
            head, tail = leaf.rsplit(".", 1)
            if tail in _LEAF_TO_TORCH:
                mods = mods + [head]
                leaf, tleaf = tail, tail
        if tleaf is None:
            raise KeyError(f"no torch mapping for flax leaf {path}")
        t = np.asarray(val)
        if leaf == "kernel":
            if t.ndim == 5:  # DHWIO -> [O, I, kD, kH, kW]
                t = t.transpose(4, 3, 0, 1, 2)
            elif t.ndim == 4:  # HWIO -> [O, I, kH, kW]
                t = t.transpose(3, 2, 0, 1)
            elif t.ndim == 3:  # WIO -> [O, I, K]
                t = t.transpose(2, 1, 0)
            elif t.ndim == 2:  # [I, O] -> [O, I]
                t = t.T
        out[prefix + ".".join(mods + [tleaf])] = t
    return out


def variables_shape_tree(model, *example_args, **example_kwargs):
    """Structure/shape tree of ``model.init`` WITHOUT running it.

    ``convert_torch_state_dict`` only needs shapes/dtypes, so checkpoint
    loading never has to execute the (potentially expensive) random init —
    ``jax.eval_shape`` traces it abstractly.
    """
    import jax

    return jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args,
                          **example_kwargs)


def load_into_model(model, state_dict, *example_args, **example_kwargs):
    """One-call checkpoint load: torch state_dict -> flax variables."""
    shapes = variables_shape_tree(model, *example_args, **example_kwargs)
    return convert_torch_state_dict(state_dict, shapes)


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> dict:
    """Drop a leading 'module.' from DDP-saved checkpoints.
    (reference: speakerlab/utils/utils.py:119 load_params)"""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def load_torch_checkpoint(path: str):
    """Load a torch .pt/.bin checkpoint into a plain dict of numpy arrays."""
    import torch  # local import: torch is host-side tooling only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in strip_ddp_prefix(sd).items()
            if isinstance(v, torch.Tensor)}
