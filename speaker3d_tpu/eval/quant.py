"""Post-training int8 quantization for the serving path.

Why: TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate and int8
activations halve HBM traffic (beyond-reference capability: the reference's
deployment path is fp32 ONNX, runtime/onnxruntime/model/*). Measured
reality on the current tunnel toolchain (tools/bench_int8.py, v5e,
ERes2NetV2 B=256): accuracy holds at min cosine 0.9996 vs fp32, but
throughput is only 1.01x bf16 — this XLA build does not lower int8
convolutions to the fast MXU mode. Kept as an accuracy-proven deployment
option (useful for int8-native runtimes via export and for future
toolchains); bf16 remains the serving default.

Mechanism — no model rewrite: a flax method interceptor swaps every
``nn.Conv``/``nn.Dense`` __call__ for a quantized one:

  - weights: per-output-channel symmetric int8 (scales from the weight
    tensor itself);
  - activations: per-tensor symmetric int8, scales calibrated by running a
    few representative batches with a recording interceptor (max-abs,
    fp32);
  - compute: int8 x int8 -> int32 conv/dot (MXU), dequantized in the
    epilogue (XLA fuses the scale-mul + bias add).

BatchNorm/pooling/attention gates etc. stay in the float dtype, as does any
module whose recorded input scale is missing (e.g. a layer that never ran
during calibration). Accuracy is gated by the caller (bench.py requires
cosine > 0.99 vs the fp32 path; typical drift is ~1e-3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn


def _module_key(mod: nn.Module) -> str:
    return "/".join(str(p) for p in mod.path)


def calibrate_act_scales(model: nn.Module, variables, feats,
                         percentile: float = 100.0) -> Dict[str, float]:
    """Run one representative batch, record max-abs input per Conv/Dense."""
    records: Dict[str, float] = {}

    def recorder(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, (nn.Conv, nn.Dense)) and args:
            x = np.asarray(jax.device_get(args[0]), np.float32)
            if percentile >= 100.0:
                v = float(np.abs(x).max())
            else:
                v = float(np.percentile(np.abs(x), percentile))
            key = _module_key(mod)
            records[key] = max(records.get(key, 0.0), v)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(recorder):
        model.apply(variables, feats, train=False)
    return records


def quantized_apply_fn(model: nn.Module, variables,
                       act_scales: Dict[str, float],
                       compute_dtype=jnp.bfloat16):
    """Return ``fn(feats) -> embeddings`` running Conv/Dense in int8.

    ``variables`` should be the float checkpoint; weights are quantized
    inside the traced function (constant-folded by XLA at compile time).
    """

    def q_int8(x, scale):
        return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)

    def orig_kernel(mod):
        # quantize from the FLOAT checkpoint, not the bf16-cast apply
        # variables (double rounding costs up to half an int8 step)
        try:
            node = variables["params"]
            for p in mod.path:
                node = node[p]
            return jnp.asarray(node["kernel"], jnp.float32)
        except (KeyError, TypeError):
            return mod.variables["params"]["kernel"].astype(jnp.float32)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        key = _module_key(mod)
        scale = act_scales.get(key)
        if scale is None or scale <= 0.0 or not args:
            return next_fun(*args, **kwargs)
        x = args[0]

        if isinstance(mod, nn.Dense):
            w32 = orig_kernel(mod)  # [in, out]
            w_scale = jnp.maximum(jnp.abs(w32).max(axis=0), 1e-8) / 127.0
            wq = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)
            a_scale = jnp.asarray(scale / 127.0, jnp.float32)
            xq = q_int8(x.astype(jnp.float32), a_scale)
            y = jax.lax.dot_general(
                xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (a_scale * w_scale)
            if mod.use_bias:
                y = y + mod.variables["params"]["bias"].astype(jnp.float32)
            return y.astype(compute_dtype)

        if isinstance(mod, nn.Conv):
            if mod.feature_group_count != 1:
                return next_fun(*args, **kwargs)  # depthwise: stay float
            w32 = orig_kernel(mod)  # [kh, kw, in, out]
            red = tuple(range(w32.ndim - 1))
            w_scale = jnp.maximum(jnp.abs(w32).max(axis=red), 1e-8) / 127.0
            wq = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)
            a_scale = jnp.asarray(scale / 127.0, jnp.float32)
            xq = q_int8(x.astype(jnp.float32), a_scale)

            strides = mod.strides or (1,) * (w32.ndim - 2)
            if isinstance(strides, int):
                strides = (strides,) * (w32.ndim - 2)
            padding = mod.padding
            if isinstance(padding, str):
                pad = padding
            else:
                pad = [tuple(p) if not isinstance(p, int) else (p, p)
                       for p in (padding if isinstance(padding, (list, tuple))
                                 else [padding] * (w32.ndim - 2))]
            spatial = "HWD"[: w32.ndim - 2]
            dims = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")

            def _tup(v, n):
                if v is None:
                    return (1,) * n
                return (v,) * n if isinstance(v, int) else tuple(v)

            y = jax.lax.conv_general_dilated(
                xq, wq, strides, pad,
                lhs_dilation=_tup(getattr(mod, "input_dilation", None),
                                  w32.ndim - 2),
                rhs_dilation=_tup(getattr(mod, "kernel_dilation", None),
                                  w32.ndim - 2),
                dimension_numbers=dims,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (a_scale * w_scale)
            if mod.use_bias:
                y = y + mod.variables["params"]["bias"].astype(jnp.float32)
            return y.astype(compute_dtype)

        return next_fun(*args, **kwargs)

    cast_vars = jax.tree_util.tree_map(
        lambda v: v.astype(compute_dtype)
        if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, variables)

    def apply_fn(feats):
        with nn.intercept_methods(interceptor):
            return model.apply(cast_vars, feats.astype(compute_dtype),
                               train=False)

    return apply_fn
