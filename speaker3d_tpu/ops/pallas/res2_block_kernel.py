"""Fused Pallas kernel for the ERes2NetV2 Res2 split-cascade block (serving).

STATUS — experimental, NOT on the serving path. Measured on v5e via
tools/bench_fused.py (B=256, 3 s segments): numerically correct (min cosine
0.999986 vs the fp32 path) but 2.5-2.9x SLOWER than the stock XLA path
(264-303 ms vs 106 ms per batch) across im2col-scratch and hybrid
formulations and t_tile 32/48/96 — the slowdown scales with work, not with
grid steps, i.e. Mosaic's generated code for these narrow-lane (26/78 of
128) shapes is the cost, not pipeline overhead. This confirms docs/BENCH.md's
earlier analysis that the block's MXU floor leaves <=1.3x headroom: the
fusion cannot recover Mosaic's vector-op overhead at these widths on this
toolchain. Kept (with full interpret-mode parity tests) as the starting
point for a future toolchain where tpu.concatenate/relayout handle narrow
lanes efficiently.

Why it was built (docs/BENCH.md "Microbenchmarks"): the narrow Res2 split
convolutions
(width 26/52 in the 17.8M flagship) leave the channel (lane) dimension
~80% empty, so every intermediate tensor XLA writes between the block's
seven conv/BN/ReLU ops is lane-padded 26->128 in HBM — stage 1 spends
~38.9 ms of a 107 ms batch where its MXU floor is ~25 ms, almost all of it
memory traffic. This kernel keeps the ENTIRE block (1x1 expand -> split ->
3x3 cascade -> concat -> 1x1 project -> shortcut add, all BN-folded,
Hardtanh(0,20) activations) resident in VMEM per (batch, time-tile) and
touches HBM exactly twice: one read of the block input, one write of the
block output.

Scope: inference only (BatchNorm folded into conv weights), scale=2 blocks
without AFF fusion — i.e. stages 1-2 of the default ERes2NetV2
(reference: speakerlab/models/eres2net/ERes2NetV2.py:31-91); AFF blocks
(stages 3-4) have 4x wider lanes and stay on the XLA path.

Kernel geometry
---------------
- Layout NHWC; grid = (batch, time-tiles). Block input [1, F, Tt, Cin] plus
  two 16-frame neighbour slivers of the same array (shifted BlockSpec index
  maps) provide the +-2-frame halo the two chained 3x3 convs need; frequency
  halos are zero rows added in-kernel (true conv zero-padding).
- 3x3 convs run as one im2col matmul per conv: 9 shifted views are
  lane-concatenated to [F*T, 9w] and hit the MXU as a single K=9w
  contraction (K-tile utilisation 234/256 at w=26) — the same MXU pass count
  XLA needs, with zero intermediate HBM traffic.
- The time-validity mask (frames beyond the real length, and the global
  t<0 / t>=T edges) re-creates the reference's explicit zero padding for
  the in-VMEM intermediates; padded output frames are sliced off outside.
- All matmuls accumulate in fp32 (`preferred_element_type`) regardless of
  the serving dtype (bf16).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_BLOCK = 16  # neighbour sliver width (sublane-tile aligned for bf16)


def _relu20(x):
    return jnp.clip(x, 0.0, 20.0)


@dataclass(frozen=True)
class FoldedRes2Block:
    """BN-folded parameters of one scale=2 Res2 block (all 2D + bias rows)."""

    w1: jax.Array    # [Cin, 2w]   conv1 (1x1) with bn1 folded
    b1: jax.Array    # [1, 2w]
    wc1: jax.Array   # [3w, 3w]    convs.0 (3x3), bns.0 folded, hybrid layout
    bc1: jax.Array   # [1, w]
    wc2: jax.Array   # [3w, 3w]    convs.1 (3x3), bns.1 folded, hybrid layout
    bc2: jax.Array   # [1, w]
    w3: jax.Array    # [2w, Cout]  conv3 (1x1) with bn3 folded (no relu)
    b3: jax.Array    # [1, Cout]
    wsc: jax.Array | None  # [Cin, Cout] shortcut conv + bn, or None
    bsc: jax.Array | None  # [1, Cout]


def fold_res2_block(params, stats, dtype=jnp.float32,
                    eps: float = 1e-5) -> FoldedRes2Block:
    """Fold BatchNorm (inference running stats) into the preceding convs."""

    def fold(conv_key, bn_key):
        k = jnp.asarray(params[conv_key]["kernel"], jnp.float32)
        g = (jnp.asarray(params[bn_key]["scale"], jnp.float32)
             / jnp.sqrt(jnp.asarray(stats[bn_key]["var"], jnp.float32) + eps))
        b = (jnp.asarray(params[bn_key]["bias"], jnp.float32)
             - jnp.asarray(stats[bn_key]["mean"], jnp.float32) * g)
        kf = k * g
        if k.shape[0] == 3:
            # 3x3: _conv3x3_hybrid layout W_h[(df*w)+c, (dt*w_out)+o]
            kf = jnp.transpose(kf, (0, 2, 1, 3))
            w2d = kf.reshape(3 * k.shape[2], 3 * k.shape[3])
        else:
            w2d = kf.reshape(-1, k.shape[-1])
        return w2d.astype(dtype), b[None, :].astype(jnp.float32)

    w1, b1 = fold("conv1", "bn1")
    wc1, bc1 = fold("convs.0", "bns.0")
    wc2, bc2 = fold("convs.1", "bns.1")
    w3, b3 = fold("conv3", "bn3")
    wsc = bsc = None
    if "shortcut.0" in params:
        wsc, bsc = fold("shortcut.0", "shortcut.1")
    return FoldedRes2Block(w1, b1, wc1, bc1, wc2, bc2, w3, b3, wsc, bsc)


def _conv3x3_hybrid(s, w_h, bias, out_cols: int, dtype):
    """3x3 conv as ONE MXU contraction + 3 shifted adds.

    The frequency taps are concatenated on the matmul INPUT — slices along
    the untiled F axis carry no layout offsets, so this concat is legal and
    cheap (unlike time-shifted concats, which Mosaic's tpu.concatenate
    rejects, and scratch-store im2col, which moves every element 9x through
    lane-padded registers — measured 2.9x slower than XLA). The time taps
    land on the matmul OUTPUT: W_h[(df*w)+c, (dt*w)+o] = K[df,dt,c,o], so

        P[f, t, dt*w+o] = sum_{df,c} K[df,dt,c,o] * s_pad[f+df, t, c]
        y[f, t, o]      = sum_dt P[f, t+dt, dt*w+o]

    One [F*t_in, 3w] @ [3w, 3w] matmul = HALF the MXU passes of im2col at
    w=26 (K and N both one fully-used 78-lane tile vs K=234->256 x N=26),
    and the only vector work left is two shifted adds.

    s: [F, out_cols+2, w] (time halo included, F unpadded).
    Returns relu20(conv3x3(s) + bias): [F, out_cols, w]."""
    f, t_in, w = s.shape
    sh = jnp.pad(s, ((1, 1), (0, 0), (0, 0)))
    a = jnp.concatenate([sh[0:f], sh[1:f + 1], sh[2:f + 2]], axis=-1)
    p = jnp.dot(a.reshape(f * t_in, 3 * w), w_h,
                preferred_element_type=jnp.float32).reshape(f, t_in, 3 * w)
    y = (p[:, 0:out_cols, 0:w]
         + p[:, 1:out_cols + 1, w:2 * w]
         + p[:, 2:out_cols + 2, 2 * w:3 * w]) + bias.reshape(1, 1, w)
    return _relu20(y).astype(dtype)


def _make_kernel(F: int, Tt: int, w: int, cin: int, cout: int,
                 t_real: int, has_sc: bool, dtype):
    def kernel(xl_ref, xc_ref, xr_ref, w1_ref, b1_ref, wc1_ref, bc1_ref,
               wc2_ref, bc2_ref, w3_ref, b3_ref, *rest):
        if has_sc:
            wsc_ref, bsc_ref = rest[:2]
            rest = rest[2:]
        out_ref, cat_ref = rest
        pid = pl.program_id(1)
        last = pl.num_programs(1) - 1

        xc = xc_ref[0]                      # [F, Tt, Cin]
        # last 2 cols of the left sliver / first 2 of the right one (the
        # sublane-offset layouts these loads carry are fine here: the
        # concat dim below IS the sublane dim, and concat only rejects
        # offsets on non-concat dims)
        lh = xl_ref[0][:, HALO_BLOCK - 2:, :]
        rh = xr_ref[0][:, :2, :]
        lh = jnp.where(pid == 0, jnp.zeros_like(lh), lh)
        rh = jnp.where(pid == last, jnp.zeros_like(rh), rh)
        x_ext = jnp.concatenate([lh, xc, rh], axis=1)   # [F, Tt+4, Cin]

        # validity of extended frames: 0 <= global_t < t_real (re-creates
        # the reference conv's zero padding for in-VMEM intermediates)
        tg = (pid * Tt - 2
              + jax.lax.broadcasted_iota(jnp.int32, (1, Tt + 4, 1), 1))
        mask = ((tg >= 0) & (tg < t_real)).astype(dtype)

        h = jnp.dot(x_ext.reshape(F * (Tt + 4), cin), w1_ref[:],
                    preferred_element_type=jnp.float32) + b1_ref[:]
        h = (_relu20(h).astype(dtype).reshape(F, Tt + 4, 2 * w)) * mask
        s1, s2 = h[..., :w], h[..., w:]

        y1 = _conv3x3_hybrid(s1, wc1_ref[:], bc1_ref[:], Tt + 2, dtype)
        y1 = y1 * mask[:, 1:Tt + 3, :]
        u = s2[:, 1:Tt + 3, :] + y1
        y2 = _conv3x3_hybrid(u, wc2_ref[:], bc2_ref[:], Tt, dtype)

        # normalise [y1 centre | y2] through the cat scratch (lane concat
        # would reject y1's sublane-offset layout)
        cat_ref[:, :, :w] = y1[:, 1:Tt + 1, :]
        cat_ref[:, :, w:] = y2
        cat = cat_ref[:].reshape(F * Tt, 2 * w)
        out = jnp.dot(cat, w3_ref[:],
                      preferred_element_type=jnp.float32) + b3_ref[:]
        xc_flat = xc.reshape(F * Tt, cin)
        if has_sc:
            res = jnp.dot(xc_flat, wsc_ref[:],
                          preferred_element_type=jnp.float32) + bsc_ref[:]
        else:
            res = xc_flat.astype(jnp.float32)
        out_ref[0] = _relu20(out + res).astype(dtype).reshape(F, Tt, cout)

    return kernel


def res2_block_fused(x, p: FoldedRes2Block, *, stride: int = 1,
                     t_tile: int = 32, interpret: bool = False,
                     vmem_limit_bytes: int | None = None):
    """Apply one BN-folded scale=2 Res2 block. x: [B, F, T, Cin] -> [B, F',
    T', Cout]. stride=2 subsamples outside the kernel (the reference's 1x1
    stride-2 convs read even indices only; strided vector slices cannot
    lower inside Mosaic)."""
    if stride == 2:
        x = x[:, ::2, ::2, :]
    elif stride != 1:
        raise ValueError(f"unsupported stride {stride}")
    b, f, t, cin = x.shape
    w = p.bc1.shape[-1]
    cout = p.w3.shape[-1]
    dtype = x.dtype

    n_t = -(-t // t_tile)
    tp = n_t * t_tile
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    if t_tile % HALO_BLOCK:
        raise ValueError(f"t_tile must be a multiple of {HALO_BLOCK}, "
                         f"got {t_tile} (halo slivers are indexed in "
                         f"{HALO_BLOCK}-frame units)")
    if tp % HALO_BLOCK:
        raise ValueError(f"padded time {tp} not divisible by {HALO_BLOCK}")
    n_halo = tp // HALO_BLOCK
    r = t_tile // HALO_BLOCK

    def idx_c(i, j):
        return (i, 0, j, 0)

    def idx_l(i, j):
        return (i, 0, jnp.maximum(j * r - 1, 0), 0)

    def idx_r(i, j):
        return (i, 0, jnp.minimum(j * r + r, n_halo - 1), 0)

    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    weights = [p.w1, p.b1, p.wc1, p.bc1, p.wc2, p.bc2, p.w3, p.b3]
    has_sc = p.wsc is not None
    if has_sc:
        weights += [p.wsc, p.bsc]
    weights = [wa.astype(dtype) if wa.ndim == 2 and wa.shape[0] > 1 else wa
               for wa in weights]  # biases stay fp32 rows

    kernel = _make_kernel(f, t_tile, w, cin, cout, t, has_sc, dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, f, HALO_BLOCK, cin), idx_l,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, t_tile, cin), idx_c,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, HALO_BLOCK, cin), idx_r,
                         memory_space=pltpu.VMEM),
        ] + [full(wa) for wa in weights],
        out_specs=pl.BlockSpec((1, f, t_tile, cout), idx_c,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, tp, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((f, t_tile, 2 * w), dtype),           # [y1 | y2]
        ],
        compiler_params=None if vmem_limit_bytes is None else
        pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, x, x, *weights)
    return out[:, :, :t, :]


def fused_res2_apply_fn(model, variables, compute_dtype=jnp.bfloat16,
                        t_tile: int = 32, interpret: bool = False,
                        vmem_limit_bytes: int | None = None):
    """Return ``fn(feats) -> embeddings`` where every non-AFF scale=2 Res2
    block runs through the fused Pallas kernel and everything else (stem,
    AFF stages, pooling, projection) stays on the stock XLA path.

    Uses a flax method interceptor (same mechanism as eval/quant.py), so the
    canonical ERes2NetV2 module remains the single source of truth."""
    from speaker3d_tpu.models.eres2netv2 import BasicBlockERes2NetV2

    cast_vars = jax.tree_util.tree_map(
        lambda v: v.astype(compute_dtype)
        if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, variables)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, BasicBlockERes2NetV2)
                and context.method_name == "__call__"
                and not mod.use_aff and mod.scale == 2 and args):
            x = args[0]
            p = fold_res2_block(mod.variables["params"],
                                mod.variables["batch_stats"], dtype=x.dtype)
            return res2_block_fused(x, p, stride=mod.stride, t_tile=t_tile,
                                    interpret=interpret,
                                    vmem_limit_bytes=vmem_limit_bytes)
        return next_fun(*args, **kwargs)

    def apply_fn(feats):
        with jax.named_scope("fused_res2"):
            import flax.linen as nn

            with nn.intercept_methods(interceptor):
                return model.apply(cast_vars, feats.astype(compute_dtype),
                                   train=False)

    return apply_fn
