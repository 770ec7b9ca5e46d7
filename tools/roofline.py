"""Per-kernel roofline: measured rate vs the ceiling implied by documented
constraints (VERDICT r3 item 5 — turn "kernels at speed-of-light" from
prose into a checkable table).

Model of the ceiling (the ONLY modeling in this file, stated so the table
is auditable):

  conv ceiling  = PEAK_BF16 x min(1, Cout/128) x min(1, K/128)
                  K = Cin*kh*kw (contraction depth)
    - the MXU is a 128(K) x 128(N) systolic array; an operand dim below
      128 is zero-padded, so the sustained rate scales with both fills
      (docs/BENCH.md: "width-26 split convs fill <=26/128 MXU lanes").
    - a stage's ceiling is the FLOP-weighted harmonic mean over its convs:
      T_floor = sum_i flops_i / ceiling_i; ceiling = sum_i flops_i / T_floor.
  bandwidth-bound rows (fbank, pooling/head, AHC matvec) report GB/s
  moved vs HBM_BW; their time floor is bytes / HBM_BW.
  matmul rows (affinity) use the measured in-jit peak from docs/BENCH.md
  (8192^3 bf16 139 / f32 120 TFLOP/s) as the practical ceiling.

Peaks: v5e bf16 197 TFLOP/s, HBM ~819 GB/s (public v5e specs).

Usage (TPU, run alone — CLAUDE.md):
    python -c "exec(open('tools/roofline.py').read())" [--batch 64]
The tool prints one JSON row per kernel and a markdown table for
docs/BENCH.md. Timing discipline: in-jit fori_loop with per-iteration
input variation + device fetch (docs/DESIGN.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12
PEAK_F32_MEASURED = 120e12   # docs/BENCH.md 8192^3 in-jit chain
HBM_BW = 819e9

FRAMES = 300  # 3 s of audio
MEL = 80


def conv_cost(b, h, w, cin, cout, kh, kw, stride=1):
    """(flops, ceiling) for one conv at the given output-relevant dims."""
    oh, ow = h // stride, w // stride
    flops = 2.0 * b * oh * ow * cin * kh * kw * cout
    k = cin * kh * kw
    fill = min(1.0, cout / 128.0) * min(1.0, k / 128.0)
    return flops, PEAK_BF16 * fill


def stage_specs(b):
    """Per-stage conv inventories for ERes2NetV2 (m=64, scale=2, exp=2,
    baseWidth 26; reference models/eres2net/ERes2NetV2.py:161-254).
    Returns {stage: (flops, ceiling)}; ceiling is the FLOP-weighted
    harmonic aggregate."""
    out = {}

    def agg(convs):
        flops = sum(f for f, _ in convs)
        t_floor = sum(f / c for f, c in convs)
        return flops, flops / t_floor

    h, w = MEL, FRAMES
    out["stem"] = agg([conv_cost(b, h, w, 1, 64, 3, 3)])

    def block(b_, h_, w_, inp, planes, stride, width):
        """BasicBlockERes2NetV2: 1x1(stride) expand -> scale(=2) 3x3
        width->width convs -> 1x1 project (+1x1 shortcut when shape
        changes). (reference ERes2NetV2.py:31-92: self.nums = scale, one
        3x3 per split in V2.)"""
        convs = []
        ho, wo = h_ // stride, w_ // stride
        convs.append(conv_cost(b_, h_, w_, inp, 2 * width, 1, 1, stride))
        convs.append(conv_cost(b_, ho, wo, width, width, 3, 3))
        convs.append(conv_cost(b_, ho, wo, width, width, 3, 3))
        convs.append(conv_cost(b_, ho, wo, 2 * width, 2 * planes, 1, 1))
        if stride != 1 or inp != 2 * planes:
            convs.append(conv_cost(b_, h_, w_, inp, 2 * planes, 1, 1, stride))
        return convs

    layouts = [  # (name, blocks, planes, width, stride, h_in, w_in, in_planes)
        ("layer1", 3, 64, 26, 1, 80, 300, 64),
        ("layer2", 4, 128, 52, 2, 80, 300, 128),
        ("layer3", 6, 256, 104, 2, 40, 150, 256),
        ("layer4", 3, 512, 208, 2, 20, 75, 512),
    ]
    for name, nblocks, planes, width, stride, h_in, w_in, inp in layouts:
        convs = []
        h_, w_, ip = h_in, w_in, inp
        for bi in range(nblocks):
            s = stride if bi == 0 else 1
            convs += block(b, h_, w_, ip, planes, s, width)
            h_, w_, ip = h_ // s, w_ // s, 2 * planes
        out[name] = agg(convs)

    # fuse34 downsample conv + AFF gate MLPs + TSTP + head dense
    # (head: TSTP over C*F=10240 -> mean||std 20480 -> Dense 192; K=20480
    # and N=192 both fill the MXU)
    tail = [conv_cost(b, 20, 75, 512, 1024, 3, 3, 2),
            conv_cost(b, 10, 38, 2048, 64, 1, 1),
            conv_cost(b, 10, 38, 64, 1024, 1, 1),
            (2.0 * b * 20480 * 192, PEAK_BF16)]
    out["fuse+head"] = agg(tail)
    return out


def bench_fn(fn, x, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(z):
        def body(i, acc):
            y = fn(z * (1.0 + i * 1e-6))
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(np.asarray(loop(x)))  # compile + warm
    t0 = time.perf_counter()
    chk = float(np.asarray(loop(x)))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(chk)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ahc_n", type=int, default=8192)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.models.eres2netv2 import AFF, BasicBlockERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    B = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    def cast(vs):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, vs)

    def emit(name, dt, flops, ceiling, kind, bytes_moved=None):
        achieved = flops / dt
        row = {"kernel": name, "batch": B, "ms": round(dt * 1e3, 2),
               "kind": kind,
               "achieved_tflops": round(achieved / 1e12, 1),
               "ceiling_tflops": round(ceiling / 1e12, 1),
               "pct_of_ceiling": round(100 * achieved / ceiling, 1)}
        if bytes_moved is not None:
            row["achieved_gbps"] = round(bytes_moved / dt / 1e9, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    specs = stage_specs(B)

    # ---- fbank (bandwidth-bound: wav in + frames/window/fft work + mel) --
    fb = KaldiFbank(FbankConfig(), mean_norm=True)
    x = jnp.asarray(rng.standard_normal((B, 48000)).astype(np.float32))
    dt = bench_fn(lambda w: fb(w), x, args.iters)
    # bytes: wav read (4B) + frames materialized f32 (298x400x4 in+out of
    # fft) + power 257 + mel out 80; dominated by the framed tensor passes
    bytes_moved = B * (48000 * 4 + 298 * (400 * 4 * 2 + 512 * 8 + 257 * 4
                                          + 80 * 4 * 2))
    mel_flops = 2.0 * B * 298 * 257 * 80
    fft_flops = B * 298 * 5 * 512 * 9  # ~5N log2 N real FFT
    emit("fbank", dt, mel_flops + fft_flops,
         (mel_flops + fft_flops) / (bytes_moved / HBM_BW), "HBM-bound",
         bytes_moved)

    # ---- conv stages ------------------------------------------------------
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        name="conv1")(x)
            return nn.relu(nn.BatchNorm(use_running_average=True,
                                        name="bn1")(h))

    class Stage(nn.Module):
        in_planes: int
        planes: int
        blocks: int
        stride: int
        use_aff: bool

        @nn.compact
        def __call__(self, x):
            inp = self.in_planes
            for bi, s in enumerate([self.stride] + [1] * (self.blocks - 1)):
                x = BasicBlockERes2NetV2(
                    in_planes=inp, planes=self.planes, stride=s,
                    base_width=26, scale=2, expansion=2,
                    use_aff=self.use_aff, name=f"b{bi}")(x, train=False)
                inp = self.planes * 2
            return x

    stage_mods = [
        ("stem", Stem(), (B, 80, 300, 1)),
        ("layer1", Stage(in_planes=64, planes=64, blocks=3, stride=1,
                         use_aff=False), (B, 80, 300, 64)),
        ("layer2", Stage(in_planes=128, planes=128, blocks=4, stride=2,
                         use_aff=False), (B, 80, 300, 128)),
        ("layer3", Stage(in_planes=256, planes=256, blocks=6, stride=2,
                         use_aff=True), (B, 40, 150, 256)),
        ("layer4", Stage(in_planes=512, planes=512, blocks=3, stride=2,
                         use_aff=True), (B, 20, 75, 512)),
    ]
    for name, mod, shape in stage_mods:
        xin = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                          ).astype(jnp.bfloat16)
        vs = cast(jax.jit(mod.init)(key, xin.astype(jnp.float32)))
        dt = bench_fn(lambda z, mod=mod, vs=vs: mod.apply(vs, z), xin,
                      args.iters)
        flops, ceiling = specs[name]
        emit(name, dt, flops, ceiling, "MXU lane-fill")

    # ---- fuse + pooling + head -------------------------------------------
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, out3, out4):
            ds = nn.Conv(1024, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), use_bias=False,
                         name="layer3_ds")(out3)
            f = AFF(channels=1024, name="fuse34")(out4, ds, train=False)
            b, fr, t, c = f.shape
            f = f.transpose(0, 2, 1, 3).reshape(b, t, fr * c)
            mean = f.mean(axis=1)
            std = jnp.sqrt(jnp.clip(f.var(axis=1), 1e-7, None))
            return nn.Dense(192, name="seg_1")(
                jnp.concatenate([mean, std], -1))

    out3 = jnp.asarray(rng.standard_normal((B, 20, 75, 512))
                       .astype(np.float32)).astype(jnp.bfloat16)
    out4 = jnp.asarray(rng.standard_normal((B, 10, 38, 1024))
                       .astype(np.float32)).astype(jnp.bfloat16)
    tail = Tail()
    tvs = cast(jax.jit(tail.init)(key, out3.astype(jnp.float32),
                                  out4.astype(jnp.float32)))

    @jax.jit
    def tail_loop(a, b4):
        def body(i, acc):
            y = tail.apply(tvs, a * (1.0 + i * 1e-6), b4)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, args.iters, body,
                                 jnp.zeros((), jnp.float32))

    float(np.asarray(tail_loop(out3, out4)))
    t0 = time.perf_counter()
    assert np.isfinite(float(np.asarray(tail_loop(out3, out4))))
    dt = (time.perf_counter() - t0) / args.iters
    flops, ceiling = specs["fuse+head"]
    emit("fuse+head", dt, flops, ceiling, "MXU lane-fill")

    # ---- affinity matmul (diarization clustering front) -------------------
    n, d = args.ahc_n, 192
    emb = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    @jax.jit
    def aff_loop(z):
        def body(i, acc):
            zz = z * (1.0 + i * 1e-6)
            zn = zz / jnp.linalg.norm(zz, axis=1, keepdims=True)
            a = jnp.matmul(zn, zn.T, precision=jax.lax.Precision.HIGHEST)
            return acc + jnp.sum(a)
        return jax.lax.fori_loop(0, args.iters, body,
                                 jnp.zeros((), jnp.float32))

    float(np.asarray(aff_loop(emb)))
    t0 = time.perf_counter()
    assert np.isfinite(float(np.asarray(aff_loop(emb))))
    dt = (time.perf_counter() - t0) / args.iters
    flops = 2.0 * n * n * d
    emit(f"affinity_matmul_n{n}", dt, flops, PEAK_F32_MEASURED,
         "f32 matmul (measured practical peak)")

    # ---- AHC NN-chain matvec (the device dendrogram's inner op) ----------
    @jax.jit
    def matvec_loop(z):
        def body(i, acc):
            zz = z * (1.0 + i * 1e-6)
            v = zz @ zz[i % n]
            return acc + jnp.sum(v)
        return jax.lax.fori_loop(0, args.iters, body,
                                 jnp.zeros((), jnp.float32))

    float(np.asarray(matvec_loop(emb)))
    t0 = time.perf_counter()
    assert np.isfinite(float(np.asarray(matvec_loop(emb))))
    dt = (time.perf_counter() - t0) / args.iters
    flops = 2.0 * n * d
    bytes_moved = n * d * 4
    emit(f"ahc_matvec_n{n}", dt, flops, flops / (bytes_moved / HBM_BW),
         "HBM-bound", bytes_moved)

    # ---- markdown ---------------------------------------------------------
    print("\n| kernel | B | ms | kind | achieved TFLOP/s | ceiling TFLOP/s "
          "| % of ceiling |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        extra = (f" ({r['achieved_gbps']} GB/s)"
                 if "achieved_gbps" in r else "")
        print(f"| {r['kernel']} | {r['batch']} | {r['ms']} | {r['kind']} | "
              f"{r['achieved_tflops']}{extra} | {r['ceiling_tflops']} | "
              f"{r['pct_of_ceiling']}% |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
