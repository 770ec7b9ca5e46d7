"""Per-stage device-time breakdown of the ERes2NetV2 serving path (TPU).

Times each trunk stage as its own in-jit fori_loop (docs/DESIGN.md timing
discipline: per-iteration input variation + device->host checksum, since the
tunnel's block_until_ready does not synchronize). The sum approximates the
full-model time; the per-stage share tells where a fused Pallas kernel or a
layout change would pay.

Run ON TPU only: python tools/bench_stages.py [--batch 256] [--iters 20]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench_fn(fn, x, iters):
    """One compiled dispatch running fn iters times with varied input."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(i, acc):
            y = fn(x * (1.0 + i * 1e-6))
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    _ = float(np.asarray(loop(x)))  # compile + warm
    t0 = time.perf_counter()
    chk = float(np.asarray(loop(x)))
    dt = (time.perf_counter() - t0) / iters
    return dt, chk


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)  # B=256 compiles >40 min remotely (CLAUDE.md); opt in explicitly
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from speaker3d_tpu.models.eres2netv2 import AFF, BasicBlockERes2NetV2
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def cast(vs):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, vs)

    results = {}

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

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, inputs):
            out3, out4 = inputs
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

    specs = [
        ("fbank", None, (B, 48000), None),
        ("stem", Stem(), (B, 80, 300, 1), None),
        ("layer1", Stage(in_planes=64, planes=64, blocks=3, stride=1,
                         use_aff=False), (B, 80, 300, 64), None),
        ("layer2", Stage(in_planes=128, planes=128, blocks=4, stride=2,
                         use_aff=False), (B, 80, 300, 128), None),
        ("layer3", Stage(in_planes=256, planes=256, blocks=6, stride=2,
                         use_aff=True), (B, 40, 150, 256), None),
        ("layer4", Stage(in_planes=512, planes=512, blocks=3, stride=2,
                         use_aff=True), (B, 20, 75, 512), None),
    ]

    total = 0.0
    for name, mod, shape, _ in specs:
        if name == "fbank":
            fb = KaldiFbank(FbankConfig(), mean_norm=True)
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            fn = lambda w: fb(w)
        else:
            x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                            ).astype(dtype)
            vs = cast(jax.jit(mod.init)(key, x))
            fn = lambda z, mod=mod, vs=vs: mod.apply(vs, z)
        dt, _ = bench_fn(fn, x, args.iters)
        results[name] = dt * 1e3
        total += dt
        print(f"{name:9s} {dt*1e3:8.2f} ms", flush=True)

    # tail needs two inputs; time separately with a wrapper over out3
    out3 = jnp.asarray(rng.standard_normal((B, 20, 75, 512))
                       .astype(np.float32)).astype(dtype)
    out4 = jnp.asarray(rng.standard_normal((B, 10, 38, 1024))
                       .astype(np.float32)).astype(dtype)
    tail = Tail()
    vs = cast(jax.jit(tail.init)(key, (out3, out4)))
    dt, _ = bench_fn(lambda z: tail.apply(vs, (z, out4)), out3, args.iters)
    results["tail"] = dt * 1e3
    total += dt
    print(f"{'tail':9s} {dt*1e3:8.2f} ms", flush=True)

    audio_s = B * 3.0
    print(json.dumps({"per_stage_ms": results,
                      "sum_ms": total * 1e3,
                      "audio_s_per_s_if_sum": audio_s / total}))


if __name__ == "__main__":
    main()
