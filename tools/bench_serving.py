"""Serving throughput for any registered backbone, one chip, in-jit.

Same methodology as bench.py (single-dispatch lax.fori_loop, per-iteration
input variation, checksum fetch): audio-seconds/s/chip for
fbank -> backbone on 3 s segments, bf16 params+activations.

Run from /root/repo (cwd supplies the import path — no PYTHONPATH on TPU):
    python -c "exec(open('tools/bench_serving.py').read())" <model> [batch]

Models: eres2netv2 | eres2netv2_w24s4ep4 | eres2net_base | eres2net_large |
        eres2net_huge | campplus | ecapa | resnet34 | res2net | xvector
"""

import json
import sys
import time

import numpy as np

SEG_SECONDS = 3.0
SAMPLE_RATE = 16000
ITERS = 20


def build_model(name):
    if name == "eres2netv2":
        from speaker3d_tpu.models.eres2netv2 import ERes2NetV2
        return ERes2NetV2(feat_dim=80, embedding_size=192)
    if name == "eres2netv2_w24s4ep4":
        from speaker3d_tpu.models.eres2netv2 import eres2netv2_w24s4ep4
        return eres2netv2_w24s4ep4(feat_dim=80, embedding_size=192)
    if name == "eres2net_base":
        from speaker3d_tpu.models.eres2net import eres2net_base
        return eres2net_base(feat_dim=80, embedding_size=192)
    if name == "eres2net_large":
        from speaker3d_tpu.models.eres2net import eres2net_large
        return eres2net_large(feat_dim=80, embedding_size=192)
    if name == "eres2net_huge":
        from speaker3d_tpu.models.eres2net import eres2net_huge
        return eres2net_huge(feat_dim=80, embedding_size=192)
    if name == "campplus":
        from speaker3d_tpu.models.campplus import CAMPPlus
        return CAMPPlus(feat_dim=80, embedding_size=512)
    if name == "ecapa":
        from speaker3d_tpu.models.ecapa_tdnn import ECAPA_TDNN
        return ECAPA_TDNN(input_size=80, lin_neurons=192)
    if name == "resnet34":
        from speaker3d_tpu.models.resnet import ResNet
        return ResNet(feat_dim=80, embedding_size=256)
    if name == "res2net":
        from speaker3d_tpu.models.res2net import Res2Net
        return Res2Net(feat_dim=80, embedding_size=192)
    if name == "xvector":
        from speaker3d_tpu.models.xvector import Xvector
        return Xvector(feat_dim=80)
    raise SystemExit(f"unknown model {name!r}")


def embed_dim(model, default: int = 192) -> int:
    """Embedding width across the backbone zoo's differing field names."""
    for field in ("embedding_size", "lin_neurons", "embed_dim"):
        if hasattr(model, field):
            return getattr(model, field)
    return default


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "eres2netv2"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    model = build_model(name)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    seg = int(SEG_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((batch, seg)) * 0.1)
                       .astype(np.float32))

    feats0 = np.asarray(fbank(wavs[:1]))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def run(w):
        def body(i, acc):
            wi = w * (1.0 + i.astype(jnp.float32) * 1e-6)
            emb = model.apply(variables, fbank(wi).astype(jnp.bfloat16))
            return acc + jnp.sum(jnp.square(emb.astype(jnp.float32)))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    t0 = time.perf_counter()
    _ = float(run(wavs))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    checksum = float(run(wavs))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    print(json.dumps({
        "model": name, "params_m": round(n_params / 1e6, 2), "batch": batch,
        "audio_s_per_s": round(batch * SEG_SECONDS * ITERS / elapsed, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":  # exec(open(...)) in `python -c` hits this too
    main()
