"""Data-parallel embedding extraction == single-device extraction."""

import jax
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_embedding_matches_single_device():
    from speaker3d_tpu.eval.embedding import (
        build_embedding_fn,
        build_sharded_embedding_fn,
    )
    from speaker3d_tpu.models.xvector import Xvector

    model = Xvector(feat_dim=80, hid_dim=16, stats_dim=32, embed_dim=16)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((16, 8000)) * 0.1).astype(np.float32)

    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    np.asarray(fbank(wavs[:1])))

    single = build_embedding_fn(model, variables, precision="highest")
    mesh = make_mesh(8, 1)
    sharded = build_sharded_embedding_fn(model, variables, mesh,
                                         precision="highest")
    a = np.asarray(single(wavs))
    b = np.asarray(sharded(wavs))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_bucketed_chunked_extraction_semantics(tmp_path):
    """--buckets: full chunks behave exactly like the default path; the
    final partial chunk circle-pads to its smallest holding bucket (the
    same plan the native AOT engine executes; eval/chunking.py)."""
    from speaker3d_tpu.cli.extract import extract_embeddings
    from speaker3d_tpu.diar.pipeline import circle_pad
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.models.xvector import Xvector
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.fileio import write_wav

    fs = 16000
    model = Xvector(feat_dim=80, hid_dim=16, stats_dim=32, embed_dim=16)
    rng = np.random.default_rng(0)
    fbank = KaldiFbank(FbankConfig(), mean_norm=True)
    probe = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    np.asarray(fbank(probe)))
    embed_fn = build_embedding_fn(model, variables, precision="highest")

    wavs = {
        "short": (rng.standard_normal(int(1.2 * fs)) * 0.1),  # < smallest
        "mid": (rng.standard_normal(int(4.0 * fs)) * 0.1),    # 3 < x < 6
        "exact": (rng.standard_normal(int(10.0 * fs)) * 0.1),  # == chunk
        "long": (rng.standard_normal(int(13.0 * fs)) * 0.1),  # chunk+3s
    }
    scp = {}
    for k, w in wavs.items():
        p = str(tmp_path / f"{k}.wav")
        write_wav(p, w.astype(np.float32), fs)
        scp[k] = p

    buckets = [1.5, 3.0, 6.0, 10.0]
    got = extract_embeddings(embed_fn, scp, mode="chunked", batch_size=4,
                             bucket_seconds=buckets)

    def emb_of(wav, pad_s):
        return np.asarray(embed_fn(
            circle_pad(wav.astype(np.float32),
                       int(pad_s * fs))[None]))[0]

    # quantized wav (write/read roundtrip) -> reload for exact reference
    from speaker3d_tpu.utils.fileio import read_wav

    for k, pads in [("short", [1.5]), ("mid", [6.0]), ("exact", [10.0]),
                    ("long", [10.0, 3.0])]:
        w, _ = read_wav(scp[k])
        w = w[0]
        chunk = int(10.0 * fs)
        pieces = [w[i * chunk:(i + 1) * chunk] for i in range(len(pads))]
        want = np.mean([emb_of(p, s) for p, s in zip(pieces, pads)], axis=0)
        np.testing.assert_allclose(got[k], want, atol=1e-5, err_msg=k)

    # an exactly-chunk-length utterance matches the bucketless default
    default = extract_embeddings(embed_fn, {"exact": scp["exact"]},
                                 mode="chunked", batch_size=4)
    np.testing.assert_allclose(got["exact"], default["exact"], atol=1e-6)
