"""Embedding serving daemon: micro-batching engine + socket protocol
(new capability — the reference deployment runtime is a one-shot CLI)."""

import os
import threading

import numpy as np
import pytest

FS = 16000


@pytest.fixture(scope="module")
def embed_fn():
    """Deterministic stand-in embedder: per-sample fbank stats -> [D]."""
    import jax

    from speaker3d_tpu.eval.embedding import build_feature_fn

    feat_fn = build_feature_fn(mean_norm=False)

    @jax.jit
    def fn(wavs):
        feats = feat_fn(wavs)
        return jax.numpy.concatenate(
            [feats.mean(axis=1), feats.std(axis=1)], axis=-1)

    return fn


def test_engine_batching_and_chunk_mean(embed_fn):
    from speaker3d_tpu.serve import EmbeddingServer

    rng = np.random.default_rng(0)
    srv = EmbeddingServer(embed_fn, batch_size=4, max_wait_ms=5.0)
    try:
        short = (0.1 * rng.standard_normal(3 * FS)).astype(np.float32)
        long = (0.1 * rng.standard_normal(23 * FS)).astype(np.float32)
        futs = [srv.submit(short), srv.submit(long), srv.submit(short)]
        out = [f.result(timeout=120) for f in futs]
        assert out[0].shape == out[1].shape
        np.testing.assert_allclose(out[0], out[2], rtol=1e-5, atol=1e-5)

        # chunk-mean semantics match the batch-extraction reference path
        from speaker3d_tpu.diar.pipeline import circle_pad

        chunk = int(10 * FS)
        chunks = np.stack([circle_pad(long[s:s + chunk], chunk)
                           for s in range(0, len(long), chunk)])
        want = np.asarray(embed_fn(np.concatenate(
            [chunks, np.zeros((1, chunk), np.float32)]))[: len(chunks)])
        np.testing.assert_allclose(out[1], want.mean(axis=0),
                                   rtol=1e-4, atol=1e-4)

        with pytest.raises(Exception):
            srv.submit(np.zeros(0, np.float32)).result(timeout=5)
    finally:
        srv.close()


def test_socket_server_end_to_end(embed_fn, tmp_path):
    from speaker3d_tpu.serve import request_embedding, serve
    from speaker3d_tpu.utils.fileio import write_wav

    sock = os.path.join(tmp_path, "emb.sock")
    ready = threading.Event()
    holder = []
    t = threading.Thread(
        target=serve,
        kwargs=dict(embed_fn=embed_fn, unix_socket=sock, batch_size=4,
                    max_wait_ms=5.0, ready_event=ready,
                    server_holder=holder),
        daemon=True)
    t.start()
    assert ready.wait(timeout=60)
    try:
        rng = np.random.default_rng(1)
        wav = (0.1 * rng.standard_normal(2 * FS)).astype(np.float32)
        p = os.path.join(tmp_path, "a.wav")
        write_wav(p, wav, FS)

        e_file = request_embedding(sock, wav_path=p, req_id="f")
        e_pcm = request_embedding(sock, pcm=wav, req_id="p")
        assert e_file.shape == e_pcm.shape
        # int16 round trip perturbs near-empty log-mel bins; cosine is the
        # right invariant for embeddings
        cos = float(np.dot(e_file, e_pcm)
                    / (np.linalg.norm(e_file) * np.linalg.norm(e_pcm)))
        assert cos > 0.9999, cos

        # errors come back as protocol errors, not dropped connections
        with pytest.raises(RuntimeError):
            request_embedding(sock, wav_path="/does/not/exist.wav",
                              req_id="e")

        # concurrent clients micro-batch into one dispatch
        results = {}

        def client(k):
            results[k] = request_embedding(sock, pcm=wav, req_id=str(k))

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert len(results) == 4
        for v in results.values():
            np.testing.assert_allclose(v, e_pcm, rtol=1e-4, atol=1e-4)
    finally:
        holder[0].shutdown()


def test_engine_bucketed_requests(embed_fn):
    """bucket_seconds: short requests embed at their smallest holding
    bucket; results match the direct per-bucket computation (same plan as
    cli/extract --buckets / the native AOT engine)."""
    from speaker3d_tpu.diar.pipeline import circle_pad
    from speaker3d_tpu.serve import EmbeddingServer

    rng = np.random.default_rng(1)
    srv = EmbeddingServer(embed_fn, batch_size=4, max_wait_ms=5.0,
                          bucket_seconds=[1.5, 3.0, 6.0, 10.0])
    try:
        reqs = {
            "tiny": (0.1 * rng.standard_normal(1 * FS)).astype(np.float32),
            "mid": (0.1 * rng.standard_normal(4 * FS)).astype(np.float32),
            "long": (0.1 * rng.standard_normal(13 * FS)).astype(np.float32),
        }
        futs = {k: srv.submit(w) for k, w in reqs.items()}
        out = {k: f.result(timeout=120) for k, f in futs.items()}

        def emb(w, pad_s):
            p = circle_pad(w, int(pad_s * FS))
            return np.asarray(embed_fn(p[None]))[0]

        np.testing.assert_allclose(out["tiny"], emb(reqs["tiny"], 1.5),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out["mid"], emb(reqs["mid"], 6.0),
                                   rtol=1e-4, atol=1e-4)
        chunk = int(10 * FS)
        want = np.mean([emb(reqs["long"][:chunk], 10.0),
                        emb(reqs["long"][chunk:], 3.0)], axis=0)
        np.testing.assert_allclose(out["long"], want, rtol=1e-4, atol=1e-4)
    finally:
        srv.close()


def test_leftover_chunks_keep_their_deadline(embed_fn):
    """A burst larger than batch_size must drain within ~one max_wait:
    queued items carry their ENQUEUE timestamps, so the leftover after a
    full-batch dispatch must NOT restart the wait clock (ADVICE r3 — the
    old per-bucket timer reset allowed up to 2x max_wait)."""
    import time

    from speaker3d_tpu.serve import EmbeddingServer

    rng = np.random.default_rng(3)
    srv = EmbeddingServer(embed_fn, batch_size=4, max_wait_ms=300.0)
    try:
        srv.embed(rng.standard_normal(FS).astype(np.float32))  # warm compile
        # 6 one-chunk requests: one full batch of 4 dispatches immediately,
        # the 2 leftovers must flush at ~max_wait, not 2x
        wavs = [(0.1 * rng.standard_normal(FS)).astype(np.float32)
                for _ in range(6)]
        t0 = time.monotonic()
        futs = [srv.submit(w) for w in wavs]
        for f in futs:
            f.result(timeout=30)
        elapsed = time.monotonic() - t0
        assert elapsed < 0.55, (
            f"burst drained in {elapsed:.3f}s; leftover chunks waited past "
            f"their original deadline (max_wait=0.3)")
    finally:
        srv.close()
