"""Device-resident diarization audio (r5): the waveform uploads once and
chunk slicing + circle-padding happen on device via an index gather.

Pins (vs the host slice/pad/stack path, which is the reference semantics —
bin/infer_diarization.py:621-639 + utils/utils.py:232-238):
- int16 wire: PCM16-representable audio ships as int16 and the device
  k/32768 reconstruction is BITWISE equal to the host float32 path;
- float32 wire: arbitrary float audio falls back to float32 and stays
  bitwise equal;
- edge semantics: empty chunks -> zero rows, batch padding rows -> dropped,
  over-length chunks (no_chunk bucket mode) -> truncation, leftovers ->
  circle-pad, all identical to the host path.
"""

import numpy as np
import pytest

from speaker3d_tpu.diar.pipeline import (
    WAV_SLAB, DiarizationPipeline, _gather_chunks_jit, _wire_quantize)

FS = 16000


def _identity_embed(wavs):
    # embeddings ARE the chunk waveforms: any slicing/padding deviation
    # from the host path shows up as a bitwise mismatch
    return np.asarray(wavs)


def _pcm16_wav(n, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.integers(-32768, 32768, size=n).astype(np.int16)
    return (k.astype(np.float32) / 32768.0)


def _pipe(**kw):
    kw.setdefault("batch_size", 4)
    return DiarizationPipeline(_identity_embed, **kw)


def test_wire_quantize_pcm16_roundtrip():
    w = _pcm16_wav(100000)
    q = _wire_quantize(w)
    assert q is not None and q.dtype == np.int16
    assert np.array_equal(q.astype(np.float32) / 32768.0, w)


def test_wire_quantize_rejects_floats():
    w = (np.random.default_rng(0).standard_normal(100000) * 0.1
         ).astype(np.float32)
    assert _wire_quantize(w) is None
    # prefix-exact but tail-inexact must be rejected (the full pass runs)
    w2 = _pcm16_wav(100000)
    w2[-1] = np.float32(0.123456)
    assert _wire_quantize(w2) is None
    # clipping-range violation rejected even if exactly k/32768
    w3 = _pcm16_wav(100000)
    w3[0] = np.float32(40000.0 / 32768.0)
    assert _wire_quantize(w3) is None


@pytest.mark.parametrize("wire", ["int16", "float32"])
def test_device_gather_matches_host_bitwise(wire):
    if wire == "int16":
        wav = _pcm16_wav(int(7.3 * FS))
    else:
        wav = (np.random.default_rng(1).standard_normal(int(7.3 * FS)) * 0.1
               ).astype(np.float32)
    pipe = _pipe()
    L = int(pipe.chunk_dur * FS)
    # full windows, a short leftover (circle-pad), an empty chunk, and
    # enough chunks to exercise batch padding
    chunks = [[0.0, 1.5], [0.75, 2.25], [1.5, 3.0], [6.9, 7.3],
              [2.0, 2.0], [3.0, 4.5], [4.0, 5.5]]
    bounds = [(int(st * FS), int(ed * FS)) for st, ed in chunks]
    dev = pipe.do_emb_extraction(chunks, wav)
    host = pipe._emb_extraction_host(bounds, wav, L)
    assert pipe.last_wire["dtype"] == wire
    assert np.array_equal(dev, host), (
        f"max diff {np.abs(dev - host).max()}")


def test_device_gather_overlength_truncates_like_host():
    # no_chunk_after_vad-style call: a 4 s segment buckets L up to 2*chunk
    wav = _pcm16_wav(int(6.0 * FS), seed=2)
    pipe = _pipe()
    chunks = [[0.5, 4.5], [5.0, 5.6]]
    bounds = [(int(st * FS), int(ed * FS)) for st, ed in chunks]
    L = 3 * int(pipe.chunk_dur * FS)  # ceil(4s / 1.5s) * 1.5s = 4.5 s
    dev = pipe.do_emb_extraction(chunks, wav)
    host = pipe._emb_extraction_host(bounds, wav, L)
    assert dev.shape == host.shape
    assert np.array_equal(dev, host)


def test_resident_upload_is_cached_per_object():
    wav = _pcm16_wav(int(2.0 * FS), seed=3)
    pipe = _pipe()
    d1 = pipe._resident_wav(wav)
    d2 = pipe._resident_wav(wav)
    assert d1 is d2
    d3 = pipe._resident_wav(wav.copy())
    assert d3 is not d1


def test_slab_padding_bounds_executable_count():
    wav = _pcm16_wav(WAV_SLAB + 17, seed=4)
    pipe = _pipe()
    dev = pipe._resident_wav(wav)
    assert dev.shape[0] == 2 * WAV_SLAB
    assert pipe.last_wire == {"dtype": "int16", "bytes": 2 * WAV_SLAB * 2}


def test_pow2_slab_bucket_pads_on_device_only():
    """3 host slabs bucket to 4 device slabs (power-of-two shape classes,
    so the fused gather+embed jit compiles O(log) times across a mixed-
    duration corpus) — but the WIRE ships only the 3 host slabs, and the
    gather over the padded wav stays bitwise equal to the host path."""
    wav = _pcm16_wav(2 * WAV_SLAB + 17, seed=8)
    pipe = _pipe()
    dev = pipe._resident_wav(wav)
    assert dev.shape[0] == 4 * WAV_SLAB  # device: next power-of-two
    assert pipe.last_wire == {"dtype": "int16", "bytes": 3 * WAV_SLAB * 2}
    dur = len(wav) / FS
    chunks = [[0.0, 1.5], [dur - 0.4, dur], [17.0, 18.5]]
    bounds = [(int(st * FS), int(ed * FS)) for st, ed in chunks]
    L = int(pipe.chunk_dur * FS)
    out = pipe.do_emb_extraction(chunks, wav)
    assert np.array_equal(out, pipe._emb_extraction_host(bounds, wav, L))


def test_gather_kernel_direct_edges():
    import jax.numpy as jnp

    gather = _gather_chunks_jit()
    wav = jnp.asarray(np.arange(32, dtype=np.float32))
    starts = np.asarray([0, 4, 10], np.int32)
    lens = np.asarray([3, 0, 8], np.int32)
    out = np.asarray(gather(wav, starts, lens, 6))
    assert np.array_equal(out[0], [0, 1, 2, 0, 1, 2])  # circle-pad
    assert np.array_equal(out[1], np.zeros(6))          # empty -> zeros
    assert np.array_equal(out[2], [10, 11, 12, 13, 14, 15])  # truncate-free


def test_numpy_embed_fn_latches_fused_fallback():
    """A non-traceable (numpy) embed_fn must fall back to the two-dispatch
    gather-then-embed path — once, latched for the pipeline's lifetime —
    and still produce host-bitwise results."""
    wav = _pcm16_wav(int(4.0 * FS), seed=6)
    pipe = _pipe()
    chunks = [[0.0, 1.5], [0.75, 2.25], [2.5, 4.0]]
    bounds = [(int(st * FS), int(ed * FS)) for st, ed in chunks]
    L = int(pipe.chunk_dur * FS)
    dev = pipe.do_emb_extraction(chunks, wav)
    assert pipe._fused_ok is False  # numpy embed fn cannot trace
    assert np.array_equal(dev, pipe._emb_extraction_host(bounds, wav, L))
    # second call goes straight to the fallback (no re-trace attempt)
    assert pipe._fused_embed(L) is None


def test_fused_gather_embed_matches_two_step():
    """A jax-traceable embed_fn takes the fused one-dispatch-per-batch
    path; embeddings must equal the explicit gather-then-embed two-step
    (same ops, float32, CPU-deterministic)."""
    import jax
    import jax.numpy as jnp

    wav = _pcm16_wav(int(6.1 * FS), seed=7)

    @jax.jit
    def embed(wavs):  # cheap traceable stand-in with a reduction
        x = wavs.reshape(wavs.shape[0], -1, 100)
        return jnp.sum(x * jnp.float32(0.25), axis=1)

    pipe = DiarizationPipeline(embed, batch_size=4)
    chunks = [[0.0, 1.5], [0.75, 2.25], [1.5, 3.0], [5.8, 6.1],
              [2.0, 2.0], [3.0, 4.5]]
    out_fused = pipe.do_emb_extraction(chunks, wav)
    assert getattr(pipe, "_fused_ok", None) is not False  # stayed fused
    assert pipe._fused_cache  # the fused jit was built and kept
    # force the two-step path on a fresh pipeline
    pipe2 = DiarizationPipeline(embed, batch_size=4)
    pipe2._fused_ok = False
    out_two = pipe2.do_emb_extraction(chunks, wav)
    assert np.array_equal(out_fused, out_two)


def test_chunked_extraction_int16_wire_bitwise(tmp_path, monkeypatch):
    """cli/extract's chunked path ships PCM16-exact batches as int16
    (r5): embeddings must be BITWISE equal to the float32 wire."""
    import speaker3d_tpu.cli.extract as extract_mod
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.models.xvector import Xvector
    from speaker3d_tpu.utils.fileio import write_wav

    import jax

    scp = {}
    rng = np.random.default_rng(5)
    for i in range(3):
        # PCM16 on disk; 13 s so the 10 s chunking engages (cap 90 s)
        w = (rng.integers(-2000, 2000, size=13 * FS)
             .astype(np.float32) / 32768.0)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, w, FS)
        scp[f"u{i}"] = p

    model = Xvector(feat_dim=80, hid_dim=8, stats_dim=16, embed_dim=8)
    feats0 = np.zeros((1, 20, 80), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats0)
    embed_fn = build_embedding_fn(model, variables, precision="highest")

    e_int16 = extract_mod.extract_embeddings(
        embed_fn, scp, mode="chunked", batch_size=4)
    monkeypatch.setattr(extract_mod, "wire_quantize", lambda w: None)
    e_f32 = extract_mod.extract_embeddings(
        embed_fn, scp, mode="chunked", batch_size=4)
    assert set(e_int16) == set(e_f32)
    for utt in e_f32:
        assert np.array_equal(e_int16[utt], e_f32[utt]), utt
