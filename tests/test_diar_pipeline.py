"""End-to-end diarization pipeline test on synthetic two-speaker audio.

Uses a lightweight spectral-shape embedding (mean log-mel) instead of a full
backbone so the test exercises the pipeline machinery (VAD, chunking,
batching, clustering, segment compression, RTTM) quickly; model correctness
is covered by the parity tests.
"""

import json
import os

import numpy as np

from speaker3d_tpu.diar import DiarizationPipeline, compute_der, load_rttm
from speaker3d_tpu.diar.pipeline import circle_pad, compressed_seg, sliding_chunks


def _mean_fbank_embed():
    from speaker3d_tpu.eval.embedding import build_feature_fn

    feat_fn = build_feature_fn(mean_norm=False)

    def embed(wavs):
        feats = np.asarray(feat_fn(wavs))
        # linear-mel mean: tonal "speakers" at different pitches become
        # near-orthogonal embeddings (cosine ~0 across, ~1 within)
        return np.exp(feats).mean(axis=1)

    return embed


def _two_speaker_wav(fs=16000):
    rng = np.random.default_rng(0)

    def tone(freq, dur, jitter):
        t = np.arange(int(dur * fs)) / fs
        sig = np.sin(2 * np.pi * freq * t)
        sig += 0.3 * np.sin(2 * np.pi * 2 * freq * t + 1.0)
        return (0.3 * sig + jitter * rng.standard_normal(len(t))).astype(
            np.float32)

    sil = np.zeros(int(0.8 * fs), np.float32)
    a1 = tone(220, 4.0, 0.01)
    b1 = tone(2000, 4.0, 0.01)
    a2 = tone(220, 3.0, 0.01)
    wav = np.concatenate([sil, a1, sil, b1, sil, a2, sil])
    truth = [
        (0.8, 4.8, "A"),
        (5.6, 9.6, "B"),
        (10.4, 13.4, "A"),
    ]
    return wav, truth, fs


def test_circle_pad():
    x = np.array([1.0, 2.0, 3.0])
    assert np.allclose(circle_pad(x, 7), [1, 2, 3, 1, 2, 3, 1])
    assert np.allclose(circle_pad(x, 2), [1, 2])


def test_sliding_chunks():
    chunks = sliding_chunks(0.0, 3.0, 1.5, 0.75)
    assert chunks[0] == [0.0, 1.5]
    assert chunks[1] == [0.75, 2.25]
    assert chunks[-1][1] == 3.0
    # short segment -> single chunk with true boundaries
    assert sliding_chunks(0.0, 0.5, 1.5, 0.75) == [[0.0, 0.5]]
    assert sliding_chunks(1.0, 1.0, 1.5, 0.75) == []


def test_compressed_seg():
    segs = [[0, 1.5, 0], [0.75, 2.25, 0], [2.5, 4.0, 1]]
    out = compressed_seg(segs)
    assert out == [[0, 2.25, 0], [2.5, 4.0, 1]]
    # overlap between different speakers split at midpoint
    segs = [[0, 2.0, 0], [1.0, 3.0, 1]]
    out = compressed_seg(segs)
    assert out == [[0, 1.5, 0], [1.5, 3.0, 1]]


def test_pipeline_end_to_end(tmp_path):
    wav, truth, fs = _two_speaker_wav()
    pipe = DiarizationPipeline(_mean_fbank_embed(), sample_rate=fs,
                               batch_size=8)
    fields = pipe(wav)
    assert len(fields) >= 2
    n_spk = len({f[2] for f in fields})
    assert n_spk == 2, fields

    hyp = [(st, ed, str(spk)) for st, ed, spk in fields]
    r = compute_der(truth, hyp, collar=0.25)
    assert r.der < 0.15, (r, fields)

    # outputs
    rttm = os.path.join(tmp_path, "out.rttm")
    pipe.save_diar_output(rttm, wav_id="utt1")
    loaded = load_rttm(rttm)
    assert "utt1" in loaded and len(loaded["utt1"]) == len(fields)

    jpath = os.path.join(tmp_path, "out.json")
    pipe.save_diar_output(jpath, wav_id="utt1")
    with open(jpath) as f:
        data = json.load(f)
    assert len(data) == len(fields)

    meta = os.path.join(tmp_path, "out.meta.json")
    pipe.save_meta(meta, len(wav) / fs)
    with open(meta) as f:
        m = json.load(f)
    assert m["rtf"] > 0

    vadinfo = os.path.join(tmp_path, "out.vad_info.json")
    pipe.save_vad_info(vadinfo)
    with open(vadinfo) as f:
        v = json.load(f)
    assert len(v["refined"]) >= 2


def test_pipeline_empty_audio():
    pipe = DiarizationPipeline(_mean_fbank_embed(), batch_size=4)
    out = pipe(np.zeros(16000, np.float32))
    assert out == []


def test_pipeline_oracle_speaker_num():
    wav, truth, fs = _two_speaker_wav()
    from speaker3d_tpu.diar.cluster import CommonClustering

    pipe = DiarizationPipeline(
        _mean_fbank_embed(), sample_rate=fs, batch_size=8,
        cluster=CommonClustering("spectral", cluster_line=4, mer_cos=0.8))
    fields = pipe(wav, speaker_num=2)
    assert len({f[2] for f in fields}) == 2


def test_vad_plot(tmp_path):
    wav, truth, fs = _two_speaker_wav()
    pipe = DiarizationPipeline(_mean_fbank_embed(), sample_rate=fs,
                               batch_size=8)
    pipe(wav)
    out = os.path.join(tmp_path, "v.png")
    pipe.save_vad_plot(out, wav_1d=wav)
    assert os.path.getsize(out) > 1000
