import numpy as np

from speaker3d_tpu.diar.vad import (
    EnergyVAD,
    flags_to_intervals,
    flags_to_mask,
    mask_to_intervals,
    merge_vad,
    post_process_speech_flags,
    refine_vad_boundaries_with_energy,
)


def test_energy_vad_detects_speech():
    fs = 16000
    rng = np.random.default_rng(0)
    sil = rng.standard_normal(fs) * 0.001
    speech = np.sin(2 * np.pi * 200 * np.arange(fs) / fs) * 0.3
    wav = np.concatenate([sil, speech, sil]).astype(np.float32)
    flags, _ = EnergyVAD(fs)(wav)
    flags = np.array(flags)
    n = len(flags)
    assert flags[: n // 3 - 2].mean() < 0.1
    assert flags[n // 3 + 2: 2 * n // 3 - 2].mean() > 0.9
    assert flags[2 * n // 3 + 2:].mean() < 0.1


def test_post_process_fills_gaps_and_drops_short():
    # 16ms frames: 300ms silence = 18 frames fillable; 200ms speech = 12 frames
    flags = [1] * 20 + [0] * 10 + [1] * 20  # 160ms gap -> filled
    out = post_process_speech_flags(flags)
    assert out[20:30].all()

    flags = [0] * 20 + [1] * 5 + [0] * 40  # 80ms speech -> dropped
    out = post_process_speech_flags(flags)
    assert not out.any()

    flags = [1] * 30 + [0] * 40 + [1] * 30  # 640ms gap -> NOT filled
    out = post_process_speech_flags(flags)
    assert not out[35:65].any()


def test_mask_interval_roundtrip():
    fs = 16000
    mask = np.zeros(fs, np.float32)
    mask[1600:4800] = 1
    mask[8000:12000] = 1
    ivs = mask_to_intervals(mask, fs)
    assert np.allclose(ivs, [[0.1, 0.3], [0.5, 0.75]])


def test_flags_to_mask_and_intervals():
    fs, hop = 16000, 256
    flags = [0, 1, 1, 0, 1]
    mask = flags_to_mask(flags, 5 * hop, hop)
    assert mask[hop:3 * hop].all() and not mask[:hop].any()
    ivs = flags_to_intervals(flags, 5 * hop, hop, fs)
    assert len(ivs) == 2


def test_merge_vad():
    out = merge_vad([[0, 1], [2, 3]], [[0.5, 2.5]])
    assert out == [[0, 3]]


def test_energy_refinement_contract():
    # Reference semantics (bin/infer_diarization.py:386-457): the per-sample
    # "frame energy" is built with overlap-max accumulation over half-
    # overlapping windows, i.e. env[i] is a RUNNING MAX that never decreases
    # along the file. Consequence (faithfully reproduced): the forward
    # contraction either finds env[start] < thr (trims nothing, i == start)
    # or never finds a below-threshold sample (monotone env), so the
    # refinement leaves boundaries effectively unchanged, modulo a one-sample
    # tail trim for all-quiet segments that the re-expansion then refills.
    fs = 16000
    t = lambda n: np.sin(2 * np.pi * 300 * np.arange(n) / fs).astype(np.float32)
    mask = np.zeros(fs, np.float32)
    mask[1600:14400] = 1

    # head click + gap + body: running-max env keeps the whole segment above
    # threshold -> boundaries unchanged
    wav = np.zeros(fs, np.float32)
    wav[1600:2400] = 0.5 * t(800)
    wav[3200:12800] = 0.5 * t(9600)
    refined = refine_vad_boundaries_with_energy(wav, mask, fs,
                                                energy_threshold=0.001)
    assert mask_to_intervals(refined, fs) == [[0.1, 0.9]]

    # quiet head: env[start] < thr -> i == start -> still no trim
    wav2 = np.zeros(fs, np.float32)
    wav2[3200:12800] = 0.5 * t(9600)
    refined2 = refine_vad_boundaries_with_energy(wav2, mask, fs,
                                                 energy_threshold=0.001)
    ivs2 = mask_to_intervals(refined2, fs)
    assert abs(ivs2[0][0] - 0.1) < 0.01
