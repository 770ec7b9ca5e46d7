"""Speaker-attributed transcription (reference: egs/3dspeaker/
speaker-diarization/local/out_transcription.py semantics)."""

import json
import os

import numpy as np


ASR = {
    "text": "你好。今天天气不错！",
    "raw_text": "你好 今天 天气 不错",
    "timestamp": [[0.0, 0.5], [1.5, 1.9], [1.9, 2.3], [2.3, 2.8]],
}
FIELDS = [[0.0, 1.0, 0], [1.4, 3.0, 1]]


def test_words_to_sentences_and_attribution():
    from speaker3d_tpu.diar.transcribe import (
        attribute_transcript,
        words_to_sentences,
    )

    sents = words_to_sentences(ASR["text"], ASR["raw_text"], ASR["timestamp"])
    assert len(sents) == 2
    assert sents[0] == [["你好。", [0.0, 0.5]]]
    assert [w[0] for w in sents[1]] == ["今天", "天气", "不错！"]

    utts = attribute_transcript(ASR, FIELDS)
    assert utts == [["你好。", [0.0, 0.5], 0],
                    ["今天天气不错！", [1.5, 2.8], 1]]


def test_attribution_fallbacks_and_ms_timestamps():
    from speaker3d_tpu.diar.transcribe import attribute_transcript

    # millisecond timestamps are auto-detected and rescaled
    asr_ms = dict(ASR, timestamp=[[a * 1000, b * 1000]
                                  for a, b in ASR["timestamp"]])
    assert attribute_transcript(asr_ms, FIELDS) == attribute_transcript(
        ASR, FIELDS)

    # a word overlapping no field keeps the previous speaker
    asr2 = {"text": "你好。后记",
            "raw_text": "你好 后记",
            "timestamp": [[0.0, 0.5], [9.0, 9.5]]}
    utts = attribute_transcript(asr2, [[0.0, 1.0, 3]])
    assert [u[2] for u in utts] == [3, 3]

    # malformed text/raw_text pairing -> [] (reference: warn-and-skip)
    bad = dict(ASR, raw_text="完全 不同 的 词")
    assert attribute_transcript(bad, FIELDS) == []


def test_transcribe_cli(tmp_path):
    from speaker3d_tpu.cli.transcribe_diarization import main

    rttm_dir = os.path.join(tmp_path, "rttm")
    asr_dir = os.path.join(tmp_path, "asr")
    out_dir = os.path.join(tmp_path, "out")
    os.makedirs(rttm_dir)
    os.makedirs(asr_dir)
    with open(os.path.join(rttm_dir, "rec1.rttm"), "w") as f:
        f.write("SPEAKER rec1 0 0.000 1.000 <NA> <NA> 0 <NA> <NA>\n")
        f.write("SPEAKER rec1 0 1.400 1.600 <NA> <NA> 1 <NA> <NA>\n")
    with open(os.path.join(asr_dir, "rec1.json"), "w") as f:
        json.dump(ASR, f)
    # an rttm without ASR json is skipped with a warning, not an error
    with open(os.path.join(rttm_dir, "rec2.rttm"), "w") as f:
        f.write("SPEAKER rec2 0 0.000 1.000 <NA> <NA> 0 <NA> <NA>\n")

    rc = main(["--rttm_dir", rttm_dir, "--asr_dir", asr_dir,
               "--out_dir", out_dir])
    assert rc == 0
    lines = open(os.path.join(out_dir, "rec1.txt")).read().splitlines()
    assert lines == ["0: [0.000 0.500] 你好。",
                     "1: [1.500 2.800] 今天天气不错！"]
    assert not os.path.exists(os.path.join(out_dir, "rec2.txt"))


def test_leading_words_inherit_first_real_speaker():
    """Words before any RTTM segment keep the first real (string) speaker
    instead of a fabricated int 0 (regression)."""
    from speaker3d_tpu.diar.transcribe import attribute_transcript

    asr = {"text": "早。后记", "raw_text": "早 后记",
           "timestamp": [[0.0, 0.3], [5.0, 5.4]]}
    utts = attribute_transcript(asr, [[4.5, 6.0, "spkA"]])
    assert [u[2] for u in utts] == ["spkA"] or \
        [u[2] for u in utts] == ["spkA", "spkA"]
