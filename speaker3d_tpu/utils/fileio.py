"""File IO: audio loading, Kaldi-style lists, trial/transcript formats.

Behavioral contract (reference: speakerlab/utils/fileio.py): CSV dataset index
keyed by 'ID', wav.scp / utt2spk maps, trans7time (spk st ed text) lists, json
helpers, and ``load_audio`` (path / ndarray input, int16 -> float / 32768,
multi-channel mean, resample to target rate).

Audio decode here is stdlib ``wave`` + numpy for PCM WAV (torchaudio is not
part of this stack); resampling is polyphase via scipy. Decoding is host-side
data-plane work feeding the device pipeline.
"""

from __future__ import annotations

import csv
import json
import os
import wave
from typing import Optional

import numpy as np


def load_yaml(path):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def load_data_csv(fpath):
    """CSV index keyed by mandatory unique 'ID' column.
    (reference: utils/fileio.py:19-35)"""
    with open(fpath, newline="") as f:
        result = {}
        reader = csv.DictReader(f, skipinitialspace=True)
        for row in reader:
            if "ID" not in row:
                raise KeyError("CSV file must have an 'ID' field with unique ids.")
            data_id = row.pop("ID")
            if data_id in result:
                raise ValueError(f"Duplicate id: {data_id}")
            result[data_id] = row
    return result


def load_data_list(fpath):
    with open(fpath) as f:
        return {idx: line.strip() for idx, line in enumerate(f)}


def load_wav_scp(fpath):
    with open(fpath) as f:
        rows = [line.strip().split(None, 1) for line in f if line.strip()]
    return {k: v for k, v in rows}


def load_utt2spk(fpath):
    return load_wav_scp(fpath)


def write_wav_scp(fpath, wav_scp):
    with open(fpath, "w") as f:
        for key, value in wav_scp.items():
            f.write(f"{key} {value}\n")


def load_json_file(path):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def write_json_file(path, data):
    assert str(path).lower().endswith(".json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, ensure_ascii=False)


def load_trans7time_list(path):
    """Lines of `spk_id start end [text...]`. (reference: fileio.py:58-81)"""
    out = []
    with open(path) as f:
        for index, line in enumerate(f):
            item = line.strip().split()
            if not item:
                continue
            if len(item) <= 2:
                raise ValueError(f"{path}: item {index} = {item}")
            text = "" if len(item) == 3 else "".join(item[3:])
            out.append((item[0], float(item[1]), float(item[2]), text))
    return out


def write_trans7time_list(path, trans7time_list):
    with open(path, "w") as f:
        for spk_id, st, ed, text in trans7time_list:
            text = str(text).replace("\n", "").replace("\r", "")
            f.write(f"{spk_id} {st} {ed} {text}\n")


def _pcm_to_float(raw: bytes, sampwidth: int, n_channels: int, path):
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth} ({path})")
    return data.reshape(-1, n_channels).T


def read_wav(path):
    """Decode a PCM WAV file -> (float32 [channels, n] in [-1, 1], rate).

    Fast path: one read + direct RIFF chunk parse (the stdlib ``wave``
    module's per-chunk reads are a measurable loader cost at
    128 files/batch); the ``wave`` module remains the fallback for any
    layout the parser does not recognize, preserving its error behavior.
    """
    with open(path, "rb") as f:
        buf = f.read()
    try:
        if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError("not RIFF/WAVE")
        pos, end = 12, len(buf)
        fmt = None
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            body = pos + 8
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("short fmt chunk")
                audio_format = int.from_bytes(buf[body:body + 2], "little")
                n_channels = int.from_bytes(buf[body + 2:body + 4], "little")
                rate = int.from_bytes(buf[body + 4:body + 8], "little")
                bits = int.from_bytes(buf[body + 14:body + 16], "little")
                if audio_format != 1 or n_channels < 1 or bits % 8:
                    raise ValueError("non-PCM or odd fmt")  # wave fallback
                fmt = (n_channels, rate, bits // 8)
            elif cid == b"data":
                if fmt is None:
                    raise ValueError("data before fmt")
                n_channels, rate, sampwidth = fmt
                nbytes = min(size, end - body)
                frame = sampwidth * n_channels
                nbytes -= nbytes % frame
                raw = buf[body:body + nbytes]
                return _pcm_to_float(raw, sampwidth, n_channels, path), rate
            pos = body + size + (size & 1)
        raise ValueError("no data chunk")
    except ValueError:
        pass
    import io

    with wave.open(io.BytesIO(buf)) as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        sampwidth = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    return _pcm_to_float(raw, sampwidth, n_channels, path), rate


def write_wav(path, wav, rate=16000):
    """Write mono/float [-1,1] (or [C, n]) as 16-bit PCM WAV."""
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None]
    pcm = np.clip(wav.T * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(wav.shape[0])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def resample(wav, orig_rate: int, new_rate: int):
    """Polyphase resampling (host-side; native kernel when built, scipy
    fallback — outputs match within float32 reassociation)."""
    if orig_rate == new_rate:
        return wav
    from math import gcd

    g = gcd(orig_rate, new_rate)
    up, down = new_rate // g, orig_rate // g
    from speaker3d_tpu.data.resample import out_len, resample_poly_segment

    wav = np.asarray(wav)
    n_out = out_len(wav.shape[-1], up, down)
    if wav.ndim == 1:
        return resample_poly_segment(wav, up, down, 0, n_out)
    flat = wav.reshape(-1, wav.shape[-1])
    out = np.stack([resample_poly_segment(ch, up, down, 0, n_out)
                    for ch in flat])
    return out.reshape(wav.shape[:-1] + (n_out,))


def load_audio(input, ori_fs: Optional[int] = None, obj_fs: Optional[int] = None):
    """Universal audio loader -> float32 [1, n] mono.
    (reference: utils/fileio.py:105-129)"""
    if isinstance(input, (str, os.PathLike)):
        wav, fs = read_wav(os.fspath(input))
        wav = wav.mean(axis=0, keepdims=True)
        if obj_fs is not None and fs != obj_fs:
            wav = resample(wav, fs, obj_fs)
        return wav
    wav = np.asarray(input)
    if wav.dtype in (np.int16, np.int32, np.int64):
        wav = wav.astype(np.float32) / 32768.0
    wav = wav.astype(np.float32)
    assert wav.ndim <= 2
    if wav.ndim == 2:
        if wav.shape[0] > wav.shape[1]:
            wav = wav.T
        wav = wav.mean(axis=0, keepdims=True)
    else:
        wav = wav[None]
    if ori_fs is not None and obj_fs is not None and ori_fs != obj_fs:
        wav = resample(wav, ori_fs, obj_fs)
    return wav
