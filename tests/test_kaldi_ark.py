"""Native Kaldi binary ark/scp codec (utils/kaldi_ark.py)."""

import os
import struct

import numpy as np
import pytest

from speaker3d_tpu.utils.kaldi_ark import (
    iter_ark,
    read_ark,
    read_scp,
    write_ark_scp,
)


def _data(rng, n=5, dim=192):
    return {f"utt{i}": rng.standard_normal(dim).astype(np.float32)
            for i in range(n)}


def test_roundtrip_vectors(tmp_path):
    rng = np.random.default_rng(0)
    data = _data(rng)
    ark = os.path.join(tmp_path, "e.ark")
    scp = os.path.join(tmp_path, "e.scp")
    write_ark_scp(ark, data, scp)
    back = read_ark(ark)
    assert list(back) == list(data)
    for k in data:
        np.testing.assert_array_equal(back[k], data[k])
    # scp random access yields the same values
    via_scp = read_scp(scp)
    for k in data:
        np.testing.assert_array_equal(via_scp[k], data[k])


def test_roundtrip_matrix_and_mixed(tmp_path):
    rng = np.random.default_rng(1)
    data = {"m": rng.standard_normal((7, 80)).astype(np.float32),
            "v": rng.standard_normal(192).astype(np.float32)}
    ark = os.path.join(tmp_path, "m.ark")
    write_ark_scp(ark, data)
    back = read_ark(ark)
    assert back["m"].shape == (7, 80) and back["v"].shape == (192,)
    np.testing.assert_array_equal(back["m"], data["m"])


def test_wire_format_exact(tmp_path):
    """Byte-level check against the Kaldi spec: 'key \\0BFV \\x04<dim>'."""
    v = np.arange(3, dtype=np.float32)
    ark = os.path.join(tmp_path, "w.ark")
    write_ark_scp(ark, {"k1": v})
    raw = open(ark, "rb").read()
    expect = (b"k1 " + b"\0B" + b"FV " + b"\x04" + struct.pack("<i", 3)
              + v.tobytes())
    assert raw == expect


def test_float64_input_written_as_float32(tmp_path):
    v64 = np.linspace(0, 1, 8, dtype=np.float64)
    ark = os.path.join(tmp_path, "d.ark")
    write_ark_scp(ark, {"a": v64})
    back = read_ark(ark)
    assert back["a"].dtype == np.float32
    np.testing.assert_allclose(back["a"], v64, atol=1e-7)


def test_iter_and_errors(tmp_path):
    ark = os.path.join(tmp_path, "x.ark")
    write_ark_scp(ark, {"a": np.zeros(2, np.float32)})
    assert [k for k, _ in iter_ark(ark)] == ["a"]
    bad = os.path.join(tmp_path, "bad.ark")
    with open(bad, "wb") as f:
        f.write(b"key \0Bzz ")
    with pytest.raises(ValueError):
        read_ark(bad)
    with pytest.raises(ValueError):
        write_ark_scp(os.path.join(tmp_path, "y.ark"),
                      {"t": np.zeros((2, 2, 2), np.float32)})


def test_scoring_loader_reads_ark(tmp_path):
    from speaker3d_tpu.eval.scoring import load_embeddings

    rng = np.random.default_rng(2)
    data = _data(rng, n=3)
    ark = os.path.join(tmp_path, "embedding_0.ark")
    scp = os.path.join(tmp_path, "embedding_0.scp")
    write_ark_scp(ark, data, scp)
    for src in (ark, scp, str(tmp_path)):
        got = load_embeddings(src)
        assert set(got) == set(data)
        np.testing.assert_array_equal(got["utt0"], data["utt0"])
