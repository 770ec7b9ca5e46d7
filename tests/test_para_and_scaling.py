"""Paraformer LFR/CMVN parity + sharded affinity-matrix correctness."""

import sys

import jax
import numpy as np
import pytest

from tests.conftest import has_reference

sys.path.insert(0, "/root/reference")


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_lfr_matches_reference():
    import torch

    # import just the function without triggering the module-level cmvn load
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_para", "/root/reference/speakerlab/process/processor_para.py")
    # module import executes load_cmvn('pretrained/am.mvn') at top level —
    # replicate apply_lfr behavior against our impl via the source contract
    from speaker3d_tpu.data.processor_para import apply_lfr

    rng = np.random.default_rng(0)
    x = rng.standard_normal((23, 10)).astype(np.float32)

    # reference semantics re-implemented in torch for cross-check
    def ref_lfr(inputs, lfr_m, lfr_n):
        inputs = torch.from_numpy(inputs)
        LFR_inputs = []
        T = inputs.shape[0]
        T_lfr = int(np.ceil(T / lfr_n))
        left_padding = inputs[0].repeat((lfr_m - 1) // 2, 1)
        inputs = torch.vstack((left_padding, inputs))
        T = T + (lfr_m - 1) // 2
        for i in range(T_lfr):
            if lfr_m <= T - i * lfr_n:
                LFR_inputs.append(inputs[i * lfr_n:i * lfr_n + lfr_m].reshape(1, -1))
            else:
                num_padding = lfr_m - (T - i * lfr_n)
                frame = inputs[i * lfr_n:].reshape(-1)
                for _ in range(num_padding):
                    frame = torch.hstack((frame, inputs[-1]))
                LFR_inputs.append(frame.reshape(1, -1))
        return torch.vstack(LFR_inputs).numpy()

    for m, n in [(7, 6), (5, 3), (1, 1)]:
        want = ref_lfr(x, m, n)
        got = apply_lfr(x, m, n)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_cmvn_roundtrip(tmp_path):
    import os

    from speaker3d_tpu.data.processor_para import apply_cmvn, load_cmvn

    means = np.arange(4, dtype=np.float32)
    vars_ = np.arange(1, 5, dtype=np.float32)
    path = os.path.join(tmp_path, "am.mvn")
    with open(path, "w") as f:
        f.write("<Nnet>\n<AddShift> 4 4\n")
        f.write("<LearnRateCoef> 0 [ " + " ".join(map(str, means)) + " ]\n")
        f.write("<Rescale> 4 4\n")
        f.write("<LearnRateCoef> 0 [ " + " ".join(map(str, vars_)) + " ]\n")
        f.write("</Nnet>\n")
    cmvn = load_cmvn(path)
    np.testing.assert_allclose(cmvn[0], means)
    np.testing.assert_allclose(cmvn[1], vars_)
    x = np.ones((3, 4), np.float32)
    out = apply_cmvn(x, cmvn)
    np.testing.assert_allclose(out, (x + means) * vars_)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_affinity_matches_dense():
    from speaker3d_tpu.eval.scoring import pairwise_cosine_device
    from speaker3d_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((101, 32)).astype(np.float32)  # odd N -> padding
    dense = pairwise_cosine_device(emb)
    mesh = make_mesh(8, 1)
    sharded = pairwise_cosine_device(emb, mesh=mesh)
    assert sharded.shape == (101, 101)
    np.testing.assert_allclose(sharded, dense, atol=1e-5)
