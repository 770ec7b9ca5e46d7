"""Embedding parity against REAL pretrained reference checkpoints, when
present (zero-egress container: runs only if a modelscope snapshot exists
locally, e.g. under pretrained/ or the reference's save_* dirs).

The BASELINE gate: converted checkpoints must give embeddings within 1e-3
cosine drift of the torch model on the same features.
"""

import glob
import os
import sys

import numpy as np
import pytest

from tests.conftest import has_reference

sys.path.insert(0, "/root/reference")

CANDIDATE_DIRS = [
    "pretrained",
    "/root/reference/save_eres2netv2w24s4ep4/pretrained",
]


def _find_ckpt():
    from speaker3d_tpu.cli.registry import SUPPORTS

    for root in CANDIDATE_DIRS:
        for model_id, spec in SUPPORTS.items():
            for pat in [os.path.join(root, model_id, spec["model_pt"]),
                        os.path.join(root, "*", model_id, spec["model_pt"])]:
                hits = glob.glob(pat)
                if hits:
                    return model_id, hits[0]
    return None, None


MODEL_ID, CKPT = _find_ckpt()


@pytest.mark.skipif(CKPT is None, reason="no pretrained checkpoint present")
@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_pretrained_embedding_parity():
    import jax
    import torch

    from speaker3d_tpu.cli.registry import SUPPORTS, build_model
    from speaker3d_tpu.compat import load_into_model, load_torch_checkpoint

    # torch side
    import importlib

    spec = SUPPORTS[MODEL_ID]["model"]
    ref_obj = {
        "speaker3d_tpu.models.eres2netv2.ERes2NetV2":
            "speakerlab.models.eres2net.ERes2NetV2.ERes2NetV2",
        "speaker3d_tpu.models.eres2net.ERes2Net":
            "speakerlab.models.eres2net.ERes2Net.ERes2Net",
        "speaker3d_tpu.models.campplus.CAMPPlus":
            "speakerlab.models.campplus.DTDNN.CAMPPlus",
        "speaker3d_tpu.models.ecapa_tdnn.ECAPA_TDNN":
            "speakerlab.models.ecapa_tdnn.ECAPA_TDNN.ECAPA_TDNN",
    }[spec["obj"]]
    mod, cls = ref_obj.rsplit(".", 1)
    torch_cls = getattr(importlib.import_module(mod), cls)
    # map arg names back to torch spelling
    targs = dict(spec["args"])
    if "base_width" in targs:
        targs["baseWidth"] = targs.pop("base_width")
    tm = torch_cls(**targs)
    sd = load_torch_checkpoint(CKPT)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    tm.eval()

    fm = build_model(MODEL_ID)
    x = np.random.default_rng(0).standard_normal((2, 300, 80)).astype(np.float32)
    variables = load_into_model(fm, sd, x[:1])

    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(fm.apply)(variables, x))

    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 1 - 1e-3, cos
