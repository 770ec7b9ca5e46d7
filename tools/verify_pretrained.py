"""Verify converted pretrained checkpoints against the torch reference.

The BASELINE gate (BASELINE.md): converted reference checkpoints must give
embeddings within 1e-3 cosine drift. This container is zero-egress, so
checkpoints must exist locally (modelscope snapshot layout under
--local_model_dir). For every registry model with a present checkpoint:
load+convert, run both models on shared random features, report min cosine.

Usage: python tools/verify_pretrained.py [--local_model_dir pretrained]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

TORCH_OBJ = {
    "speaker3d_tpu.models.eres2netv2.ERes2NetV2":
        "speakerlab.models.eres2net.ERes2NetV2.ERes2NetV2",
    "speaker3d_tpu.models.eres2net.ERes2Net":
        "speakerlab.models.eres2net.ERes2Net.ERes2Net",
    "speaker3d_tpu.models.campplus.CAMPPlus":
        "speakerlab.models.campplus.DTDNN.CAMPPlus",
    "speaker3d_tpu.models.ecapa_tdnn.ECAPA_TDNN":
        "speakerlab.models.ecapa_tdnn.ECAPA_TDNN.ECAPA_TDNN",
}


def verify(model_id: str, ckpt_path: str) -> float:
    import importlib

    import jax
    import torch

    from speaker3d_tpu.cli.registry import SUPPORTS, build_model
    from speaker3d_tpu.compat import load_into_model, load_torch_checkpoint

    spec = SUPPORTS[model_id]["model"]
    # ERes2Net "huge"-block checkpoints need the huge module's block params
    obj = spec["obj"]
    ref_path = TORCH_OBJ[obj]
    if obj.endswith("eres2net.ERes2Net") and spec["args"].get("expansion") == 4:
        ref_path = "speakerlab.models.eres2net.ERes2Net_huge.ERes2Net"
    mod, cls = ref_path.rsplit(".", 1)
    torch_cls = getattr(importlib.import_module(mod), cls)
    targs = dict(spec["args"])
    for ours, theirs in [("base_width", "baseWidth")]:
        if ours in targs:
            targs[theirs] = targs.pop(ours)
    for drop in ("m_channels", "scale", "expansion"):
        pass  # torch ctors accept these names already where applicable
    tm = torch_cls(**{k: (list(v) if isinstance(v, tuple) else v)
                      for k, v in targs.items()})
    sd = load_torch_checkpoint(ckpt_path)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    tm.eval()

    fm = build_model(model_id)
    x = np.random.default_rng(0).standard_normal((2, 300, 80)).astype(np.float32)
    variables = load_into_model(fm, sd, x[:1])
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(fm.apply)(variables, x))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    return float(cos.min())


def main():
    from speaker3d_tpu.cli.registry import SUPPORTS

    p = argparse.ArgumentParser()
    p.add_argument("--local_model_dir", default="pretrained")
    args = p.parse_args()

    any_found = False
    for model_id, spec in SUPPORTS.items():
        hits = glob.glob(os.path.join(args.local_model_dir, model_id,
                                      spec["model_pt"]))
        if not hits:
            continue
        any_found = True
        try:
            cos = verify(model_id, hits[0])
            status = "OK" if cos > 1 - 1e-3 else "FAIL"
            print(f"{status} {model_id}: min cosine {cos:.6f}")
        except Exception as e:
            print(f"ERROR {model_id}: {type(e).__name__}: {e}")
    if not any_found:
        print(f"no checkpoints found under {args.local_model_dir}/ "
              f"(zero-egress container: place modelscope snapshots there)")


if __name__ == "__main__":
    main()
