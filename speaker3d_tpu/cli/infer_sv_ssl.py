"""SSL (SDPN/RDINO) pretrained single/pair SV inference CLI.

Behavioral contract (reference: speakerlab/bin/infer_sv_ssl.py): load an SSL
experiment's teacher backbone, embed wavs via linear mel-spectrogram
features, save .npy embeddings, print the cosine for a pair.

Usage:
  python -m speaker3d_tpu.cli.infer_sv_ssl --exp_dir exp/sdpn \
      --wavs a.wav b.wav [--variant sdpn] [--save_dir embs]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.cli.train_ssl import build_ssl_model
    from speaker3d_tpu.ops.melspec import MelSpecConfig, MelSpectrogram
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.config import build_config
    from speaker3d_tpu.utils.fileio import load_audio

    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--wavs", nargs="+", required=True)
    p.add_argument("--variant", choices=["rdino", "sdpn"], default="sdpn")
    p.add_argument("--save_dir", default=None)
    args = p.parse_args(argv)

    config = build_config(os.path.join(args.exp_dir, "config.yaml"))
    model = build_ssl_model(args.variant, config)
    states = Checkpointer(os.path.join(args.exp_dir, "models")
                          ).recover_if_possible()
    teacher = states["ssl_state"]["teacher"]
    melspec = MelSpectrogram(MelSpecConfig(n_mels=config.get("n_mels", 80)))

    @jax.jit
    def embed(wav):
        feats = melspec(wav[None])
        return model.backbone.apply(
            {"params": teacher["params"]["backbone"],
             "batch_stats": teacher["batch_stats"].get("backbone", {})},
            feats)[0]

    embs = []
    for wav_path in args.wavs:
        wav = load_audio(wav_path, obj_fs=16000)[0]
        emb = np.asarray(embed(wav))
        embs.append(emb)
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(wav_path))[0]
            np.save(os.path.join(args.save_dir, f"{base}.npy"), emb)

    if len(embs) == 2:
        a, b = embs
        score = float(np.dot(a, b)
                      / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        print(f"[INFO] cosine similarity: {score:.5f}")


if __name__ == "__main__":
    main()
