"""SSL embedding extraction CLI.

Behavioral contract (reference: speakerlab/bin/extract_ssl.py): load the SSL
checkpoint's TEACHER state and embed via the teacher BACKBONE only (:91);
features are linear mel-spectrograms (the SSL backbone does log + instance
norm itself); write .npz embedding archives sharded by process.

Usage:
  python -m speaker3d_tpu.cli.extract_ssl --exp_dir exp/rdino \
      --data wav.scp --out_dir exp/rdino/embeddings [--variant rdino]
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
    from speaker3d_tpu.eval.scoring import save_embeddings
    from speaker3d_tpu.ops.melspec import MelSpecConfig, MelSpectrogram
    from speaker3d_tpu.parallel.mesh import process_rank, process_shard
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.config import build_config
    from speaker3d_tpu.utils.fileio import load_audio, load_wav_scp

    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--variant", choices=["rdino", "sdpn"], default="rdino")
    args = p.parse_args(argv)

    config = build_config(os.path.join(args.exp_dir, "config.yaml"))
    model = build_ssl_model(args.variant, config)
    states = Checkpointer(os.path.join(args.exp_dir, "models")
                          ).recover_if_possible()
    if states is None or "ssl_state" not in states:
        raise FileNotFoundError(f"no SSL checkpoint under {args.exp_dir}")
    teacher = states["ssl_state"]["teacher"]

    melspec = MelSpectrogram(MelSpecConfig(n_mels=config.get("n_mels", 80)))

    @jax.jit
    def embed(wav):
        feats = melspec(wav[None])
        # teacher BACKBONE only (reference: extract_ssl.py:91)
        emb = model.backbone.apply(
            {"params": teacher["params"]["backbone"],
             "batch_stats": teacher["batch_stats"].get("backbone", {})},
            feats)
        return emb[0]

    wav_scp = load_wav_scp(args.data)
    out = {}
    for utt in process_shard(sorted(wav_scp)):
        wav = load_audio(wav_scp[utt], obj_fs=16000)[0]
        out[utt] = np.asarray(embed(wav))
    os.makedirs(args.out_dir, exist_ok=True)
    save_embeddings(os.path.join(
        args.out_dir, f"embeddings_{process_rank()}.npz"), out)
    print(f"wrote {len(out)} teacher-backbone embeddings")


if __name__ == "__main__":
    main()
