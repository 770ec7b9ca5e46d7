"""Closed-set label prediction + accuracy CLI (language identification).

Behavioral contract (reference: egs/3dspeaker/language-identification —
reuses the SV trainer with utt2lang labels, then predicts via the trained
classifier and reports accuracy, run.sh:60-66): load an experiment (backbone
+ cosine classifier weights from the train state), embed each wav, take the
argmax cosine class, and score accuracy against an utt2label file.

Usage:
  python -m speaker3d_tpu.cli.predict_label --exp_dir exp/lid \
      --data wav.scp [--utt2label utt2lang] [--out predictions.txt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.cli.extract import build_model_from_exp
    from speaker3d_tpu.data.processors import SpkLabelEncoder
    from speaker3d_tpu.ops.fbank import FbankConfig, KaldiFbank
    from speaker3d_tpu.utils.checkpoint import Checkpointer
    from speaker3d_tpu.utils.fileio import load_audio, load_wav_scp

    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data", required=True, help="wav.scp")
    p.add_argument("--utt2label", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    model, variables, config = build_model_from_exp(args.exp_dir)
    states = Checkpointer(os.path.join(args.exp_dir, "models")
                          ).recover_if_possible()
    cls_w = np.asarray(states["train_state"]["cls_w"])

    encoder = SpkLabelEncoder()
    encoder.load(os.path.join(args.exp_dir, "label_encoder.pkl"))
    n_real = len(encoder)
    cls_w = cls_w[:n_real]  # drop speed-perturb/padding classes

    fbank = KaldiFbank(FbankConfig(), mean_norm=True)

    @jax.jit
    def embed(wav):
        feats = fbank(wav[None])
        with jax.default_matmul_precision("high"):
            return model.apply(variables, feats)[0]

    wn = cls_w / np.maximum(np.linalg.norm(cls_w, axis=1, keepdims=True), 1e-12)
    wav_scp = load_wav_scp(args.data)
    utt2label = load_wav_scp(args.utt2label) if args.utt2label else None

    preds, correct, total = {}, 0, 0
    for utt, path in wav_scp.items():
        wav = load_audio(path, obj_fs=16000)[0]
        emb = np.asarray(embed(wav))
        emb = emb / max(np.linalg.norm(emb), 1e-12)
        pred_id = int(np.argmax(wn @ emb))
        pred = encoder.ind2lab[pred_id]
        preds[utt] = pred
        if utt2label is not None and utt in utt2label:
            total += 1
            correct += int(pred == utt2label[utt])

    if args.out:
        with open(args.out, "w") as f:
            for utt, lab in preds.items():
                f.write(f"{utt} {lab}\n")
    if total:
        print(f"accuracy: {100.0 * correct / total:.2f}% ({correct}/{total})")
    else:
        for utt, lab in list(preds.items())[:20]:
            print(utt, lab)


if __name__ == "__main__":
    main()
