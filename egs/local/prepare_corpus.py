"""Per-corpus data preparation: raw corpus layouts -> train CSV, musan/rirs
augmentation lists, eval wav.scp/utt2spk, trials.

Native replacement for the reference's per-recipe awk/perl prep pipelines
(reference: egs/voxceleb/sv-eres2netv2/local/prepare_data.sh:80-105,
egs/cnceleb/sv-eres2netv2/local/prepare_data_cncb.sh:62-115,
egs/3dspeaker/sv-eres2netv2/local/prepare_data.sh:63-95) — same output
files and key conventions, one Python tool with per-corpus subcommands.
Download/decompress stages stay manual (zero-egress container; the
reference's download_data.sh equally assumes pre-fetched archives).

Subcommands:
  musan      <musan_root> --out data/musan
  rirs       <RIRS_NOISES_root> --out data/rirs
  voxceleb   --vox2_root R --vox1_root R --out data [--trials veri_test2.txt]
  cnceleb    --cnceleb1_root R --cnceleb2_root R --out data
  3dspeaker  --root R --out data
  csv        --wav_scp S --utt2spk U --out train.csv

All commands are idempotent and pure-Python (no awk/perl/kaldi).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.writelines(line + "\n" for line in lines)
    print(f"wrote {len(lines):6d} lines -> {path}")


def _spk2utt_from_utt2spk(pairs):
    spk2utt = {}
    for utt, spk in pairs:
        spk2utt.setdefault(spk, []).append(utt)
    return [f"{spk} {' '.join(utts)}" for spk, utts in sorted(spk2utt.items())]


def _csv_lines(pairs_with_path):
    """[(utt, path, spk)] -> CSV lines for WavSVDataset (ID,wav,spk)."""
    lines = ["ID,wav,spk"]
    for utt, path, spk in pairs_with_path:
        lines.append(f"{utt.replace(',', '_')},{path},{spk}")
    return lines


def cmd_musan(args):
    """musan/{noise,music,speech}/<subset>/*.wav -> per-category wav.scp.
    (reference uses noise/free-sound for the noise scp; we index every
    category so recipes can pick — reference: prepare_data.sh:85)"""
    for cat in ("noise", "music", "speech"):
        wavs = sorted(glob.glob(os.path.join(args.root, cat, "**", "*.wav"),
                                recursive=True))
        lines = []
        for w in wavs:
            rel = os.path.relpath(w, args.root).replace(os.sep, "/")
            lines.append(f"{rel} {os.path.abspath(w)}")
        if lines:
            _write_lines(os.path.join(args.out, f"{cat}_wav.scp"), lines)
        if cat == "noise" and lines:
            # the reference's data/musan/wav.scp (noise only)
            _write_lines(os.path.join(args.out, "wav.scp"), lines)
    return 0


def cmd_rirs(args):
    """RIRS_NOISES: parse rir_list manifests (5th field = relative path;
    reference: prepare_data.sh:87); falls back to a recursive wav glob."""
    lines = []
    for sub in ("real_rirs_isotropic_noises",
                os.path.join("simulated_rirs", "smallroom"),
                os.path.join("simulated_rirs", "mediumroom"),
                os.path.join("simulated_rirs", "largeroom")):
        manifest = os.path.join(args.root, sub, "rir_list")
        if not os.path.isfile(manifest):
            continue
        with open(manifest) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 5:
                    rel = parts[4]
                    path = os.path.join(os.path.dirname(args.root), rel)
                    if not os.path.isfile(path):
                        path = os.path.join(args.root,
                                            rel.split("/", 1)[-1])
                    lines.append(f"{rel} {os.path.abspath(path)}")
    if not lines:
        for w in sorted(glob.glob(os.path.join(args.root, "**", "*.wav"),
                                  recursive=True)):
            rel = os.path.relpath(w, args.root).replace(os.sep, "/")
            lines.append(f"{rel} {os.path.abspath(w)}")
    _write_lines(os.path.join(args.out, "wav.scp"), lines)
    return 0


def _index_speaker_tree(root):
    """<root>/<spk>/<session>/<utt>.wav -> [(key spk/sess/utt.wav, path, spk)]
    (the reference's `awk -F/ $(NF-2)/$(NF-1)/$NF` key convention)."""
    out = []
    for w in sorted(glob.glob(os.path.join(root, "**", "*.wav"),
                              recursive=True)):
        parts = os.path.relpath(w, root).split(os.sep)
        if len(parts) < 3:
            parts = (["unk"] * (3 - len(parts))) + parts
        key = "/".join(parts[-3:])
        out.append((key, os.path.abspath(w), parts[-3]))
    return out


def cmd_voxceleb(args):
    # train: VoxCeleb2 dev (id/session/utt.wav)
    train = _index_speaker_tree(args.vox2_root)
    _write_lines(os.path.join(args.out, "vox2_dev", "wav.scp"),
                 [f"{k} {p}" for k, p, _ in train])
    _write_lines(os.path.join(args.out, "vox2_dev", "utt2spk"),
                 [f"{k} {s}" for k, _, s in train])
    _write_lines(os.path.join(args.out, "vox2_dev", "spk2utt"),
                 _spk2utt_from_utt2spk([(k, s) for k, _, s in train]))
    _write_lines(os.path.join(args.out, "train.csv"), _csv_lines(train))

    # eval: VoxCeleb1 (test [+dev for vox1-E/H trials])
    ev = _index_speaker_tree(args.vox1_root)
    _write_lines(os.path.join(args.out, "vox1", "wav.scp"),
                 [f"{k} {p}" for k, p, _ in ev])
    _write_lines(os.path.join(args.out, "vox1", "utt2spk"),
                 [f"{k} {s}" for k, _, s in ev])

    # trials: "<0|1> spk/sess/utt.wav spk/sess/utt.wav" (veri_test2.txt) ->
    # kaldi "<enrol> <test> target|nontarget" (reference: prepare_data.sh:99)
    for t in args.trials or []:
        lines = []
        with open(t) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 3:
                    lab = "target" if parts[0] == "1" else "nontarget"
                    lines.append(f"{parts[1]} {parts[2]} {lab}")
        name = os.path.splitext(os.path.basename(t))[0]
        _write_lines(os.path.join(args.out, "vox1", "trials",
                                  f"{name}.trial"), lines)
    return 0


def cmd_cnceleb(args):
    """CN-Celeb1 (dev+eval, per dev.lst) + CN-Celeb2 -> train lists, eval
    wav.scp with enroll entries, kaldi trials.
    (reference: prepare_data_cncb.sh:84-115; flac inputs must already be
    wav — see flac2wav note in the recipe run.sh)"""
    train = []
    dev_lst = os.path.join(args.cnceleb1_root, "dev", "dev.lst")
    with open(dev_lst) as f:
        dev_spks = [line.strip() for line in f if line.strip()]
    for spk in dev_spks:
        for w in sorted(glob.glob(os.path.join(
                args.cnceleb1_root, "data", spk, "*.wav"))):
            key = f"{spk}/{os.path.basename(w)}"
            train.append((key, os.path.abspath(w), spk))
    spk_lst = os.path.join(args.cnceleb2_root, "spk.lst")
    if os.path.isfile(spk_lst):
        with open(spk_lst) as f:
            c2 = [line.strip() for line in f if line.strip()]
        for spk in c2:
            for w in sorted(glob.glob(os.path.join(
                    args.cnceleb2_root, "data", spk, "*.wav"))):
                key = f"{spk}/{os.path.basename(w)}"
                train.append((key, os.path.abspath(w), spk))
    _write_lines(os.path.join(args.out, "cnceleb_train", "wav.scp"),
                 [f"{k} {p}" for k, p, _ in train])
    _write_lines(os.path.join(args.out, "cnceleb_train", "utt2spk"),
                 [f"{k} {s}" for k, _, s in train])
    _write_lines(os.path.join(args.out, "cnceleb_train", "spk2utt"),
                 _spk2utt_from_utt2spk([(k, s) for k, _, s in train]))
    _write_lines(os.path.join(args.out, "train.csv"), _csv_lines(train))

    # eval: test wavs + enroll wavs (enroll.map keys "enroll/<spk>.wav")
    ev_lines, u2s = [], []
    for w in sorted(glob.glob(os.path.join(args.cnceleb1_root, "eval",
                                           "**", "*.wav"), recursive=True)):
        parts = os.path.relpath(w, os.path.join(
            args.cnceleb1_root, "eval")).split(os.sep)
        key = "/".join(parts[-2:])
        ev_lines.append(f"{key} {os.path.abspath(w)}")
        u2s.append(f"{key} {os.path.basename(w).split('-')[0]}")
    _write_lines(os.path.join(args.out, "eval", "wav.scp"), ev_lines)
    _write_lines(os.path.join(args.out, "eval", "utt2spk"), u2s)

    trials_lst = os.path.join(args.cnceleb1_root, "eval", "lists",
                              "trials.lst")
    if os.path.isfile(trials_lst):
        lines = []
        with open(trials_lst) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 3:
                    lab = "target" if parts[2] not in ("0", "nontarget") \
                        else "nontarget"
                    lines.append(f"enroll/{parts[0]}.wav {parts[1]} {lab}")
        _write_lines(os.path.join(args.out, "cnceleb_test", "trials"), lines)
    enroll_map = os.path.join(args.cnceleb1_root, "eval", "lists",
                              "enroll.map")
    if os.path.isfile(enroll_map):
        os.makedirs(os.path.join(args.out, "eval"), exist_ok=True)
        with open(enroll_map) as fin, open(
                os.path.join(args.out, "eval", "enroll.map"), "w") as fout:
            fout.write(fin.read())
    return 0


def cmd_3dspeaker(args):
    """modelscope layout: <root>/files/{train,test}_wav.scp + *_utt2spk +
    trials*; wav paths in the scp are relative to <root>. Device09 rows are
    excluded from training (reference: prepare_data.sh:78-79)."""
    for split in ("train", "test"):
        scp = os.path.join(args.root, "files", f"{split}_wav.scp")
        u2s = os.path.join(args.root, "files", f"{split}_utt2spk")
        with open(scp) as f:
            wav_rows = [line.split() for line in f if line.strip()]
        with open(u2s) as f:
            spk_rows = dict(line.split() for line in f if line.strip())
        rows = []
        for utt, rel in wav_rows:
            if split == "train" and "Device09" in utt + rel:
                continue
            rows.append((utt, os.path.abspath(os.path.join(args.root, rel)),
                         spk_rows.get(utt, utt.split("_")[0])))
        base = os.path.join(args.out, "3dspeaker", split)
        _write_lines(os.path.join(base, "wav.scp"),
                     [f"{u} {p}" for u, p, _ in rows])
        _write_lines(os.path.join(base, "utt2spk"),
                     [f"{u} {s}" for u, _, s in rows])
        _write_lines(os.path.join(base, "spk2utt"),
                     _spk2utt_from_utt2spk([(u, s) for u, _, s in rows]))
        if split == "train":
            _write_lines(os.path.join(args.out, "train.csv"),
                         _csv_lines(rows))
    for t in sorted(glob.glob(os.path.join(args.root, "files", "trials*"))):
        dst = os.path.join(args.out, "3dspeaker", "trials",
                           os.path.basename(t))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(t) as fin, open(dst, "w") as fout:
            fout.write(fin.read())
        print(f"copied trials -> {dst}")
    return 0


def cmd_csv(args):
    with open(args.wav_scp) as f:
        wav = dict(line.split(None, 1) for line in f if line.strip())
    with open(args.utt2spk) as f:
        spk = dict(line.split() for line in f if line.strip())
    rows = [(u, wav[u].strip(), spk[u]) for u in sorted(wav) if u in spk]
    _write_lines(args.out, _csv_lines(rows))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("musan")
    sp.add_argument("root")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_musan)

    sp = sub.add_parser("rirs")
    sp.add_argument("root")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_rirs)

    sp = sub.add_parser("voxceleb")
    sp.add_argument("--vox2_root", required=True)
    sp.add_argument("--vox1_root", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--trials", nargs="*", default=[])
    sp.set_defaults(fn=cmd_voxceleb)

    sp = sub.add_parser("cnceleb")
    sp.add_argument("--cnceleb1_root", required=True)
    sp.add_argument("--cnceleb2_root", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_cnceleb)

    sp = sub.add_parser("3dspeaker")
    sp.add_argument("--root", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_3dspeaker)

    sp = sub.add_parser("csv")
    sp.add_argument("--wav_scp", required=True)
    sp.add_argument("--utt2spk", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_csv)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
