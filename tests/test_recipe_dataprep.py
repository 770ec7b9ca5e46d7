"""Per-corpus recipe data preparation against synthetic corpus trees
(VERDICT r1 item 7). Reference equivalents: egs/voxceleb/sv-eres2netv2/
local/prepare_data.sh stage 4, egs/cnceleb/.../prepare_data_cncb.sh stage 4,
egs/3dspeaker/.../prepare_data.sh stage 3 — same output files and key
conventions, produced by egs/local/prepare_corpus.py."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREP = os.path.join(REPO, "egs", "local", "prepare_corpus.py")
FS = 16000


def _tone_wav(path, seed=0, dur=0.3):
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * FS)) / FS
    write_wav(path, (0.2 * np.sin(2 * np.pi * 300 * t)
                     + 0.01 * rng.standard_normal(t.shape[0])
                     ).astype(np.float32), FS)


def _run(args):
    subprocess.run([sys.executable, PREP] + args, check=True,
                   capture_output=True, text=True)


def _scp(path):
    with open(path) as f:
        return dict(line.split(None, 1) for line in f if line.strip())


def test_voxceleb_prep(tmp_path):
    # vox2 dev: id/session/utt.wav ; vox1: same layout
    for root, spks in [("vox2", ["id00012", "id00034"]),
                       ("vox1", ["id10001", "id10002"])]:
        for spk in spks:
            for sess in ("a", "b"):
                d = tmp_path / root / spk / sess
                d.mkdir(parents=True)
                for u in range(2):
                    _tone_wav(str(d / f"{u:05d}.wav"), seed=u)
    trials_in = tmp_path / "veri_test2.txt"
    trials_in.write_text(
        "1 id10001/a/00000.wav id10001/b/00001.wav\n"
        "0 id10001/a/00000.wav id10002/a/00000.wav\n")
    out = str(tmp_path / "data")
    _run(["voxceleb", "--vox2_root", str(tmp_path / "vox2"),
          "--vox1_root", str(tmp_path / "vox1"), "--out", out,
          "--trials", str(trials_in)])

    scp = _scp(os.path.join(out, "vox2_dev", "wav.scp"))
    assert len(scp) == 8
    assert all(k.count("/") == 2 for k in scp)  # spk/sess/utt.wav keys
    with open(os.path.join(out, "train.csv")) as f:
        lines = f.read().splitlines()
    assert lines[0] == "ID,wav,spk"
    assert len(lines) == 9
    spks = {ln.split(",")[2] for ln in lines[1:]}
    assert spks == {"id00012", "id00034"}
    with open(os.path.join(out, "vox1", "trials",
                           "veri_test2.trial")) as f:
        tlines = f.read().splitlines()
    assert tlines[0].endswith(" target") and tlines[1].endswith(" nontarget")
    # utt2spk/spk2utt well-formed
    with open(os.path.join(out, "vox2_dev", "spk2utt")) as f:
        s2u = f.read().splitlines()
    assert len(s2u) == 2 and all(len(ln.split()) == 5 for ln in s2u)


def test_musan_rirs_prep(tmp_path):
    for cat, sub in [("noise", "free-sound"), ("music", "fma"),
                     ("speech", "us-gov")]:
        d = tmp_path / "musan" / cat / sub
        d.mkdir(parents=True)
        _tone_wav(str(d / f"{cat}1.wav"))
    rirs = tmp_path / "RIRS_NOISES" / "real_rirs_isotropic_noises"
    rirs.mkdir(parents=True)
    _tone_wav(str(rirs / "rir1.wav"))
    (rirs / "rir_list").write_text(
        "-- -- -- -- RIRS_NOISES/real_rirs_isotropic_noises/rir1.wav\n")
    out = str(tmp_path / "data")
    _run(["musan", str(tmp_path / "musan"), "--out", out + "/musan"])
    _run(["rirs", str(tmp_path / "RIRS_NOISES"), "--out", out + "/rirs"])
    assert len(_scp(out + "/musan/wav.scp")) == 1            # noise only
    assert len(_scp(out + "/musan/music_wav.scp")) == 1
    rscp = _scp(out + "/rirs/wav.scp")
    assert len(rscp) == 1
    assert os.path.isfile(next(iter(rscp.values())).strip())


def test_cnceleb_prep(tmp_path):
    c1 = tmp_path / "CN-Celeb_wav"
    (c1 / "dev").mkdir(parents=True)
    (c1 / "dev" / "dev.lst").write_text("id00001\nid00002\n")
    for spk in ("id00001", "id00002", "id00003"):
        d = c1 / "data" / spk
        d.mkdir(parents=True)
        _tone_wav(str(d / "entertainment-01-001.wav"))
    ev = c1 / "eval"
    (ev / "lists").mkdir(parents=True)
    (ev / "test").mkdir(parents=True)
    _tone_wav(str(ev / "test" / "id00003-speech-01-001.wav"))
    (ev / "lists" / "trials.lst").write_text(
        "id00003 test/id00003-speech-01-001.wav 1\n")
    (ev / "lists" / "enroll.map").write_text(
        "id00003 id00003/entertainment-01-001.wav\n")
    c2 = tmp_path / "CN-Celeb2_wav"
    c2.mkdir()
    (c2 / "spk.lst").write_text("id20001\n")
    d = c2 / "data" / "id20001"
    d.mkdir(parents=True)
    _tone_wav(str(d / "interview-02-002.wav"))

    out = str(tmp_path / "data")
    _run(["cnceleb", "--cnceleb1_root", str(c1), "--cnceleb2_root", str(c2),
          "--out", out])
    train = _scp(os.path.join(out, "cnceleb_train", "wav.scp"))
    # dev spks (2) + cnceleb2 (1); eval-only id00003 excluded
    assert len(train) == 3 and not any("id00003" in k for k in train)
    with open(os.path.join(out, "cnceleb_test", "trials")) as f:
        line = f.read().strip()
    assert line == ("enroll/id00003.wav test/id00003-speech-01-001.wav "
                    "target")
    assert os.path.isfile(os.path.join(out, "eval", "enroll.map"))


def test_3dspeaker_prep(tmp_path):
    root = tmp_path / "3dspeaker"
    files = root / "files"
    files.mkdir(parents=True)
    wavs = root / "train" / "wav"
    wavs.mkdir(parents=True)
    rows = []
    for spk in ("SPK0001", "SPK0002"):
        for dev in ("Device01", "Device09"):
            name = f"{spk}_{dev}_0001"
            _tone_wav(str(wavs / f"{name}.wav"))
            rows.append((name, f"train/wav/{name}.wav", spk))
    (files / "train_wav.scp").write_text(
        "".join(f"{u} {p}\n" for u, p, _ in rows))
    (files / "train_utt2spk").write_text(
        "".join(f"{u} {s}\n" for u, _, s in rows))
    (files / "test_wav.scp").write_text(f"{rows[0][0]} {rows[0][1]}\n")
    (files / "test_utt2spk").write_text(f"{rows[0][0]} {rows[0][2]}\n")
    (files / "trials_cross_device").write_text("a b target\n")

    out = str(tmp_path / "data")
    _run(["3dspeaker", "--root", str(root), "--out", out])
    train = _scp(os.path.join(out, "3dspeaker", "train", "wav.scp"))
    assert len(train) == 2  # Device09 rows filtered from training
    assert not any("Device09" in k for k in train)
    assert os.path.isfile(os.path.join(
        out, "3dspeaker", "trials", "trials_cross_device"))
    with open(os.path.join(out, "train.csv")) as f:
        assert len(f.read().splitlines()) == 3


@pytest.mark.skipif(not os.path.isfile(
    os.path.join(REPO, "egs", "voxceleb", "sv-eres2netv2", "run.sh")),
    reason="recipe missing")
def test_voxceleb_recipe_stages_1_2(tmp_path):
    """run.sh stages 1-2 against a synthetic corpus tree end-to-end."""
    for root, spks in [("vox2", ["id00012", "id00034"]),
                       ("vox1", ["id10001"])]:
        for spk in spks:
            d = tmp_path / root / spk / "s1"
            d.mkdir(parents=True)
            _tone_wav(str(d / "00000.wav"))
    env = dict(os.environ)
    env.update({"VOXCELEB2_ROOT": str(tmp_path / "vox2"),
                "VOXCELEB1_ROOT": str(tmp_path / "vox1"),
                "STAGE": "1", "STOP_STAGE": "2",
                "TRIALS": "/nonexistent"})
    # run from a scratch copy so recipe outputs don't pollute the repo
    import shutil

    work = tmp_path / "egs"
    shutil.copytree(os.path.join(REPO, "egs"), str(work), symlinks=True)
    r = subprocess.run(
        ["bash", str(work / "voxceleb" / "sv-eres2netv2" / "run.sh")],
        env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    data = work / "voxceleb" / "sv-eres2netv2" / "data"
    assert (data / "train.csv").is_file()
    assert (data / "eval_wav.scp").is_file()
    assert len(_scp(str(data / "eval_wav.scp"))) == 1


def test_m4a2wav_script_generation(tmp_path):
    """egs/local/m4a2wav.py mirrors the reference m4a2wav.pl: walks the
    aac/<spkr>/<rec>/*.m4a layout and emits one pcm_s16le ffmpeg command
    per file into m4a2wav_<dataset>.sh (reference:
    egs/3dspeaker/sv-eres2netv2/utils/m4a2wav.pl)."""
    import runpy
    import sys

    src = tmp_path / "m4a" / "dev" / "aac" / "id00001" / "recA"
    src.mkdir(parents=True)
    (src / "00001.m4a").write_bytes(b"")
    (src / "00002.m4a").write_bytes(b"")
    (src / "notme.txt").write_bytes(b"")
    out = tmp_path / "wav"

    sys_argv = [str(tmp_path / "m4a"), "dev", str(out)]
    mod = runpy.run_path(os.path.join(REPO, "egs", "local", "m4a2wav.py"),
                         run_name="m4a2wav")
    assert mod["main"](sys_argv) == 0
    script = out / "dev" / "m4a2wav_dev.sh"
    lines = script.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0] == (
        f"ffmpeg -v 8 -i {src}/00001.m4a -f wav -acodec pcm_s16le "
        f"{out}/dev/aac/id00001/recA/00001.wav")
    # target dirs pre-created like the reference's mkdir -p
    assert (out / "dev" / "aac" / "id00001" / "recA").is_dir()

    # paths with whitespace are shell-quoted in the script and passed as a
    # single argv element by --run (ADVICE r3)
    import shlex

    ws = tmp_path / "m4a sp" / "dev" / "aac" / "id 01" / "rec A"
    ws.mkdir(parents=True)
    (ws / "a b.m4a").write_bytes(b"")
    out2 = tmp_path / "wav sp"
    assert mod["main"]([str(tmp_path / "m4a sp"), "dev", str(out2)]) == 0
    line = (out2 / "dev" / "m4a2wav_dev.sh").read_text().splitlines()[0]
    argv = shlex.split(line)
    assert argv[:4] == ["ffmpeg", "-v", "8", "-i"]
    assert argv[4] == f"{ws}/a b.m4a"
    assert argv[-1] == f"{out2}/dev/aac/id 01/rec A/a b.wav"
    assert mod["ffmpeg_argv"](argv[4], argv[-1]) == argv
