"""Semantic-speaker data prep: TextGrid parsing, sentence windows, JSONL
emission (reference: egs/semantic_speaker/bert/local/*)."""

import json
import os

TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 10
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "SPK_A"
        xmin = 0
        xmax = 10
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 2.5
            text = "你好。今天天气不错。"
        intervals [2]:
            xmin = 5
            xmax = 7
            text = "是的。"
    item [2]:
        class = "IntervalTier"
        name = "SPK_B"
        xmin = 0
        xmax = 10
        intervals: size = 2
        intervals [1]:
            xmin = 2.5
            xmax = 5
            text = "同意！走吧？"
        intervals [2]:
            xmin = 7
            xmax = 9
            text = ""
'''


def test_parse_textgrid(tmp_path):
    from speaker3d_tpu.data.semantic_prep import textgrid_to_trans7time

    p = os.path.join(tmp_path, "x.TextGrid")
    with open(p, "w", encoding="utf-8") as f:
        f.write(TEXTGRID)
    t7t = textgrid_to_trans7time(p, "x")
    # empty-text interval dropped; sorted by start time
    assert [e[0] for e in t7t] == ["SPK_A", "SPK_B", "SPK_A"]
    assert t7t[0][1] == 0.0 and t7t[0][2] == 2.5
    assert t7t[1][3] == "同意！走吧？"


def test_split_and_windows():
    from speaker3d_tpu.data.semantic_prep import build_windows, split_trans7time

    t7t = [("A", 0.0, 1.0, "你好。今天不错。"),
           ("B", 1.0, 2.0, "同意！"),
           ("A", 2.0, 3.0, "走吧")]
    sents = split_trans7time(t7t)
    assert [s[1] for s in sents] == ["你好。", "今天不错。", "同意！", "走吧"]

    wins = build_windows("u", t7t, sentence_length=6, sentence_shift=3)
    assert wins, "no windows"
    # every window annotates speaker count and change points consistently
    for w in wins:
        assert w["spk_num"] >= 1
        for p in w["change_point_list"]:
            assert 0 < p < len(w["sentence"])
    # the tail window is right-anchored: it ends at the transcript end
    assert wins[-1]["sentence"].endswith("走吧")
    # a window containing both speakers is labelled multi-speaker
    multi = [w for w in wins if w["spk_num"] > 1]
    assert multi


def test_jsonl_cli(tmp_path):
    from speaker3d_tpu.data.semantic_prep import main
    from speaker3d_tpu.utils.fileio import write_trans7time_list

    t7t_path = os.path.join(tmp_path, "u1.trans7time")
    write_trans7time_list(t7t_path, [
        ("A", 0.0, 1.0, "你好。今天天气不错。"),
        ("B", 1.0, 2.0, "同意！走吧？"),
        ("A", 2.0, 3.0, "好的。")])
    scp = os.path.join(tmp_path, "t7t.scp")
    with open(scp, "w") as f:
        f.write(f"u1 {t7t_path}\n")
    d_out = os.path.join(tmp_path, "d.jsonl")
    t_out = os.path.join(tmp_path, "t.jsonl")
    rc = main(["json", "--trans7time_scp", scp, "--dialogue_out", d_out,
               "--turn_out", t_out, "--sentence_length", "8",
               "--sentence_shift", "4"])
    assert rc == 0
    d_rows = [json.loads(l) for l in open(d_out)]
    t_rows = [json.loads(l) for l in open(t_out)]
    assert d_rows and t_rows and len(d_rows) == len(t_rows)
    for row in d_rows:  # our trainer format (cli/semantic.py)
        assert row["label"] in (0, 1) and row["text"]
    for row in t_rows:
        assert len(row["labels"]) == len(row["text"])
        assert set(row["labels"]) <= {0, 1}
        for p in row["change_point_list"]:
            assert row["labels"][p] == 1
    # at least one multi-speaker window and one change point in the corpus
    assert any(r["label"] == 1 for r in d_rows)
    assert any(sum(r["labels"]) > 0 for r in t_rows)


def test_textgrid_cli(tmp_path):
    from speaker3d_tpu.data.semantic_prep import main

    tg_dir = os.path.join(tmp_path, "tg")
    os.makedirs(tg_dir)
    with open(os.path.join(tg_dir, "meetingA.TextGrid"), "w",
              encoding="utf-8") as f:
        f.write(TEXTGRID)
    out_dir = os.path.join(tmp_path, "t7t")
    scp = os.path.join(tmp_path, "t7t.scp")
    rc = main(["textgrid", "--textgrid_dir", tg_dir, "--out_dir", out_dir,
               "--scp", scp])
    assert rc == 0
    entries = dict(l.split() for l in open(scp))
    assert "meetingA" in entries
    from speaker3d_tpu.utils.fileio import load_trans7time_list

    t7t = load_trans7time_list(entries["meetingA"])
    assert len(t7t) == 3
