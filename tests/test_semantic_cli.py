import json, os, sys

def test_semantic_cli(tmp_path):
    rows_tr = [{"text": "aaaa bbbb", "label": 0}, {"text": "cccc cccc", "label": 1}] * 8
    rows_ev = rows_tr[:8]
    tr = os.path.join(tmp_path, "train.jsonl"); ev = os.path.join(tmp_path, "eval.jsonl")
    with open(tr, "w") as f:
        for r in rows_tr: f.write(json.dumps(r) + "\n")
    with open(ev, "w") as f:
        for r in rows_ev: f.write(json.dumps(r) + "\n")
    from speaker3d_tpu.cli.semantic import main as sem_main
    exp = os.path.join(tmp_path, "exp")
    sem_main(["dialogue", "--train", tr, "--eval", ev, "--exp_dir", exp,
              "--epochs", "2", "--batch_size", "8", "--max_seq_length", "16",
              "--hidden_size", "32", "--num_layers", "2", "--lr", "0.005"])
    m = json.load(open(os.path.join(exp, "metrics.json")))
    assert "accuracy" in m
