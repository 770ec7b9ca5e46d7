import numpy as np

from speaker3d_tpu.diar.boundaries import (
    detect_speaker_boundaries,
    find_precise_boundary,
    find_precise_boundary_gmm,
)


def _sequential_embs(sizes, dim=16, seed=0, spread=0.05):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    out = []
    for i, n in enumerate(sizes):
        out.append(q[i] + spread * rng.standard_normal((n, dim)))
    return np.concatenate(out)


def test_cosine_boundary_refinement():
    # true boundary at 57, theoretical guess at 50
    x = _sequential_embs([57, 43])
    left_c = x[:50].mean(0)
    right_c = x[50:].mean(0)
    b, info = find_precise_boundary(x, 50, left_c, right_c)
    assert abs(b - 57) <= 2, b
    assert info["validation"]["overall_accuracy"] > 0.9


def test_gmm_boundary_refinement():
    x = _sequential_embs([105, 95], seed=1)
    b, info = find_precise_boundary_gmm(x, 100, boundary_window=10)
    assert abs(b - 105) <= 2, (b, info)


def test_detect_speaker_boundaries_three_speakers():
    x = _sequential_embs([65, 70, 65], seed=2)
    bounds = detect_speaker_boundaries(x, 3)
    assert len(bounds) == 2
    assert abs(bounds[0] - 65) <= 3
    assert abs(bounds[1] - 135) <= 3


def test_detect_boundaries_recipe_cli(tmp_path):
    """egs/split_sequential_speakers/detect_boundaries.py end-to-end on
    per-utterance .npy embeddings (sorted-name sequential order)."""
    import importlib.util
    import json
    import os

    x = _sequential_embs([30, 25], seed=3)
    emb_dir = os.path.join(tmp_path, "emb")
    os.makedirs(emb_dir)
    for i, e in enumerate(x):
        np.save(os.path.join(emb_dir, f"utt{i:04d}.npy"),
                e.astype(np.float32))

    spec = importlib.util.spec_from_file_location(
        "detect_boundaries",
        "/root/repo/egs/split_sequential_speakers/detect_boundaries.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = os.path.join(tmp_path, "b.json")
    rc = mod.main(["--emb", emb_dir, "--num_speakers", "2",
                   "--method", "gmm", "--out", out])
    assert rc == 0
    result = json.load(open(out))
    assert len(result["boundaries"]) == 1
    assert abs(result["boundaries"][0] - 30) <= 3, result
    assert result["segments"][0]["first_utt"] == "utt0000"
    assert result["segments"][1]["last_utt"] == "utt0054"
