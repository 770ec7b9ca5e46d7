"""Trial scoring and embedding stores.

Behavioral contract (reference: speakerlab/bin/compute_score_metrics.py):
per-trial cosine between enrol/test embeddings, score files
("enrol test label score"), EER + minDCF metrics.

Embeddings are stored as .npz archives ({utt_id: [D]}), one per extraction
shard — the ark/scp role of the reference (kaldiio) without the kaldi dep.

The large-scale path (all-pairs affinity for diarization/eval) runs as a
device matmul, optionally sharded row-wise over the data axis with the full
matrix assembled via all_gather (SURVEY.md §2.6 TPU mapping).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np


def save_embeddings(path: str, embeddings: Dict[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in embeddings.items()})


def load_embeddings(path_or_dir: str) -> Dict[str, np.ndarray]:
    """Load one .npz, a Kaldi .ark/.scp, every *.npz / *.ark in a
    directory, or a directory of per-utterance <utt>.npy files (the
    reference fork's infer_sv format)."""
    if path_or_dir.endswith(".ark") or path_or_dir.endswith(".scp"):
        from speaker3d_tpu.utils.kaldi_ark import read_ark, read_scp

        return (read_scp(path_or_dir) if path_or_dir.endswith(".scp")
                else read_ark(path_or_dir))
    paths = []
    if os.path.isdir(path_or_dir):
        entries = sorted(os.listdir(path_or_dir))
        paths = [os.path.join(path_or_dir, p) for p in entries
                 if re.search(r"\.npz$", p)]
        arks = [os.path.join(path_or_dir, p) for p in entries
                if p.endswith(".ark")]
        if not paths and arks:
            from speaker3d_tpu.utils.kaldi_ark import read_ark

            out: Dict[str, np.ndarray] = {}
            for p in arks:
                out.update(read_ark(p))
            return out
        if not paths:
            npys = [p for p in entries if p.endswith(".npy")]
            if npys:
                return {p[:-4]: np.load(os.path.join(path_or_dir, p))
                        for p in npys}
            raise FileNotFoundError(
                f"no .npz/.ark/.npy embedding files in {path_or_dir}")
    else:
        paths = [path_or_dir]
    out: Dict[str, np.ndarray] = {}
    for p in paths:
        with np.load(p) as data:
            for k in data.files:
                out[k] = data[k]
    return out


def load_trials(path: str) -> List[Tuple[str, str, int]]:
    """Lines: `enrol test {1|0|target|nontarget}`."""
    trials = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            lab = parts[2]
            if lab in ("1", "target"):
                y = 1
            elif lab in ("0", "nontarget"):
                y = 0
            else:
                raise ValueError(f"unrecognized label in line: {line!r}")
            trials.append((parts[0], parts[1], y))
    return trials


def score_trials(enrol: Dict[str, np.ndarray], test: Dict[str, np.ndarray],
                 trials: Sequence[Tuple[str, str, int]]):
    """Vectorized cosine per trial -> (scores [N], labels [N])."""
    e_keys = sorted({t[0] for t in trials})
    t_keys = sorted({t[1] for t in trials})
    e_idx = {k: i for i, k in enumerate(e_keys)}
    t_idx = {k: i for i, k in enumerate(t_keys)}
    E = np.stack([enrol[k] for k in e_keys]).astype(np.float64)
    T = np.stack([test[k] for k in t_keys]).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    T /= np.maximum(np.linalg.norm(T, axis=1, keepdims=True), 1e-12)
    ei = np.asarray([e_idx[t[0]] for t in trials])
    ti = np.asarray([t_idx[t[1]] for t in trials])
    scores = np.sum(E[ei] * T[ti], axis=1)
    labels = np.asarray([t[2] for t in trials])
    return scores, labels


_AFFINITY_FNS = {}


def _affinity_shard_fn(mesh):
    """Compiled row-sharded affinity matmul, cached per mesh (a per-call
    jit of a fresh shard_map closure recompiles EVERY call — CLAUDE.md;
    jit itself caches per input shape)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = (id(mesh), mesh.shape["data"])
    if key not in _AFFINITY_FNS:
        def body(rows, full):
            return jnp.matmul(rows, full.T,
                              precision=jax.lax.Precision.HIGHEST)

        _AFFINITY_FNS[key] = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data", None), P()),
            out_specs=P("data", None)))
    return _AFFINITY_FNS[key]


def pairwise_cosine_device(emb: np.ndarray, mesh=None) -> np.ndarray:
    """All-pairs cosine as a device matmul; row-sharded over 'data' +
    all_gather when a mesh is given (for N ~ 1e4+ diarization chunks)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.asarray(emb, jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    if mesh is None:
        return np.asarray(
            jnp.matmul(x, x.T, precision=jax.lax.Precision.HIGHEST))

    n_data = mesh.shape["data"]
    pad = (-emb.shape[0]) % n_data
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    fn = _affinity_shard_fn(mesh)
    rows = jax.device_put(xp, NamedSharding(mesh, P("data", None)))
    full = jax.device_put(xp, NamedSharding(mesh, P()))
    aff = np.asarray(fn(rows, full))
    n = emb.shape[0]
    return aff[:n, :n]
