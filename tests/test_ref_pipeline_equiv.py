"""Whole-pipeline RTTM equivalence against the reference's own code.

Every component (VAD post-processing, chunking, circle-pad, model forward,
clustering, compressed_seg, RTTM writing) is parity-tested in isolation
elsewhere; this module closes the composition gap by driving the reference's
actual ``Diarization3Dspeaker`` (reference: bin/infer_diarization.py:191-315)
on CPU torch and our ``DiarizationPipeline`` on the same synthetic
conversations with identical knobs, then requiring identical segment fields
and byte-identical RTTM.

In-container substitutions on the REFERENCE side (each justified):
  - TenVad is a closed native lib -> the same EnergyVAD callable is injected
    into BOTH pipelines (the reference treats the VAD as a pluggable
    flags-producer; its in-repo post-processing chain is what's under test).
  - torchaudio is absent -> feature_extractor is a torch mirror of Kaldi
    fbank(dither=0) (same algorithm as tests/golden_fbank.py, which pins our
    JAX frontend to the reference's own C++ frontend via the frozen oracle).
  - fastcluster is absent -> scipy average linkage (the identical
    algorithm; our AHC uses scipy too, so linkage semantics match on both
    sides by construction).
  - modelscope downloads are impossible offline -> the embedding model is a
    reduced-width random-weight ERes2NetV2 (full topology: 4 stages + AFF
    fusion) converted through speaker3d_tpu.compat, exactly as the
    per-model parity tests do.
"""

import importlib
import math
import sys
import types

import numpy as np
import pytest

from tests.conftest import has_reference
from tests.golden_fbank import EPS

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")

FS = 16000
SEEDS = [0, 1, 2]
# Non-harmonic f0s (pairwise non-integer ratios): at 110/220/330 Hz the
# voices' partials nest perfectly ({220,440,660} subset of 110's comb) and
# WHOLE-SEGMENT embeddings of spk0/spk1 collapse to cos ~0.97 (measured),
# which made the trained-model label-equality tests threshold-fragile.
F0S = [113.0, 167.0, 251.0]


# ---------------------------------------------------------------------------
# reference import machinery
# ---------------------------------------------------------------------------

def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec: other libraries probe importlib.util.find_spec
    # ("torchaudio") and a None __spec__ raises ValueError (transformers'
    # availability check)
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _import_ref_mod():
    """Import the reference's bin/infer_diarization with absent third-party
    deps stubbed. None of the stubs participate in the compared numerics."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _stub_module("torchaudio")  # fileio imports it; unused for 16k ndarray
    _stub_module("modelscope")
    _stub_module("modelscope.pipelines", pipeline=None)
    _stub_module("modelscope.utils")
    _stub_module("modelscope.utils.constant", Tasks=types.SimpleNamespace())
    _stub_module("umap")  # only UmapHdbscan uses these; not exercised here
    _stub_module("hdbscan")
    from scipy.cluster.hierarchy import linkage as _scipy_linkage

    def _linkage(X, method="average", preserve_input=True):
        return _scipy_linkage(X, method=method)

    _stub_module("fastcluster", linkage=_linkage)
    mod = importlib.import_module("speakerlab.bin.infer_diarization")
    # tests/test_cluster.py may have imported speakerlab.process.cluster
    # earlier with a TEMPORARY bare fastcluster stub (popped afterwards);
    # that module's global still points at the bare stub — give it linkage
    ref_cluster = importlib.import_module("speakerlab.process.cluster")
    if not hasattr(ref_cluster.fastcluster, "linkage"):
        ref_cluster.fastcluster.linkage = _linkage
    return mod


# ---------------------------------------------------------------------------
# injected components (shared by both pipelines)
# ---------------------------------------------------------------------------

class TorchKaldiFbank:
    """torch mirror of torchaudio Kaldi fbank(dither=0) + reference FBank's
    mean_nor (reference: process/processor.py:133-158); vmap-compatible the
    way the reference uses it (torch.vmap at bin/infer_diarization.py:634).
    Same algorithm as tests/golden_fbank.py, float32."""

    def __init__(self, n_mels=80, sample_rate=16000, mean_nor=True):
        import torch

        assert sample_rate == 16000
        self.L, self.S, self.nfft = 400, 160, 512
        self.mean_nor = mean_nor
        i = np.arange(self.L, dtype=np.float64)
        win = (0.5 - 0.5 * np.cos(2 * np.pi / (self.L - 1) * i)) ** 0.85
        self.win = torch.from_numpy(win.astype(np.float32))

        def mel(f):
            return 1127.0 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)

        nbins = self.nfft // 2
        mlo, mhi = mel(20.0), mel(sample_rate / 2)
        d = (mhi - mlo) / (n_mels + 1)
        bank = np.zeros((nbins + 1, n_mels))
        bin_m = mel(np.arange(nbins) * sample_rate / self.nfft)
        for b in range(n_mels):
            left, center, right = mlo + b * d, mlo + (b + 1) * d, mlo + (b + 2) * d
            up = (bin_m - left) / (center - left)
            down = (right - bin_m) / (right - center)
            bank[:nbins, b] = np.maximum(0, np.minimum(up, down))
        self.bank = torch.from_numpy(bank.astype(np.float32))

    def __call__(self, wav, dither=0):
        import torch

        x = wav.reshape(-1)
        m = 1 + (x.shape[0] - self.L) // self.S
        idx = (torch.arange(m)[:, None] * self.S + torch.arange(self.L)[None, :])
        frames = x[idx]
        frames = frames - frames.mean(dim=1, keepdim=True)
        frames = frames - 0.97 * torch.cat(
            [frames[:, :1], frames[:, :-1]], dim=1)
        frames = frames * self.win
        spec = torch.fft.rfft(frames, n=self.nfft, dim=1)
        power = spec.real ** 2 + spec.imag ** 2
        feats = torch.log(torch.clamp(power @ self.bank, min=EPS))
        if self.mean_nor:
            feats = feats - feats.mean(dim=0, keepdim=True)
        return feats


class RefVadAdapter:
    """Wrap our EnergyVAD with the TenVadWrapper calling convention the
    reference expects (torch tensor in, (flags, np wav) out; reference:
    bin/infer_diarization.py:134-163)."""

    def __init__(self, inner):
        self.inner = inner

    def __call__(self, wav_1d):
        x = (wav_1d.detach().cpu().numpy() if hasattr(wav_1d, "detach")
             else np.asarray(wav_1d))
        return self.inner(x.astype(np.float32))


def _make_ref_pipeline(ref_mod, embedding_model, feature_extractor, vad,
                       cluster):
    """Assemble Diarization3Dspeaker without its downloading __init__
    (attribute list mirrors reference bin/infer_diarization.py:214-256)."""
    import torch

    D = ref_mod.Diarization3Dspeaker.__new__(ref_mod.Diarization3Dspeaker)
    D.device = torch.device("cpu")
    D.include_overlap = False
    D.embedding_model = embedding_model
    D.feature_extractor = feature_extractor
    D.vad_model = vad
    D.cluster = cluster
    D.batchsize = 64
    D.chunk_dur = 1.5
    D.chunk_step = 0.75
    D.fs = FS
    D.output_field_labels = None
    D.speaker_num = None
    D.no_chunk_after_vad = False
    D.last_vad_time = None
    D.last_vad_time_raw = None
    D.last_vad_time_processed = None
    D.last_vad_masked_audio = None
    D.last_vad_refined_mask = None
    D.last_vad_processed_mask = None
    D.vad_frame_size_ms = 16.0
    D.vad_min_speech_ms = 200.0
    D.vad_max_silence_ms = 300.0
    D.vad_energy_threshold = 0.05
    D.vad_boundary_expansion_ms = 10.0
    D.vad_boundary_energy_percentile = 10.0
    return D


# ---------------------------------------------------------------------------
# synthetic conversations (same synthesizer family as tools/eval_diar_synthetic)
# ---------------------------------------------------------------------------

def _voice(rng, n, f0):
    t = np.arange(n) / FS
    f = f0 * (1 + 0.015 * rng.standard_normal())
    sig = (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(2 * np.pi * 2 * f * t)
           + 0.25 * np.sin(2 * np.pi * 3 * f * t))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6.28))
    return (0.3 * am * sig + 0.004 * rng.standard_normal(n)).astype(np.float32)


def _conversation(seed, dur=60.0):
    rng = np.random.default_rng(seed)
    wav = 0.002 * rng.standard_normal(int(dur * FS)).astype(np.float32)
    f0s = F0S
    t, spk = 1.0, 0
    while t < dur - 5.0:
        turn = rng.uniform(2.0, 4.5)
        n = int(turn * FS)
        s0 = int(t * FS)
        wav[s0:s0 + n] += _voice(rng, n, f0s[spk])
        t += turn + rng.uniform(0.4, 1.0)
        spk = (spk + 1) % 3
    return np.clip(wav, -1.0, 1.0)


# ---------------------------------------------------------------------------
# fixtures: paired models (torch golden + converted flax) built once
# ---------------------------------------------------------------------------

MODEL_KW = dict(m_channels=16, embedding_size=64, feat_dim=80)


@pytest.fixture(scope="module")
def paired_models():
    import torch

    from speaker3d_tpu.compat import load_into_model
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2 as FlaxERes2NetV2

    ref_mod = _import_ref_mod()
    from speakerlab.models.eres2net.ERes2NetV2 import (
        ERes2NetV2 as TorchERes2NetV2)

    torch.manual_seed(0)
    tm = TorchERes2NetV2(**MODEL_KW)
    tm.eval()

    fm = FlaxERes2NetV2(**MODEL_KW)
    probe = np.zeros((1, 150, 80), np.float32)
    variables = load_into_model(fm, tm.state_dict(), probe)
    embed_fn = build_embedding_fn(fm, variables, mean_norm=True)
    return ref_mod, tm, embed_fn


def _make_clusters(ref_mod, kind, kw=None):
    """Identically-configured clustering backends for both sides."""
    from speakerlab.process.cluster import CommonClustering as RefCC

    from speaker3d_tpu.diar.cluster import CommonClustering as OurCC

    if kw is None:
        if kind == "AHC":
            # fork defaults (reference: bin/infer_diarization.py:105-118)
            kw = dict(mer_cos=0.3, fix_cos_thr=0.3, min_cluster_size=0)
        else:
            # recipe spectral config (reference: egs/.../conf/diar.yaml)
            kw = dict(mer_cos=0.8, min_cluster_size=4, pval=0.012,
                      max_num_spks=15)
    return RefCC(kind, **kw), OurCC(kind, **kw)


def _canon(fields):
    """Renumber cluster ids by first appearance. k-means label numbering is
    init-dependent even between two runs of the reference itself (sklearn
    k_means with no random_state, reference process/cluster.py:107-110), so
    first-appearance order is the well-defined label equivalence."""
    remap = {}
    out = []
    for st, ed, cid in fields:
        if cid not in remap:
            remap[cid] = len(remap)
        out.append([st, ed, remap[cid]])
    return out


def _run_pair(paired_models, kind, seed, tmp_path, cluster_kw=None,
              min_clusters=1, max_label_der=0.0):
    """``max_label_der``: 0.0 -> exact field equality (+ byte-identical
    RTTM). For the TRAINED spectral leg a single boundary tail chunk can
    sit equidistant between k-means centroids, where the two sides'
    ~1e-4-different embeddings legitimately resolve the tie differently
    (sklearn k_means with no random_state, reference
    process/cluster.py:107-110); there equivalence is asserted as
    DER(ref-as-truth, ours) <= max_label_der instead."""
    import torch

    from speaker3d_tpu.diar.pipeline import DiarizationPipeline
    from speaker3d_tpu.diar.vad import EnergyVAD

    ref_mod, tm, embed_fn = paired_models
    ref_cluster, our_cluster = _make_clusters(ref_mod, kind, cluster_kw)
    wav = _conversation(seed)

    ref_pipe = _make_ref_pipeline(
        ref_mod, tm, TorchKaldiFbank(mean_nor=True),
        RefVadAdapter(EnergyVAD(FS)), ref_cluster)
    our_pipe = DiarizationPipeline(
        embed_fn, sample_rate=FS, vad=EnergyVAD(FS), cluster=our_cluster)

    # seed the global numpy RNG identically before each side: sklearn
    # k_means draws from it (spectral path); AHC is deterministic
    np.random.seed(1234 + seed)
    ref_fields = ref_pipe(wav[None, :], wav_fs=FS)
    np.random.seed(1234 + seed)
    our_fields = our_pipe(wav, wav_fs=FS)

    # ---- VAD + chunk arithmetic: bitwise float equality ----
    assert ref_pipe.last_vad_time == our_pipe.last_vad_time
    ref_chunks = [c for st, ed in ref_pipe.last_vad_time
                  for c in ref_pipe.chunk(st, ed)]
    assert ref_chunks == our_pipe.last_chunks
    assert len(ref_chunks) >= 40, "need the real (non-short-N) cluster path"

    # ---- embeddings: near-identical across frameworks ----
    with torch.no_grad():
        ref_embs = ref_pipe.do_emb_extraction(
            ref_chunks, torch.from_numpy(wav[None, :]))
    ours = our_pipe.last_embeddings
    cos = np.sum(ref_embs * ours, -1) / (
        np.linalg.norm(ref_embs, axis=-1) * np.linalg.norm(ours, axis=-1))
    assert np.all(cos > 1 - 1e-4), cos.min()

    # ---- final fields ----
    if kind == "AHC":
        rf, of = ref_fields, our_fields
        exact = True  # fcluster ids are deterministic
    else:
        rf, of = _canon(ref_fields), _canon(our_fields)
        exact = max_label_der <= 0.0
    if exact:
        assert rf == of
    else:
        from speaker3d_tpu.diar.der import compute_der

        r = compute_der([(a, b, str(c)) for a, b, c in rf],
                        [(a, b, str(c)) for a, b, c in of], collar=0.0)
        assert r.der <= max_label_der, (r.der, rf, of)
    assert len(set(x[2] for x in rf)) >= min_clusters

    # ---- byte-identical RTTM from each side's own writer ----
    if exact:
        ref_rttm = tmp_path / f"ref_{kind}_{seed}.rttm"
        our_rttm = tmp_path / f"our_{kind}_{seed}.rttm"
        ref_pipe.save_diar_output(str(ref_rttm), wav_id="conv",
                                  output_field_labels=rf)
        our_pipe.save_diar_output(str(our_rttm), wav_id="conv",
                                  output_field_labels=of)
        assert ref_rttm.read_bytes() == our_rttm.read_bytes()
        assert ref_rttm.read_bytes().startswith(b"SPEAKER conv 0 ")
    return rf


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS)
def test_ahc_path_equivalence(paired_models, seed, tmp_path):
    fields = _run_pair(paired_models, "AHC", seed, tmp_path)
    assert len(fields) > 0


def test_whole_segment_mode_equivalence(trained_paired_models, tmp_path):
    """--no_chunk_after_vad (one embedding per VAD segment; the
    check_single_speaker / .pairs.json style of extraction): VAD segments
    and final fields must match. Embeddings are compared only on cluster
    labels — the reference pads every segment to the LONGEST segment in
    the call while our static-shape path buckets the pad target to a
    multiple of chunk_dur (deliberate, documented in
    DiarizationPipeline.do_emb_extraction), so raw embedding equality
    holds only when all segments share one bucket."""
    import torch  # noqa: F401 — torch must be importable for the ref side

    from speaker3d_tpu.diar.pipeline import DiarizationPipeline
    from speaker3d_tpu.diar.vad import EnergyVAD

    ref_mod, tm, embed_fn = trained_paired_models
    ref_cluster, our_cluster = _make_clusters(ref_mod, "AHC",
                                              TRAINED_KW["AHC"])
    wav = _conversation(0)

    ref_pipe = _make_ref_pipeline(
        ref_mod, tm, TorchKaldiFbank(mean_nor=True),
        RefVadAdapter(EnergyVAD(FS)), ref_cluster)
    ref_pipe.no_chunk_after_vad = True
    our_pipe = DiarizationPipeline(
        embed_fn, sample_rate=FS, vad=EnergyVAD(FS), cluster=our_cluster,
        no_chunk_after_vad=True)

    ref_fields = ref_pipe(wav[None, :], wav_fs=FS)
    our_fields = our_pipe(wav, wav_fs=FS)

    assert ref_pipe.last_vad_time == our_pipe.last_vad_time
    assert [c[:2] for c in our_pipe.last_chunks] == \
        [list(t) for t in ref_pipe.last_vad_time]
    # segment boundaries must agree exactly on every field
    assert [f[:2] for f in ref_fields] == [f[:2] for f in our_fields]

    # labels: the pad semantics deliberately differ (reference pads to the
    # call's longest segment, ours to a chunk_dur bucket — docstring), so
    # for segments whose embeddings land measurably apart between the two
    # paddings label equality is UNDEFINED. Compare labels on the segments
    # where both sides' embeddings agree (the overwhelming majority).
    import torch

    with torch.no_grad():
        ref_embs = ref_pipe.do_emb_extraction(
            [[st, ed] for st, ed in ref_pipe.last_vad_time],
            torch.from_numpy(wav[None, :]))
    ours = our_pipe.last_embeddings
    cos = np.sum(ref_embs * ours, -1) / (
        np.linalg.norm(ref_embs, axis=-1) * np.linalg.norm(ours, axis=-1))
    agree = np.flatnonzero(cos > 0.999)
    assert len(agree) >= 0.8 * len(ref_fields), cos
    assert _canon([ref_fields[i] for i in agree]) == \
        _canon([our_fields[i] for i in agree])
    assert len(set(x[2] for x in ref_fields)) >= 2


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS)
def test_spectral_path_equivalence(paired_models, seed, tmp_path):
    fields = _run_pair(paired_models, "spectral", seed, tmp_path)
    assert len(fields) > 0


# ---------------------------------------------------------------------------
# trained-model equivalence: non-degenerate multi-cluster labels
# ---------------------------------------------------------------------------
# Random-weight embeddings of the synthetic voices do not separate (cross-
# speaker cosines overlap within-speaker ones; a BRIEFLY-trained tiny
# ERes2NetV2 does not either — its raw embedding carries a huge shared
# component that swamps emb-emb cosines at toy scale even at train acc 1.0).
# So the tests above exercise the label path only degenerately (everything
# merges), and here a tiny Xvector — which separates cleanly at this scale
# (within-speaker cos ~1.0, cross ~0.3-0.7; same recipe as
# tools/eval_diar_synthetic.py) — is TRAINED via the real cli/train,
# round-tripped into the reference's own torch Xvector through
# compat.export_torch_state_dict, and the clustering thresholds sit mid-gap
# so >= 2 clusters survive on both sides.

# hid 32 / stats 64 / embed 24 with 1.5 s crops: the r3 hid-16 config left
# cross-speaker cosines at 0.85-0.95 on weak training draws and the
# fixture's separation gate flaked ~1-in-3 runs (same root cause as the r4
# eval-tool fix, docs/PARITY.md) — this config holds the gate on every
# seed tried
XVEC_KW = dict(feat_dim=80, hid_dim=32, stats_dim=64, embed_dim=24)


@pytest.fixture(scope="module")
def trained_paired_models(tmp_path_factory):
    import torch
    import yaml

    from speaker3d_tpu.cli.extract import build_model_from_exp
    from speaker3d_tpu.cli.train import main as train_main
    from speaker3d_tpu.compat import export_torch_state_dict
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.utils.fileio import write_wav

    ref_mod = _import_ref_mod()
    from speakerlab.models.xvector.TDNN import Xvector as TorchXvector

    root = str(tmp_path_factory.mktemp("ref_equiv_trained"))
    rng = np.random.default_rng(7)
    rows = []
    for s, f0 in enumerate(F0S):
        for u in range(12):
            p = f"{root}/spk{s}_u{u}.wav"
            write_wav(p, _voice(rng, 2 * FS, f0), FS)
            rows.append((f"spk{s}_u{u}", p, f"spk{s}"))
    csv = f"{root}/train.csv"
    with open(csv, "w") as f:
        f.write("ID,wav,spk\n")
        f.writelines(f"{a},{b},{c}\n" for a, b, c in rows)

    # num_workers 1: crop positions come from the GLOBAL random module
    # shared across loader threads (reference WavReader semantics), so >1
    # worker makes the trained weights depend on thread scheduling — the
    # source of this fixture's r3-era run-to-run flake. One worker +
    # order-preserving pool.map = bit-deterministic training.
    cfg = {"exp_dir": f"{root}/exp", "data": csv, "wav_len": 1.5,
           "speed_pertub": False, "aug_prob": 0.0, "batch_size": 12,
           "num_workers": 1, "num_epoch": 40, "embedding_size": 24,
           "max_lr": 0.1, "min_lr": 0.005, "warmup_epoch": 2,
           "log_batch_freq": 100, "increase_start_epoch": 4,
           "margin_fix_epoch": 16, "final_margin": 0.4,
           "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                     "args": XVEC_KW}}
    cfg_path = f"{root}/cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    train_main(["--config", cfg_path])

    fm, variables, _ = build_model_from_exp(cfg["exp_dir"])
    embed_fn = build_embedding_fn(fm, variables, mean_norm=True)

    tm = TorchXvector(**XVEC_KW)
    # np.array(copy=True): jax buffers are read-only, from_numpy needs writable
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_torch_state_dict(variables).items()}
    res = tm.load_state_dict(sd, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in res.missing_keys), \
        res.missing_keys
    tm.eval()

    # the synthetic setup must actually separate, else the multi-cluster
    # tests silently degrade to the degenerate case above
    probe_rng = np.random.default_rng(99)
    wavs, labels = [], []
    for s, f0 in enumerate(F0S):
        for _ in range(6):
            wavs.append(_voice(probe_rng, int(1.5 * FS), f0))
            labels.append(s)
    z = np.array(embed_fn(np.stack(wavs)))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    aff = z @ z.T
    lab = np.array(labels)
    within = aff[(lab[:, None] == lab[None, :]) & ~np.eye(len(lab), dtype=bool)]
    cross = aff[lab[:, None] != lab[None, :]]
    # average-linkage and centroid merges act on MEANS, so the gate is on
    # the means. Non-harmonic voices + the 1.5 s-crop hid-32 config
    # (measured): within ~0.98, cross ~0.24 — a wide gap the 0.75 cluster
    # thresholds sit in the middle of.
    assert within.mean() > 0.95 and cross.mean() < 0.5, (
        within.mean(), cross.mean())
    return ref_mod, tm, embed_fn


# mid-gap thresholds for the trained embeddings (the fixture asserts
# within-speaker cos mean > 0.95 and cross < 0.5; 0.75 sits mid-gap, far
# from both — the r3-era 0.97/0.98 cuts lived at the within~1.0 noise
# floor and flipped on near-ties between the two sides'
# slightly-different whole-segment embeddings)
TRAINED_KW = {
    "AHC": dict(mer_cos=0.75, fix_cos_thr=0.75, min_cluster_size=0),
    "spectral": dict(mer_cos=0.75, min_cluster_size=4, pval=0.012,
                     max_num_spks=15),
}


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["AHC", "spectral"])
def test_trained_multicluster_equivalence(trained_paired_models, kind,
                                          tmp_path):
    fields = _run_pair(trained_paired_models, kind, seed=0,
                       tmp_path=tmp_path, cluster_kw=TRAINED_KW[kind],
                       min_clusters=2,
                       max_label_der=0.02 if kind == "spectral" else 0.0)
    assert len(fields) > 0


# ---------------------------------------------------------------------------
# overlap (Stage-5) equivalence: the reference's own post_process +
# binary_to_segs as oracle (VERDICT r3 item 1a)
# ---------------------------------------------------------------------------
# The reference's include_overlap path consumes pyannote SlidingWindowFeature
# objects (external download); both pipelines here are fed the SAME scripted
# segmenter output — ours natively (SlidingSegmentation), the reference's
# through minimal shims reproducing the exact pyannote.core semantics its
# methods use (closest_frame / Segment.middle / iteration). The reference
# code actually driven is its own __call__ composition with
# include_overlap=True: merge_vad + get_valid_field + post_process (Hungarian
# channel alignment, count-gated activation clipping, supplement fallback) +
# binary_to_segs (reference: bin/infer_diarization.py:259-315,651-725,
# 766-779). Only the external-library pieces are injected (TenVad -> shared
# EnergyVAD; pyannote Inference.aggregate -> shared aggregate_count), exactly
# as the non-overlap legs above inject them.


class _ShimSegment:
    """pyannote.core.Segment surface used by the reference: .start, .middle"""

    def __init__(self, start, end):
        self.start, self.end = start, end

    @property
    def middle(self):
        return 0.5 * (self.start + self.end)


class _ShimSlidingWindow:
    """pyannote.core.SlidingWindow: closest_frame + indexing -> Segment."""

    def __init__(self, start, duration, step):
        self.start, self.duration, self.step = start, duration, step

    def closest_frame(self, t):
        return int(np.rint(
            (t - self.start - 0.5 * self.duration) / self.step))

    def __getitem__(self, i):
        s = self.start + i * self.step
        return _ShimSegment(s, s + self.duration)


class _ShimSWF:
    """pyannote.core.SlidingWindowFeature: .data, .sliding_window, len,
    iteration yielding (window[i], data[i])."""

    def __init__(self, data, sliding_window):
        self.data = data
        self.sliding_window = sliding_window

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        for i in range(len(self.data)):
            yield self.sliding_window[i], self.data[i]


class ScriptedSegmenter:
    """Deterministic sliding-window 'segmentation model' shared verbatim by
    both pipelines: binary per-frame activity read off a ground-truth grid,
    with a per-window CHANNEL PERMUTATION (np.roll by window index) so the
    reference's per-chunk Hungarian alignment is genuinely exercised — a
    fixed channel order would make any argmax alignment pass too."""

    window_dur, step_dur = 5.0, 0.5
    frame_step, frame_duration = 0.01, 0.025

    def __init__(self, gt):
        self.gt = gt  # [num_frames, 3] binary global speaker activity

    def __call__(self, wav_1d, sample_rate=None):
        from speaker3d_tpu.diar.overlap import SlidingSegmentation

        n = np.asarray(wav_1d).reshape(-1).shape[0]
        dur = n / FS
        n_win = max(1, 1 + int(np.ceil(
            max(dur - self.window_dur, 0.0) / self.step_dur)))
        fpc = int(round(self.window_dur / self.frame_step))
        nf = int(np.ceil(dur / self.frame_step))
        gt = self.gt
        if gt.shape[0] < nf:
            gt = np.pad(gt, ((0, nf - gt.shape[0]), (0, 0)))
        data = np.zeros((n_win, fpc, 3), np.float32)
        starts = np.zeros(n_win, np.float64)
        for k in range(n_win):
            starts[k] = k * self.step_dur
            f0 = int(round(starts[k] / self.frame_step))
            data[k] = gt[f0:f0 + fpc][:, np.roll(np.arange(3), k)]
        return SlidingSegmentation(data=data, chunk_starts=starts,
                                   frame_step=self.frame_step,
                                   frame_duration=self.frame_duration)


def _ref_do_segmentation(segmenter, threshold=0.5):
    """Reference-side stand-in for Diarization3Dspeaker.do_segmentation:
    the same segmenter + the same aggregation (pyannote Inference.aggregate
    is external-library code, so — like TenVad — the shared in-repo
    implementation is injected on both sides), wrapped in pyannote-semantics
    shims for the reference's own downstream methods."""
    from speaker3d_tpu.diar.overlap import run_segmentation

    def do_seg(wav_data):
        w = np.asarray(wav_data).reshape(-1)
        seg, count = run_segmentation(segmenter, w, FS, threshold=threshold)
        seg_swf = _ShimSWF(
            (seg.data > threshold).astype(np.float64),
            _ShimSlidingWindow(0.0, segmenter.window_dur, segmenter.step_dur))
        count_swf = _ShimSWF(
            count.data[:, None],
            _ShimSlidingWindow(0.0, count.frame_duration, count.frame_step))
        return seg_swf, count_swf

    return do_seg


def _conversation_overlap(seed, dur=60.0):
    """Sequential 3-speaker conversation + 2 genuine overlap events (a
    second voice mixed INTO a turn, both marked in gt) + one turn the
    segmenter 'misses' entirely (gt zeroed -> exercises the reference's
    supplement_field fallback where clustering found speech but the gated
    activations are empty)."""
    rng = np.random.default_rng(seed)
    fs_step = ScriptedSegmenter.frame_step
    wav = 0.002 * rng.standard_normal(int(dur * FS)).astype(np.float32)
    nf = int(np.ceil(dur / fs_step))
    gt = np.zeros((nf, 3), np.float32)
    f0s = F0S
    turns = []
    t, spk = 1.0, 0

    def mark(a, b, s, v=1.0):
        gt[int(round(a / fs_step)):int(round(b / fs_step)), s] = v

    while t < dur - 6.0:
        turn = rng.uniform(2.0, 4.5)
        n = int(turn * FS)
        wav[int(t * FS):int(t * FS) + n] += _voice(rng, n, f0s[spk])
        turns.append((t, t + turn, spk))
        mark(t, t + turn, spk)
        t += turn + rng.uniform(0.4, 1.0)
        spk = (spk + 1) % 3
    overlaps = []
    for a, b, s in [tu for tu in turns if tu[1] - tu[0] > 3.0][:2]:
        # overlap near the END of the host turn, secondary = the NEXT
        # turn's speaker: >=1 segmentation window then spans both the
        # overlap and the secondary's adjacent solo turn, which is what
        # the per-window Hungarian alignment structurally requires to map
        # the second channel to its cluster (same design as the r4
        # eval-tool conversation, docs/PARITY.md)
        o0, o1 = b - 2.0, b - 0.5
        s2 = (s + 1) % 3
        n = int((o1 - o0) * FS)
        # second voice mixed at 0.4x: audible overlap without letting the
        # mixed-chunk embeddings bridge the primary speakers' clusters —
        # the overlap ACTIVATIONS come from the segmenter gt, not the audio
        wav[int(o0 * FS):int(o0 * FS) + n] += 0.4 * _voice(rng, n, f0s[s2])
        mark(o0, o1, s2)
        overlaps.append((o0, o1))
    dropped = [tu for tu in turns
               if all(not (o0 < tu[1] and tu[0] < o1)
                      for o0, o1 in overlaps)][3]
    gt[int(round(dropped[0] / fs_step)):
       int(round(dropped[1] / fs_step)), :] = 0.0
    return np.clip(wav, -1.0, 1.0), gt, overlaps, dropped


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS)
def test_overlap_path_equivalence(trained_paired_models, seed, tmp_path):
    from speaker3d_tpu.diar.pipeline import DiarizationPipeline
    from speaker3d_tpu.diar.vad import EnergyVAD

    ref_mod, tm, embed_fn = trained_paired_models
    ref_cluster, our_cluster = _make_clusters(ref_mod, "AHC",
                                              TRAINED_KW["AHC"])
    wav, gt, overlaps, dropped = _conversation_overlap(seed)
    segmenter = ScriptedSegmenter(gt)

    ref_pipe = _make_ref_pipeline(
        ref_mod, tm, TorchKaldiFbank(mean_nor=True),
        RefVadAdapter(EnergyVAD(FS)), ref_cluster)
    ref_pipe.include_overlap = True
    ref_pipe.do_segmentation = _ref_do_segmentation(segmenter)
    our_pipe = DiarizationPipeline(
        embed_fn, sample_rate=FS, vad=EnergyVAD(FS), cluster=our_cluster,
        segmentation_model=segmenter, segmentation_threshold=0.5)

    ref_fields = ref_pipe(wav[None, :], wav_fs=FS)
    our_fields = our_pipe(wav, wav_fs=FS)

    # merged VAD (VAD union segmentation valid_field) must agree bitwise:
    # pins reference get_valid_field + merge_vad against ours in composition
    assert ref_pipe.last_vad_time == our_pipe.last_vad_time
    # final overlap-refined fields: exact equality (AHC ids deterministic)
    assert ref_fields == our_fields
    assert len({f[2] for f in ref_fields}) >= 2

    def active_at(fields, t):
        return {cid for st, ed, cid in fields if st < t < ed}

    # at least one injected overlap event surfaces as simultaneous
    # different-speaker segments in the FINAL output of both sides
    assert any(len(active_at(ref_fields, 0.5 * (o0 + o1))) >= 2
               for o0, o1 in overlaps), (overlaps, ref_fields)
    # the gt-dropped turn survives via the supplement_field fallback
    assert len(active_at(ref_fields, 0.5 * (dropped[0] + dropped[1]))) >= 1

    # byte-identical RTTM from each side's own writer
    ref_rttm = tmp_path / f"ref_ov_{seed}.rttm"
    our_rttm = tmp_path / f"our_ov_{seed}.rttm"
    ref_pipe.save_diar_output(str(ref_rttm), wav_id="conv",
                              output_field_labels=ref_fields)
    our_pipe.save_diar_output(str(our_rttm), wav_id="conv",
                              output_field_labels=our_fields)
    assert ref_rttm.read_bytes() == our_rttm.read_bytes()


def test_export_torch_state_dict_roundtrip():
    """torch -> flax -> torch must reproduce every tensor bit-for-bit."""
    import torch

    from speaker3d_tpu.compat import export_torch_state_dict, load_into_model
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2 as FlaxERes2NetV2

    _import_ref_mod()
    from speakerlab.models.eres2net.ERes2NetV2 import (
        ERes2NetV2 as TorchERes2NetV2)

    torch.manual_seed(3)
    tm = TorchERes2NetV2(**MODEL_KW)
    variables = load_into_model(
        FlaxERes2NetV2(**MODEL_KW), tm.state_dict(),
        np.zeros((1, 150, 80), np.float32))
    back = export_torch_state_dict(variables)
    sd = tm.state_dict()
    torch_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert torch_keys == set(back)
    for k in torch_keys:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)


def test_torch_fbank_matches_golden():
    """The injected reference-side fbank must itself match the golden
    numpy Kaldi implementation (which the frozen C++ oracle pins)."""
    import torch

    from tests.golden_fbank import golden_fbank

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(FS).astype(np.float32) * 0.1
    ref = golden_fbank(wav, mean_norm=True)
    got = TorchKaldiFbank(mean_nor=True)(torch.from_numpy(wav)).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_vad_postprocessing_matches_reference_methods():
    """Pin our VAD post-processing chain against the reference's own
    _post_process_speech_flags / _refine_vad_boundaries_with_energy /
    _mask_to_intervals methods run directly (reference:
    bin/infer_diarization.py:330-483) on randomized flags + audio —
    stronger than the in-repo sequential oracle used by tests/test_vad.py."""
    from speaker3d_tpu.diar import vad as vad_mod

    ref_mod = _import_ref_mod()
    D = ref_mod.Diarization3Dspeaker.__new__(ref_mod.Diarization3Dspeaker)
    D.fs = FS
    D.vad_frame_size_ms = 16.0
    D.vad_min_speech_ms = 200.0
    D.vad_max_silence_ms = 300.0
    D.vad_energy_threshold = 0.05
    D.vad_boundary_expansion_ms = 10.0
    D.vad_boundary_energy_percentile = 10.0

    rng = np.random.default_rng(21)
    hop = int(16.0 * FS / 1000)
    for trial in range(5):
        n = int(rng.uniform(3.0, 8.0) * FS)
        wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
        # speech-shaped bursts so energy refinement has structure
        for _ in range(rng.integers(1, 5)):
            s = int(rng.uniform(0, 0.8) * n)
            e = min(n, s + int(rng.uniform(0.3, 2.0) * FS))
            wav[s:e] += 0.4 * np.sin(
                2 * np.pi * 300 * np.arange(e - s) / FS).astype(np.float32)
        flags = (rng.random(n // hop) < 0.5).astype(int).tolist()

        ref_processed, ref_refined, ref_time = D.postprocess_vad(flags, wav)

        processed = vad_mod.post_process_speech_flags(flags, 16.0, 200.0,
                                                      300.0)
        processed_mask = vad_mod.flags_to_mask(processed, n, hop)
        refined = vad_mod.refine_vad_boundaries_with_energy(
            wav, processed_mask, FS, 0.05, 10.0, 10.0)
        ours_time = vad_mod.mask_to_intervals(refined, FS)

        np.testing.assert_array_equal(ref_processed, processed_mask,
                                      err_msg=f"trial {trial} processed")
        np.testing.assert_array_equal(ref_refined, refined,
                                      err_msg=f"trial {trial} refined")
        assert [list(map(float, t)) for t in ref_time] == \
            [list(map(float, t)) for t in ours_time], trial


def test_small_helpers_match_reference_functions():
    """Fuzz compressed_seg / merge_vad / circle_pad against the reference's
    own functions run directly (reference: bin/infer_diarization.py:780-797,
    utils/utils.py:129-138, utils/utils.py:232-238)."""
    import torch

    from speaker3d_tpu.diar.pipeline import circle_pad, compressed_seg
    from speaker3d_tpu.diar.vad import merge_vad

    ref_mod = _import_ref_mod()
    from speakerlab.utils.utils import circle_pad as ref_circle_pad
    from speakerlab.utils.utils import merge_vad as ref_merge_vad

    rng = np.random.default_rng(33)
    for trial in range(20):
        # compressed_seg: random chunk fields with overlaps + repeats
        n = int(rng.integers(1, 30))
        st = np.cumsum(rng.uniform(0.0, 1.0, n))
        fields = [[float(s), float(s + rng.uniform(0.5, 2.0)),
                   int(rng.integers(0, 3))] for s in st]
        ref = ref_mod.compressed_seg([list(f) for f in fields])
        ours = compressed_seg([list(f) for f in fields])
        assert ref == ours, trial

        # merge_vad: two random interval lists
        def ivals(k):
            out = []
            t = 0.0
            for _ in range(k):
                t += rng.uniform(0.0, 1.0)
                out.append([t, t + rng.uniform(0.1, 1.5)])
            return out

        a, b = ivals(int(rng.integers(0, 8))), ivals(int(rng.integers(0, 8)))
        assert ref_merge_vad([list(x) for x in a], [list(x) for x in b]) \
            == merge_vad(a, b), trial

        # circle_pad on the shared domain (m <= target; the reference's
        # call sites never produce m > target — there it returns the input
        # unchanged while our static-shape path truncates, see the
        # circle_pad docstring)
        m = int(rng.integers(1, 50))
        target = int(rng.integers(m, 80))
        x = rng.standard_normal(m).astype(np.float32)
        want = ref_circle_pad(torch.from_numpy(x), target).numpy()
        np.testing.assert_array_equal(circle_pad(x, target), want,
                                      err_msg=str(trial))
        # our truncation branch stays exact-length (static shapes)
        assert circle_pad(x, max(m - 1, 1)).shape[0] == max(m - 1, 1)
