"""End-to-end diarization CLI.

Behavioral contract (reference: speakerlab/bin/infer_diarization.py:897-1111
main/main_process): wav list or directory, per-file: run the diarization
pipeline, write RTTM + JSON outputs plus the fork's diagnostic sidecars
(.meta.json RTF, .vad_info.json, .pairs.json, .vad_masked.wav). Work is
sharded across hosts by file (rank::nprocs -> jax.process_index()).

Usage:
  python -m speaker3d_tpu.cli.infer_diarization --wav a.wav [b.wav ...] \
      --out_dir out/ [--model_id iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common]
      [--speaker_num N] [--out_type rttm|json] [--sidecar]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Speaker diarization")
    p.add_argument("--wav", nargs="+", required=True,
                   help="wav files / dirs / list files (.list)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_id",
                   default="iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common")
    p.add_argument("--local_model_dir", default="pretrained")
    p.add_argument("--exp_dir", default=None,
                   help="use a trained experiment instead of --model_id")
    p.add_argument("--out_type", choices=["rttm", "json"], default="rttm")
    p.add_argument("--speaker_num", type=int, default=None)
    p.add_argument("--vad_threshold", type=float, default=0.5)
    p.add_argument("--vad_exp_dir", default=None,
                   help="use a trained DFSMN VAD experiment "
                        "(cli/train_vad.py) instead of TenVad/EnergyVAD")
    # VAD post-processing knobs (reference fork exposes these through its
    # batch drivers, e.g. run_diarization_speech_estimate.py:88-107)
    p.add_argument("--vad_min_speech_ms", type=float, default=200.0,
                   help="drop speech segments shorter than this")
    p.add_argument("--vad_max_silence_ms", type=float, default=300.0,
                   help="fill silence gaps up to this long")
    p.add_argument("--vad_energy_threshold", type=float, default=0.05,
                   help="energy floor for boundary refinement")
    p.add_argument("--vad_boundary_expansion_ms", type=float, default=10.0,
                   help="re-expansion margin after energy contraction")
    p.add_argument("--vad_boundary_energy_percentile", type=float,
                   default=10.0,
                   help="dynamic-threshold percentile for boundary "
                        "refinement")
    p.add_argument("--include_overlap", action="store_true",
                   help="overlap-aware post-processing via a sliding "
                        "segmentation model (reference uses pyannote "
                        "segmentation-3.0; here a native FSMN segmenter "
                        "trained with cli/train_segmentation.py)")
    p.add_argument("--segmentation_threshold", type=float, default=0.5,
                   help="binarization threshold for the overlap segmenter's "
                        "per-speaker activations (reference hardcodes "
                        "pyannote's 0.5; raise to cut count false alarms)")
    p.add_argument("--segmentation_exp_dir", default=None,
                   help="cli/train_segmentation.py experiment dir "
                        "(required with --include_overlap)")
    p.add_argument("--cluster_type", default="AHC",
                   choices=["AHC", "spectral", "umap_hdbscan"],
                   help="clustering backend (fork default: AHC; 'spectral' "
                        "matches the recipe path conf/diar.yaml; "
                        "'umap_hdbscan' uses the in-repo native UMAP+HDBSCAN "
                        "when the external libs are absent)")
    p.add_argument("--cluster_backend", default="auto",
                   choices=["auto", "numpy", "jax", "nnchain",
                            "nnchain_device"],
                   help="clustering numerics backend. spectral: 'jax' runs "
                        "the O(N^2) stages on the accelerator (LOBPCG past "
                        "2048 chunks, 93x host at 8k; 'auto' = numpy). "
                        "AHC: 'auto' (default) = exact scipy to 4096 "
                        "chunks, then the O(Nd)-memory NN-chain linkage — "
                        "on-device (whole dendrogram in one dispatch) when "
                        "an accelerator is present; 'nnchain'/"
                        "'nnchain_device' force it; 'jax' moves only the "
                        "affinity on-device (download-bound). Caveat: "
                        "'nnchain_device' builds the dendrogram in float32, "
                        "so near-tie merge order (and labels) can drift "
                        "from scipy's float64 linkage at hour scale — the "
                        "auto cutover logs a warning; force 'numpy' for "
                        "exact reference parity. docs/BENCH.md.")
    p.add_argument("--cluster_seed", type=int, default=None,
                   help="random_state for the spectral path's k-means "
                        "(default None = reference behavior: sklearn draws "
                        "from the global numpy RNG and near-tie label "
                        "splits can flip run to run; an int makes "
                        "clustering reproducible)")
    p.add_argument("--cluster_mer_cos", type=float, default=0.3)
    p.add_argument("--cluster_fix_cos_thr", type=float, default=0.3)
    p.add_argument("--cluster_min_cluster_size", type=int, default=0)
    p.add_argument("--cluster_min_cluster_ratio", type=float, default=None,
                   help="relative minor-cluster threshold: effective size = "
                        "max(min_cluster_size, ceil(ratio*num_chunks)) — "
                        "keeps the filter calibrated across chunk_step "
                        "changes (arXiv:2606.08505)")
    p.add_argument("--cluster_pval", type=float, default=0.012,
                   help="spectral p-pruning value (recipe conf/diar.yaml)")
    p.add_argument("--chunk_dur", type=float, default=1.5)
    p.add_argument("--chunk_step", type=float, default=0.75)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--no_chunk_after_vad", action="store_true")
    p.add_argument("--nprocs", type=int, default=1,
                   help="local process fan-out: files are round-robin "
                        "sharded rank::nprocs across spawned subprocesses "
                        "(reference: mp.spawn per GPU). Caution: >1 is for "
                        "CPU/multi-device hosts — never run two processes "
                        "against a single shared TPU")
    p.add_argument("--sidecar", action="store_true",
                   help="write .meta.json/.vad_info.json/.pairs.json/"
                        ".vad_masked.wav diagnostics")
    return p.parse_args(argv)


def collect_wavs(specs):
    """(reference: bin/infer_diarization.py wav list handling)"""
    wavs = []
    for spec in specs:
        if os.path.isdir(spec):
            wavs += sorted(glob.glob(os.path.join(spec, "*.wav")))
        elif spec.endswith(".list") or spec.endswith(".txt"):
            with open(spec) as f:
                wavs += [line.strip() for line in f if line.strip()]
        else:
            wavs.append(spec)
    return wavs


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    import jax

    from speaker3d_tpu.diar.pipeline import DiarizationPipeline
    from speaker3d_tpu.eval.embedding import build_embedding_fn
    from speaker3d_tpu.parallel.mesh import process_shard
    from speaker3d_tpu.utils.fileio import load_audio, write_wav

    args = get_args(argv)
    if args.include_overlap and not args.segmentation_exp_dir:
        raise SystemExit("--include_overlap requires --segmentation_exp_dir "
                         "(train one with cli/train_segmentation.py)")
    os.makedirs(args.out_dir, exist_ok=True)

    # local fan-out (reference: mp.spawn(main_process, nprocs),
    # bin/infer_diarization.py:1108)
    from speaker3d_tpu.utils.fanout import maybe_fanout

    if maybe_fanout("speaker3d_tpu.cli.infer_diarization", argv, args.nprocs):
        return

    if args.exp_dir:
        from speaker3d_tpu.cli.extract import build_model_from_exp

        model, variables, _ = build_model_from_exp(args.exp_dir)
    else:
        from speaker3d_tpu.cli.registry import load_pretrained

        model, variables = load_pretrained(args.model_id, args.local_model_dir)

    embed_fn = build_embedding_fn(model, variables, precision="high")
    vad = None
    if args.vad_exp_dir:
        from speaker3d_tpu.diar.dnn_vad import load_vad_exp

        vad = load_vad_exp(args.vad_exp_dir, threshold=args.vad_threshold)
    segmentation = None
    if args.include_overlap:
        from speaker3d_tpu.diar.dnn_seg import load_segmentation_exp

        segmentation = load_segmentation_exp(args.segmentation_exp_dir)
    cluster = None
    if args.cluster_type != "AHC" or args.cluster_backend != "auto":
        from speaker3d_tpu.diar.cluster import CommonClustering

        kw = {}
        if args.cluster_type == "spectral":
            # SpectralCluster has numpy/jax paths only; auto = numpy
            kw = dict(pval=args.cluster_pval, max_num_spks=15,
                      oracle_num=args.speaker_num,
                      random_state=args.cluster_seed,
                      backend=("numpy" if args.cluster_backend
                               in ("auto", "nnchain", "nnchain_device")
                               else args.cluster_backend))
        elif args.cluster_type == "AHC":
            kw = dict(fix_cos_thr=args.cluster_fix_cos_thr,
                      backend=args.cluster_backend)
        # AHC must keep the pipeline's min_cluster_size semantics (the
        # backend flag changes numerics only, not post-filtering);
        # spectral/umap keep the recipe default of 4 when unset.
        min_csize = (args.cluster_min_cluster_size
                     if args.cluster_type == "AHC"
                     else args.cluster_min_cluster_size or 4)
        cluster = CommonClustering(
            args.cluster_type, mer_cos=args.cluster_mer_cos,
            min_cluster_size=min_csize,
            min_cluster_ratio=args.cluster_min_cluster_ratio, **kw)
    pipe = DiarizationPipeline(
        embed_fn,
        vad=vad,
        cluster=cluster,
        vad_threshold=args.vad_threshold,
        vad_min_speech_ms=args.vad_min_speech_ms,
        vad_max_silence_ms=args.vad_max_silence_ms,
        vad_energy_threshold=args.vad_energy_threshold,
        vad_boundary_expansion_ms=args.vad_boundary_expansion_ms,
        vad_boundary_energy_percentile=args.vad_boundary_energy_percentile,
        segmentation_model=segmentation,
        segmentation_threshold=args.segmentation_threshold,
        cluster_mer_cos=args.cluster_mer_cos,
        cluster_fix_cos_thr=args.cluster_fix_cos_thr,
        cluster_min_cluster_size=args.cluster_min_cluster_size,
        cluster_min_cluster_ratio=args.cluster_min_cluster_ratio,
        chunk_dur=args.chunk_dur,
        chunk_step=args.chunk_step,
        batch_size=args.batch_size,
        no_chunk_after_vad=args.no_chunk_after_vad,
        speaker_num=args.speaker_num,
    )

    wavs = process_shard(collect_wavs(args.wav))
    for wav_path in wavs:
        base = os.path.splitext(os.path.basename(wav_path))[0]
        fields = pipe(wav_path, speaker_num=args.speaker_num)
        out_file = os.path.join(args.out_dir, f"{base}.{args.out_type}")
        pipe.save_diar_output(out_file, wav_id=base)
        print(f"{base}: {len(fields)} segments, "
              f"{len({f[2] for f in fields})} speakers -> {out_file}")
        if args.sidecar:
            # the pipeline's own waveform object: same audio as a fresh
            # load_audio, but identity-keyed reuse of the resident upload —
            # a re-decoded array would re-quantize and re-upload the whole
            # file for the .pairs.json re-embedding
            wav_1d = pipe.last_wav_1d
            pipe.save_vad_info(os.path.join(args.out_dir,
                                            f"{base}.vad_info.json"))
            # pairs BEFORE meta: meta carries the pairwise min/mean stats
            # (reference: bin/infer_diarization.py:1031-1051)
            pipe.save_pairs(os.path.join(args.out_dir, f"{base}.pairs.json"),
                            wav_1d=wav_1d)
            pipe.save_meta(os.path.join(args.out_dir, f"{base}.meta.json"),
                           wav_1d.shape[-1] / 16000.0, wav_path=wav_path)
            if pipe.last_vad_masked_audio is not None:
                write_wav(os.path.join(args.out_dir, f"{base}.vad_masked.wav"),
                          pipe.last_vad_masked_audio, 16000)
            try:
                pipe.save_vad_plot(os.path.join(args.out_dir, f"{base}.vad.png"),
                                   wav_1d=wav_1d)
            except Exception as e:  # plotting is best-effort (fork behavior)
                print(f"[WARNING] vad plot failed: {e}")


if __name__ == "__main__":
    main()
