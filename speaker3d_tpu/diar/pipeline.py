"""End-to-end speaker diarization pipeline, TPU-native.

Behavioral contract (reference: speakerlab/bin/infer_diarization.py
Diarization3Dspeaker, :191-315): VAD -> post-processing -> energy boundary
refinement -> sliding 1.5 s / 0.75 s chunking per speech interval -> batched
embedding extraction (circle-padded, fbank + backbone on device) -> AHC
clustering (mer_cos .3 / fix_cos_thr .3) -> compressed segment list ->
RTTM/JSON output + diagnostic sidecars (.meta.json RTF, .pairs.json cosines,
.vad_info.json).

TPU-first notes
---------------
- Chunks are a *static* shape: every chunk is circle-padded to exactly
  chunk_dur seconds and batched to a fixed batch size, so the jitted
  fbank+backbone executable compiles once and is reused for every file.
- Host does VAD/clustering (cheap, O(N) / O(N^2) scalar work); the device
  does fbank + embedding (all the FLOPs) in one fused jit per batch.
"""

from __future__ import annotations

import json
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from speaker3d_tpu.diar import vad as vad_mod
from speaker3d_tpu.diar.cluster import CommonClustering
from speaker3d_tpu.utils.fileio import load_audio

# Device-resident audio (r5): each file's waveform uploads ONCE and chunk
# slicing + circle-padding happen on device, so the embed stage ships ~1x
# the audio bytes (int16 when exact) instead of ~3x (the 2x chunk-overlap
# redundancy x float32 of the old host slice/pad/stack path). Uploads pad
# HOST-side to a multiple of WAV_SLAB samples (wire-cheap, <=0.5 MB), then
# DEVICE-side to a power-of-two slab count (zeros appended by a tiny jit —
# no extra wire bytes), so every executable that takes the resident wav as
# an argument sees O(log) distinct shapes. That bound matters since the
# fused gather+embed jit (late r5) compiles the FULL model per wav shape:
# without bucketing, a directory of mixed-duration files would recompile
# the 53.6M flagship once per ~16 s length class.
WAV_SLAB = 1 << 18  # 262,144 samples = 16.384 s

_GATHER_CACHE: dict = {}


def _pad_to_bucket_jit():
    """Tiny device-side zero-pad (cheap compile per (in, out) length pair;
    the appended tail is never addressed by the chunk gather — starts+lens
    come from VAD intervals inside the real audio)."""
    fn = _GATHER_CACHE.get("pad")
    if fn is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def pad_to(w, n):
            return jnp.concatenate([w, jnp.zeros(n - w.shape[0], w.dtype)])

        fn = _GATHER_CACHE["pad"] = pad_to
    return fn


def _gather_chunks_jit():
    """Module-level cache for the jitted on-device chunk gather (a
    method-local jit would recompile every call — CLAUDE.md)."""
    fn = _GATHER_CACHE.get("fn")
    if fn is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        @partial(jax.jit, static_argnames=("chunk_len",))
        def gather(wav, starts, lens, chunk_len):
            # wav: [k*WAV_SLAB] int16|float32 resident waveform
            # starts/lens: [B] int32 host scalars per chunk
            # out: [B, chunk_len] float32, circle-padded exactly like the
            # host path (reference: utils/utils.py:232-238 circle_pad +
            # bin/infer_diarization.py:621-639 slice/pad/stack)
            t = jnp.arange(chunk_len, dtype=jnp.int32)
            n = jnp.maximum(lens, 1)[:, None]
            idx = starts[:, None] + t[None, :] % n
            chunks = wav[idx]
            if chunks.dtype == jnp.int16:
                # k/32768 is an exact power-of-two scale: bitwise equal to
                # the host int16->float32 conversion (tests pin this)
                chunks = chunks.astype(jnp.float32) * jnp.float32(1 / 32768)
            else:
                chunks = chunks.astype(jnp.float32)
            # empty host slice -> reference substitutes zeros(1) -> all-zero
            # chunk; batch-pad rows (lens==0) zero the same way
            return jnp.where(lens[:, None] == 0, jnp.float32(0), chunks)

        fn = _GATHER_CACHE["fn"] = gather
    return fn


# shared with the chunked batch-extraction wire (cli/extract.py); kept
# under the old name here because the resident-wav tests pin it
from speaker3d_tpu.utils.wire import wire_quantize as _wire_quantize  # noqa: E402


def circle_pad(x: np.ndarray, target_len: int) -> np.ndarray:
    """Tile-pad a waveform to target length. (reference: utils/utils.py:232-238)

    Deliberate difference for inputs LONGER than target: the reference
    returns the input unchanged (a case its call sites never produce —
    targets are always maxima over the padded set); we truncate, because
    the static-shape device path requires exactly ``target_len`` samples.
    Equality on the shared domain is fuzz-pinned
    (tests/test_ref_pipeline_equiv.py)."""
    n = x.shape[0]
    if n >= target_len:
        return x[:target_len]
    reps = -(-target_len // n)
    return np.tile(x, reps)[:target_len]


def compressed_seg(seg_list):
    """Merge adjacent same-speaker chunks; split overlaps at the midpoint.
    (reference: bin/infer_diarization.py:780-797)"""
    new_list: List[list] = []
    for i, (st, ed, cid) in enumerate(seg_list):
        if i == 0:
            new_list.append([st, ed, cid])
        elif cid == new_list[-1][2]:
            if st > new_list[-1][1]:
                new_list.append([st, ed, cid])
            else:
                new_list[-1][1] = ed
        else:
            if st < new_list[-1][1]:
                p = (new_list[-1][1] + st) / 2
                new_list[-1][1] = p
                st = p
            new_list.append([st, ed, cid])
    return new_list


def sliding_chunks(st: float, ed: float, dur: float, step: float):
    """Sliding windows over [st, ed]; short leftovers keep their true end.
    (reference: bin/infer_diarization.py:606-619)"""
    chunks = []
    if ed - st <= 0:
        return chunks
    sub_st = st
    made = False
    while sub_st + dur < ed + step:
        chunks.append([sub_st, min(sub_st + dur, ed)])
        sub_st += step
        made = True
    if not made:
        chunks.append([st, ed])
    return chunks


class DiarizationPipeline:
    """Python API mirroring the reference Diarization3Dspeaker class.

    ``embed_fn``: callable mapping a float32 waveform batch [B, L] to
    embeddings [B, D] (typically a jitted fbank+backbone; see
    speaker3d_tpu.eval.embedding.build_embedding_fn).
    """

    def __init__(self,
                 embed_fn: Callable,
                 sample_rate: int = 16000,
                 vad: Optional[Callable] = None,
                 cluster: Optional[Callable] = None,
                 speaker_num: Optional[int] = None,
                 no_chunk_after_vad: bool = False,
                 vad_threshold: float = 0.5,
                 vad_min_speech_ms: float = 200.0,
                 vad_max_silence_ms: float = 300.0,
                 vad_energy_threshold: float = 0.05,
                 vad_boundary_expansion_ms: float = 10.0,
                 vad_boundary_energy_percentile: float = 10.0,
                 cluster_mer_cos: float = 0.3,
                 cluster_fix_cos_thr: float = 0.3,
                 cluster_min_cluster_size: int = 0,
                 cluster_min_cluster_ratio: Optional[float] = None,
                 chunk_dur: float = 1.5,
                 chunk_step: float = 0.75,
                 batch_size: int = 64,
                 dispatch_depth: int = 4,
                 segmentation_model=None,
                 segmentation_threshold: float = 0.5):
        self.embed_fn = embed_fn
        self.fs = sample_rate
        self.vad_model = vad or vad_mod.try_ten_vad(
            sample_rate, threshold=vad_threshold) or vad_mod.EnergyVAD(
                sample_rate, threshold=vad_threshold)
        self.cluster = cluster if cluster is not None else CommonClustering(
            "AHC", mer_cos=cluster_mer_cos, fix_cos_thr=cluster_fix_cos_thr,
            min_cluster_size=cluster_min_cluster_size,
            min_cluster_ratio=cluster_min_cluster_ratio)
        self.speaker_num = speaker_num
        self.no_chunk_after_vad = no_chunk_after_vad
        self.chunk_dur = chunk_dur
        self.chunk_step = chunk_step
        self.batch_size = batch_size
        self.dispatch_depth = max(2, int(dispatch_depth))
        self.segmentation_model = segmentation_model
        self.segmentation_threshold = segmentation_threshold

        # TenVad/EnergyVAD emit 16 ms-hop flags; a DnnVAD advertises its
        # native fbank hop via `.frame_ms` (diar/dnn_vad.py)
        self.vad_frame_size_ms = float(getattr(self.vad_model, "frame_ms", 16.0))
        self.vad_min_speech_ms = vad_min_speech_ms
        self.vad_max_silence_ms = vad_max_silence_ms
        self.vad_energy_threshold = vad_energy_threshold
        self.vad_boundary_expansion_ms = vad_boundary_expansion_ms
        self.vad_boundary_energy_percentile = vad_boundary_energy_percentile

        # diagnostic state from the last call (fork sidecar surface)
        self.output_field_labels = None
        self.last_vad_time = None
        self.last_vad_time_raw = None
        self.last_vad_time_processed = None
        self.last_vad_refined_mask = None
        self._masked_audio_parts = None
        self._masked_audio_cache = None
        self.last_chunks = None
        self.last_wav_1d = None
        self.last_embeddings = None
        self.last_elapsed = None
        # wire diagnostics from the last upload: {'dtype', 'bytes'} — int16
        # when the source was exactly PCM16-representable, else float32
        self.last_wire = None
        # wall-clock per stage from the last call: keys vad, vad_post,
        # [segmentation,] embed, cluster[, overlap_post] — the fork's RTF
        # sidecar (.meta.json) broken down so host/device share is visible
        self.last_stage_times = {}

    @property
    def last_vad_masked_audio(self):
        """[1, n] waveform with non-speech zeroed (the .vad_masked.wav
        sidecar), computed lazily on first access."""
        if self._masked_audio_cache is None and self._masked_audio_parts:
            wav_1d, refined_mask = self._masked_audio_parts
            self._masked_audio_cache = (wav_1d * refined_mask)[None]
        return self._masked_audio_cache

    @last_vad_masked_audio.setter
    def last_vad_masked_audio(self, value):
        self._masked_audio_cache = value
        self._masked_audio_parts = None

    # ---- stages ------------------------------------------------------------

    def do_vad(self, wav_1d):
        return self.vad_model(wav_1d)

    def postprocess_vad(self, flags, wav_1d):
        hop = int(self.vad_frame_size_ms * self.fs / 1000)
        processed = vad_mod.post_process_speech_flags(
            flags, self.vad_frame_size_ms, self.vad_min_speech_ms,
            self.vad_max_silence_ms)
        processed_mask = vad_mod.flags_to_mask(processed, len(wav_1d), hop)
        refined_mask = vad_mod.refine_vad_boundaries_with_energy(
            wav_1d, processed_mask, self.fs, self.vad_energy_threshold,
            self.vad_boundary_energy_percentile, self.vad_boundary_expansion_ms)
        vad_time = vad_mod.mask_to_intervals(refined_mask, self.fs)
        return processed_mask, refined_mask, vad_time

    def _issue_resident_wav(self, wav_1d):
        """Start the one-per-file waveform upload (int16 wire when every
        sample is exactly k/32768 — bitwise-exact device reconstruction —
        else float32), padded to a WAV_SLAB multiple for a bounded
        executable count. The device_put runs on a background thread: on
        this harness the call itself blocks for the transfer (~5 s for
        90 min int16), so issuing inline would serialize it with host VAD
        instead of overlapping. Cached per wav object so save_pairs reuses
        the upload."""
        cached = getattr(self, "_resident_cache", None)
        if cached is not None and cached[0] is wav_1d:
            return
        import jax  # noqa: F401  (probe: raise ImportError before spawning)
        from concurrent.futures import ThreadPoolExecutor

        def quantize_pad_upload():
            import jax

            w16 = _wire_quantize(wav_1d)
            host = w16 if w16 is not None else np.ascontiguousarray(
                wav_1d, dtype=np.float32)
            pad = (-len(host)) % WAV_SLAB
            if pad:
                host = np.concatenate([host, np.zeros(pad, host.dtype)])
            self.last_wire = {"dtype": str(host.dtype), "bytes": host.nbytes}
            dev = jax.device_put(host)
            # device-side zero-pad to a power-of-two slab count: the wire
            # ships only the host bytes above, but executables keyed on the
            # wav shape (the fused gather+embed jit compiles the full model
            # per shape) stay O(log) classes across a mixed-duration corpus
            k = host.shape[0] // WAV_SLAB
            kb = 1 << (k - 1).bit_length()
            if kb != k:
                dev = _pad_to_bucket_jit()(dev, kb * WAV_SLAB)
            return dev

        pool = getattr(self, "_upload_pool", None)
        if pool is None:
            pool = self._upload_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="resident_wav")
        self._resident_cache = (wav_1d, pool.submit(quantize_pad_upload))

    def _resident_wav(self, wav_1d):
        """Device-resident waveform for `wav_1d` (issues the upload if the
        early issue in __call__ did not run, e.g. direct
        do_emb_extraction/save_pairs callers)."""
        self._issue_resident_wav(wav_1d)
        return self._resident_cache[1].result()

    def _fused_embed(self, L):
        """ONE jitted dispatch per batch: the chunk gather inlines into the
        embed jit, halving tunnel dispatches vs gather-then-embed (each
        dispatch costs O(10-100 ms) host-side on this harness). Returns
        None — and latches off for the pipeline's lifetime — when embed_fn
        is not jax-traceable (plain-numpy embed fns in tests fall back to
        the two-dispatch path, whose gather numerics the resident-wav tests
        pin)."""
        if getattr(self, "_fused_ok", None) is False:
            return None
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(L)
        if fn is None:
            import jax

            embed_fn = self.embed_fn
            gather = _gather_chunks_jit()  # inlines under the outer jit

            def fused(wav, starts, lens):
                return embed_fn(gather(wav, starts, lens, L))

            fn = cache[L] = jax.jit(fused)
        return fn

    def do_emb_extraction(self, chunks: Sequence[Sequence[float]], wav_1d):
        """Embed chunks from the device-resident waveform: slicing and
        circle-padding to a STATIC chunk length happen ON DEVICE via an
        index gather (starts/lengths are the only per-batch upload).
        (reference: bin/infer_diarization.py:621-639)

        The reference pads every chunk to the LONGEST chunk in the call, so
        whole-segment extraction (--no_chunk_after_vad, .pairs.json) embeds
        full segments, not their first chunk_dur seconds. For static XLA
        shapes the pad target is that max length rounded UP to a multiple of
        chunk_dur (one compile per distinct bucket, not per length); the
        sliding-window path where every chunk == chunk_dur is unchanged."""
        L = int(self.chunk_dur * self.fs)
        bounds = [(int(st * self.fs), int(ed * self.fs)) for st, ed in chunks]
        max_len = max((ed - st for st, ed in bounds), default=L)
        if max_len > L:
            L = -(-max_len // L) * L  # bucketed: ceil(max/chunk)*chunk

        try:
            dev_wav = self._resident_wav(wav_1d)
        except ImportError:  # host-only fallback (no jax): old slice path
            return self._emb_extraction_host(bounds, wav_1d, L)
        gather = _gather_chunks_jit()
        starts = np.asarray([st for st, _ in bounds], np.int32)
        lens = np.asarray([ed - st for st, ed in bounds], np.int32)

        # Dispatch structure: ONE fused jit dispatch per batch (gather
        # inlined into embed when traceable) and the [bs, D] result fetches
        # run on a background thread — each fetch is a ~35 ms tunnel
        # round-trip that would otherwise block the issue loop between
        # dispatches. Outstanding fetches are capped so the device queue
        # (one [bs, L] gather intermediate per in-flight batch) stays
        # bounded on long files.
        from concurrent.futures import ThreadPoolExecutor

        pool = getattr(self, "_fetch_pool", None)
        if pool is None:
            pool = self._fetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="emb_fetch")
        bs = self.batch_size
        qcap = max(8 * self.dispatch_depth, 16)
        fused = self._fused_embed(L)
        futs = []
        for s in range(0, len(starts), bs):
            bst, bln = starts[s:s + bs], lens[s:s + bs]
            n = bst.shape[0]
            if n < bs:  # pad to the static batch size, drop extras after
                bst = np.concatenate([bst, np.zeros(bs - n, np.int32)])
                bln = np.concatenate([bln, np.zeros(bs - n, np.int32)])
            dev = None
            if fused is not None:
                try:
                    dev = fused(dev_wav, bst, bln)
                except Exception:  # embed_fn not traceable: latch fallback
                    self._fused_ok = False
                    self._fused_cache.clear()
                    fused = None
            if dev is None:
                dev = self.embed_fn(gather(dev_wav, bst, bln, L))
            futs.append((n, pool.submit(np.asarray, dev)))
            if len(futs) >= qcap:
                futs[-qcap][1].result()
        return np.concatenate(
            [f.result()[:k] for k, f in futs], axis=0)

    def _emb_extraction_host(self, bounds, wav_1d, L):
        """Host slice/pad/stack path (pre-r5 semantics), kept as the no-jax
        fallback; numerics are identical to the device gather."""
        wavs = []
        for st, ed in bounds:
            piece = wav_1d[st:ed]
            if piece.shape[0] == 0:
                piece = np.zeros(1, dtype=np.float32)
            wavs.append(circle_pad(piece, L))
        wavs = np.stack(wavs).astype(np.float32)
        out = []
        bs = self.batch_size
        for s in range(0, len(wavs), bs):
            batch = wavs[s:s + bs]
            n = batch.shape[0]
            if n < bs:
                batch = np.concatenate(
                    [batch, np.zeros((bs - n, L), np.float32)], axis=0)
            out.append(np.asarray(self.embed_fn(batch))[:n])
        return np.concatenate(out, axis=0)

    def do_clustering(self, chunks, embeddings, speaker_num=None):
        labels = self.cluster(
            embeddings,
            speaker_num=speaker_num if speaker_num is not None else self.speaker_num)
        speaker_num = int(labels.max()) + 1
        fields = [[c[0], c[1], int(l)] for c, l in zip(chunks, labels)]
        return speaker_num, compressed_seg(fields)

    # ---- entry -------------------------------------------------------------

    def __call__(self, wav, wav_fs=None, speaker_num=None):
        t0 = time.time()
        stages = self.last_stage_times = {}
        wav_data = load_audio(wav, wav_fs, self.fs)
        wav_1d = np.asarray(wav_data)[0]
        # the exact audio this call processed: sidecar writers (save_pairs,
        # save_vad_plot, .vad_masked.wav) should use THIS object so the
        # identity-keyed resident upload is reused instead of re-decoding
        # and re-uploading the file
        self.last_wav_1d = wav_1d

        # start the resident-wav upload NOW on a background thread, so the
        # host->device transfer (~5 s for 90 min int16 on a median tunnel)
        # overlaps the host VAD stages instead of serializing into the
        # embed stage. Only the host-side quantize/pad cost lands here.
        t = time.time()
        try:
            self._issue_resident_wav(wav_1d)
        except ImportError:
            pass  # no jax: the host fallback path needs no upload
        stages["upload_issue"] = time.time() - t

        t = time.time()
        flags, wav_for_vad = self.do_vad(wav_1d)
        stages["vad"] = time.time() - t

        t = time.time()
        processed_mask, refined_mask, vad_time = self.postprocess_vad(
            flags, wav_for_vad)
        hop = int(self.vad_frame_size_ms * self.fs / 1000)
        self.last_vad_time_raw = vad_mod.flags_to_intervals(
            flags, len(wav_for_vad), hop, self.fs)
        self.last_vad_time_processed = vad_mod.mask_to_intervals(
            processed_mask, self.fs)
        self.last_vad_refined_mask = refined_mask
        stages["vad_post"] = time.time() - t

        if self.segmentation_model is not None:
            from speaker3d_tpu.diar.overlap import (
                get_valid_field, run_segmentation)
            t = time.time()
            segmentations, count = run_segmentation(
                self.segmentation_model, wav_1d, self.fs,
                threshold=self.segmentation_threshold)
            vad_time = vad_mod.merge_vad(vad_time, get_valid_field(count))
            stages["segmentation"] = time.time() - t

        if self.no_chunk_after_vad:
            chunks = [[st, ed] for st, ed in vad_time]
        else:
            chunks = [c for st, ed in vad_time
                      for c in sliding_chunks(st, ed, self.chunk_dur,
                                              self.chunk_step)]
        self.last_vad_time = vad_time
        # sidecar-only product: computed lazily by the property (an eager
        # 86 M-sample multiply cost ~0.3 s of hour-scale wall when no
        # sidecar was requested)
        self._masked_audio_parts = (wav_1d, refined_mask)
        self._masked_audio_cache = None
        self.last_chunks = chunks

        if len(chunks) == 0:
            self.output_field_labels = []
            self.last_embeddings = np.zeros((0, 1), np.float32)
            self.last_elapsed = time.time() - t0
            return []

        t = time.time()
        embeddings = self.do_emb_extraction(chunks, wav_1d)
        self.last_embeddings = embeddings
        stages["embed"] = time.time() - t

        t = time.time()
        spk_num, fields = self.do_clustering(chunks, embeddings, speaker_num)
        stages["cluster"] = time.time() - t

        if self.segmentation_model is not None:
            from speaker3d_tpu.diar.overlap import binary_to_segs, post_process
            t = time.time()
            binary, timestamps = post_process(
                fields, spk_num, segmentations, count,
                threshold=self.segmentation_threshold)
            fields = binary_to_segs(binary, timestamps)
            stages["overlap_post"] = time.time() - t

        self.output_field_labels = fields
        self.last_elapsed = time.time() - t0
        return fields

    # ---- outputs -----------------------------------------------------------

    def save_diar_output(self, out_file, wav_id=None, output_field_labels=None):
        """(reference: bin/infer_diarization.py:727-755)"""
        # `is None`, not falsy: an explicitly passed EMPTY result list must
        # write an empty file, not fall back to the previous file's segments
        fields = (output_field_labels if output_field_labels is not None
                  else self.output_field_labels)
        if fields is None:
            raise ValueError("No results can be saved.")
        wav_id = wav_id or "default"
        if str(out_file).endswith("rttm"):
            with open(out_file, "w") as f:
                for st, ed, cid in fields:
                    f.write(f"SPEAKER {wav_id} 0 {st:.3f} {ed - st:.3f} "
                            f"<NA> <NA> {int(cid):d} <NA> <NA>\n")
        elif str(out_file).endswith("json"):
            out = {}
            for st, ed, cid in fields:
                segid = f"{wav_id}_{round(st, 3)}_{round(ed, 3)}"
                out[segid] = {"start": st, "stop": ed, "speaker": int(cid)}
            with open(out_file, "w") as f:
                json.dump(out, f, indent=2)
        else:
            raise ValueError("Supported output formats: RTTM and JSON.")

    def save_meta(self, out_file, wav_duration_s: float, wav_path=None):
        """RTF sidecar, reference key names (bin/infer_diarization.py:
        1045-1058): wav_path / duration_sec / processing_time_sec / rtf /
        pairwise_min_cosine / pairwise_mean_cosine (the pairwise stats are
        filled when save_pairs ran for this file)."""
        elapsed = self.last_elapsed or 0.0
        stats = getattr(self, "last_pairwise_stats", None) or {}
        meta = {
            "wav_path": wav_path,
            "duration_sec": wav_duration_s,
            "processing_time_sec": elapsed,
            "rtf": elapsed / wav_duration_s if wav_duration_s > 0 else None,
            "pairwise_min_cosine": stats.get("min"),
            "pairwise_mean_cosine": stats.get("mean"),
        }
        with open(out_file, "w") as f:
            json.dump(meta, f, indent=2)

    def save_pairs(self, out_file, wav_1d=None):
        """Pairwise cosine sidecar between the final diarized SEGMENTS
        (reference: bin/infer_diarization.py:1014-1041 — re-embeds each
        output segment and writes seg_i/seg_j with start/stop/speaker).
        When ``wav_1d`` is given, segments are re-embedded from it; without
        audio it falls back to the chunk embeddings (legacy behavior,
        chunk_i/chunk_j keys)."""
        self.last_pairwise_stats = None
        segs = self.output_field_labels or []
        if wav_1d is not None and len(segs) >= 2:
            seg_times = [[float(s[0]), float(s[1])] for s in segs]
            embs = self.do_emb_extraction(seg_times, np.asarray(wav_1d))
            z = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-12)
            aff = z @ z.T
            iu = np.triu_indices(aff.shape[0], k=1)
            vals = aff[iu]
            if vals.size:
                self.last_pairwise_stats = {"min": float(vals.min()),
                                            "mean": float(vals.mean())}
            pairs = [{
                "i": int(i), "j": int(j),
                "seg_i": {"start": float(segs[i][0]),
                          "stop": float(segs[i][1]),
                          "speaker": int(segs[i][2])},
                "seg_j": {"start": float(segs[j][0]),
                          "stop": float(segs[j][1]),
                          "speaker": int(segs[j][2])},
                "cosine": float(aff[i, j]),
            } for i, j in zip(*iu)]
            data = {"pairs": pairs}
        elif self.last_embeddings is None or len(self.last_embeddings) == 0:
            data = {"pairs": []}
        else:
            from speaker3d_tpu.diar.cluster import cosine_affinity

            aff = cosine_affinity(self.last_embeddings)
            pairs = []
            n = aff.shape[0]
            for i in range(n):
                for j in range(i + 1, n):
                    pairs.append({
                        "i": i, "j": j,
                        "chunk_i": self.last_chunks[i],
                        "chunk_j": self.last_chunks[j],
                        "cosine": float(aff[i, j]),
                    })
            data = {"pairs": pairs}
        with open(out_file, "w") as f:
            json.dump(data, f, indent=2)

    def save_vad_plot(self, out_file, wav_1d=None, sample_rate=None):
        """3-panel VAD visualization: waveform + raw / processed / refined
        interval overlays. (reference: bin/infer_diarization.py:799-870
        _save_vad_waveform_png)"""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        wav = (np.asarray(wav_1d) if wav_1d is not None
               else (self.last_vad_masked_audio[0]
                     if self.last_vad_masked_audio is not None else None))
        if wav is None:
            raise ValueError("no waveform available for plotting")
        if sample_rate is None:
            sample_rate = self.fs  # time axis must match the VAD overlays
        t = np.arange(len(wav)) / sample_rate
        panels = [("raw VAD", self.last_vad_time_raw),
                  ("post-processed", self.last_vad_time_processed),
                  ("refined", self.last_vad_time)]
        fig, axes = plt.subplots(3, 1, figsize=(14, 7), sharex=True)
        for ax, (title, intervals) in zip(axes, panels):
            ax.plot(t, wav, linewidth=0.3, color="#444")
            for st, ed in (intervals or []):
                ax.axvspan(st, ed, color="tab:green", alpha=0.3)
            ax.set_title(title, fontsize=9)
            ax.set_ylabel("amp")
        axes[-1].set_xlabel("time [s]")
        fig.tight_layout()
        fig.savefig(out_file, dpi=100)
        plt.close(fig)

    def save_vad_info(self, out_file):
        """(reference: bin/infer_diarization.py .vad_info.json sidecar)"""
        data = {
            "raw": self.last_vad_time_raw,
            "processed": self.last_vad_time_processed,
            "refined": self.last_vad_time,
        }
        with open(out_file, "w") as f:
            json.dump(data, f, indent=2)
