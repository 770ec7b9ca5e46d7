"""Supervised SV dataset + threaded host loader.

Behavioral contract (reference: speakerlab/dataset/dataset.py:17-38
WavSVDataset): CSV row -> wav_reader (crop/speed) -> label_encoder ->
augmentation -> sample. Unlike the reference (which computes fbank per-sample
on CPU dataloader workers), this pipeline emits raw wav crops: fbank runs on
DEVICE fused into the train step, so host workers only decode/augment —
keeping CPUs from starving the chips (the reference's CPU fbank is its data
bottleneck, SURVEY.md §3.1).

The loader is a prefetching thread pool producing fixed-shape numpy batches;
per-host sharding for multi-host data parallelism is plain round-robin by
example (reference: DistributedSampler semantics, bin/train.py:45-48).
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from speaker3d_tpu.data.processors import SpkLabelEncoder, SpkVeriAug, WavReader
from speaker3d_tpu.utils.fileio import load_data_csv


class WavSVDataset:
    """(reference: dataset/dataset.py:17-38)"""

    def __init__(self, data_file, wav_reader: WavReader,
                 label_encoder: SpkLabelEncoder,
                 augmentations: Optional[SpkVeriAug] = None):
        self.data = load_data_csv(data_file)
        self.keys = list(self.data.keys())
        self.wav_reader = wav_reader
        self.label_encoder = label_encoder
        self.augmentations = augmentations

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        row = self.data[self.keys[index]]
        wav, speed_idx = self.wav_reader(row["wav"])
        label = self.label_encoder(row["spk"], speed_idx)
        if self.augmentations is not None:
            wav = self.augmentations(wav)
        return wav.astype(np.float32), np.int32(label)

    @property
    def num_classes(self):
        mult = 3 if self.wav_reader.speed_pertub else 1
        return len(self.label_encoder) * mult


class BatchLoader:
    """Prefetching batch iterator over a map-style dataset.

    Yields {'wavs': [B, L] float32, 'labels': [B] int32}. Epoch-seeded
    shuffling; drops the last partial batch (static shapes for jit).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, seed: int = 0, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1,
                 drop_last: bool = True, wire_dtype: Optional[str] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        # wire_dtype='int16': ship wavs as PCM16 over the host->device link
        # (half the bytes of float32; the train step converts back on
        # device). Exact for PCM16-decoded samples (k/32768 -> k); augmented
        # float values re-quantize with <= 1/65536 abs error except at
        # waveform peaks, where resampler FIR ringing / addnoise output can
        # overshoot +-1 and the np.clip below saturates (error bounded by
        # the overshoot, not 1/65536). Training-only; peaks are rare and the
        # clip is below the augmentation noise floor in aggregate. Opt-in
        # per trainer.
        if wire_dtype not in (None, "int16"):
            raise ValueError(
                f"wire_dtype must be None|'int16', got {wire_dtype!r} "
                "(config key: wire_dtype; 'float32' maps to None upstream)")
        self.wire_dtype = wire_dtype
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        order = order[self.process_index::self.process_count]
        # every process must yield the SAME number of batches — the train
        # step's psums otherwise deadlock the pod when the corpus size is
        # not divisible by process_count (ranks differ by one example)
        order = order[: len(self.dataset) // self.process_count]
        n_batches = len(order) // self.batch_size if self.drop_last \
            else -(-len(order) // self.batch_size)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # Always terminate the queue: a worker exception must surface in
            # the consumer, not deadlock it on q.get().
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                        # one future per WORKER (contiguous index slices, so
                        # the flattened sample order matches the sequential
                        # order — num_workers=1 stays bit-deterministic),
                        # not one per sample: at B=128 the per-future
                        # scheduling overhead is a measurable GIL cost on
                        # small hosts
                        nw = max(1, min(self.num_workers, len(idxs)))
                        step = -(-len(idxs) // nw)
                        chunks = [idxs[j * step:(j + 1) * step]
                                  for j in range(nw)]
                        get = self.dataset.__getitem__
                        parts = pool.map(
                            lambda ch: [get(i) for i in ch], chunks)
                        samples = [s for part in parts for s in part]
                        wavs = np.stack([s[0] for s in samples])
                        labels = np.asarray([s[1] for s in samples], np.int32)
                        if self.wire_dtype == "int16":
                            wavs = np.clip(np.rint(wavs * 32768.0),
                                           -32768, 32767).astype(np.int16)
                        q.put({"wavs": wavs, "labels": labels})
            except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
                q.put(exc)
            else:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
