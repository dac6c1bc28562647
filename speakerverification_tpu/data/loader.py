"""Threaded, prefetching data pipeline producing fixed-shape batches.

TPU-native replacement for the reference's torch DataLoader worker
processes (src/dataloader.py:241-272): a thread pool decodes/augments
audio (the native WAV decoder releases the GIL, so threads scale) and a
background prefetcher keeps ``prefetch`` batches ready while the TPU
trains — no fork, no IPC tensors, fixed shapes every step.

Batch layout: ``wave [B, nPerSpeaker, T] float32``, ``label [B] int32``
(the grouping the loss heads expect; the reference reaches the same
grouping through transpose/reshape gymnastics, src/model.py:247-252).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Mapping, Optional

import numpy as np

from speakerverification_tpu.data.audio import AudioSpec, load_wav
from speakerverification_tpu.data.augment import (
    AugmentWav,
    random_time_domain_augment,
)
from speakerverification_tpu.data.manifest import Manifest
from speakerverification_tpu.data.sampler import SpeakerBatchSampler


def _usable_cpus() -> int:
    """CPUs this process may actually run on: cgroup/affinity-aware
    (os.cpu_count() reports the machine, not the container limit)."""
    try:
        return len(os.sched_getaffinity(0)) or 1
    except AttributeError:                       # non-Linux
        return os.cpu_count() or 1

__all__ = ["TrainDataLoader", "EvalDataLoader", "train_data_loader"]


class TrainDataLoader:
    def __init__(self, manifest: Manifest, audio_spec: Mapping,
                 batch_size: int, nPerSpeaker: int = 1,
                 max_seg_per_spk: int = 500,
                 augment: bool = False,
                 augment_options: Optional[Mapping] = None,
                 random_chunk: bool = True,
                 num_workers: int = 8, prefetch: int = 4,
                 seed: int = 0, num_replicas: int = 1, rank: int = 0,
                 shard_source=None):
        self.manifest = manifest
        self.spec = AudioSpec(audio_spec)
        # optional packed-shard source (data/shards.py): crops become
        # one mmap seek+read instead of open+decode per utterance;
        # byte-identical crops (same rng draws), tested
        self.shard_source = shard_source
        if shard_source is not None:
            if int(shard_source.sample_rate) != self.spec.sample_rate:
                # the file path enforces this per file (load_wav
                # expected_sr); the shard path must too or a stale pack
                # trains silently on time-stretched audio
                raise ValueError(
                    f"shard pack is {shard_source.sample_rate} Hz but "
                    f"audio_spec.sample_rate={self.spec.sample_rate} — "
                    "repack (cli.dataprep --pack)")
            if len(shard_source) != len(manifest):
                raise ValueError(
                    f"shard index has {len(shard_source)} utts, manifest "
                    f"{len(manifest)} — repack (cli.dataprep --pack)")
            # full-manifest fingerprint: a same-length regeneration with
            # different middle membership would pass any spot probe and
            # train silently on mislabeled audio
            from speakerverification_tpu.data.shards import (
                manifest_fingerprint,
            )
            want = manifest_fingerprint(manifest.paths)
            if (shard_source.manifest_sha1 is not None
                    and shard_source.manifest_sha1 != want):
                raise ValueError(
                    "shard index was packed from a different manifest "
                    f"(sha1 {shard_source.manifest_sha1[:12]} != "
                    f"{want[:12]}) — repack (cli.dataprep --pack)")
        self.batch_size = batch_size
        self.n_per_speaker = nPerSpeaker
        self.random_chunk = random_chunk
        # clamp to the host's cores: oversubscribed decode threads on a
        # small host thrash the GIL (measured 3.4x slower at 8 threads on
        # 1 CPU); the reference passes num_workers straight to torch
        # worker PROCESSES, which don't have this failure mode
        self.num_workers = max(1, min(num_workers, _usable_cpus()))
        self.prefetch = prefetch
        self.seed = seed

        self.sampler = SpeakerBatchSampler(
            manifest.labels, batch_size, nPerSpeaker, max_seg_per_spk,
            seed=seed, num_replicas=num_replicas, rank=rank)
        if len(self.sampler) == 0:
            raise ValueError(
                f"sampler yields zero batches: batch_size={batch_size} "
                f"(x{num_replicas} replicas) needs that many DISTINCT "
                f"speakers per batch, but the manifest has "
                f"{manifest.num_classes} speakers / {len(manifest)} "
                f"utterances (nPerSpeaker={nPerSpeaker}). Reduce batch_size "
                f"or nPerSpeaker.")

        self.augment = augment
        self.augment_options = augment_options or {}
        self.augment_chain = list(
            (augment_options or {}).get("augment_chain", []))
        self.augmentor: Optional[AugmentWav] = None
        if augment and "env_corrupt" in self.augment_chain:
            engine = AugmentWav(augment_options, audio_spec)
            if engine.has_noise or engine.has_reverb:
                self.augmentor = engine

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def _load_tuple(self, index_tuple, rng: np.random.Generator) -> np.ndarray:
        crops = []
        for idx in index_tuple:
            if self.shard_source is not None:
                audio = self.shard_source.crop_train(
                    idx, self.spec, rng=rng,
                    random_chunk=self.random_chunk)         # [1, T]
            else:
                audio = load_wav(self.manifest.paths[idx], self.spec,
                                 evalmode=False,
                                 random_chunk=self.random_chunk,
                                 rng=rng)                   # [1, T]
            if self.augment and "time_domain" in self.augment_chain:
                audio = random_time_domain_augment(
                    audio, self.augment_options.get("augment_time_domain", {}),
                    rng=rng)
                # time-domain ops can change length; re-crop/pad to T.
                # normalize=False: peak-normalizing here would exactly
                # cancel the volume gain just applied
                audio = load_wav(audio[0], self.spec, evalmode=False,
                                 random_chunk=self.random_chunk, rng=rng,
                                 normalize=False)
            if self.augmentor is not None:
                self.augmentor.rng = rng
                audio = self.augmentor.env_corrupt(audio)
            crops.append(audio[0][:self.spec.max_audio].astype(np.float32))
        return np.stack(crops, axis=0)                      # [nPer, T]

    def _batches(self) -> Iterator[dict]:
        epoch_rng = np.random.default_rng(
            (self.seed + self.sampler.epoch) * 7919 + 13)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for batch in self.sampler:
                seeds = epoch_rng.integers(0, 2**31, size=len(batch))
                futures = [pool.submit(self._load_tuple, tup,
                                       np.random.default_rng(int(s)))
                           for tup, s in zip(batch, seeds)]
                waves = np.stack([f.result() for f in futures])  # [B, nPer, T]
                labels = np.asarray(
                    [self.manifest.labels[t[0]] for t in batch], np.int32)
                yield {"wave": waves, "label": labels}

    def __iter__(self) -> Iterator[dict]:
        """Iterate with background prefetch.

        A consumer that stops early (``break`` at steps_per_epoch,
        GeneratorExit) must not leak the producer: its blocking
        ``q.put`` checks a stop flag, so the thread and its worker pool
        wind down instead of pinning ``prefetch`` decoded batches and
        ``num_workers`` threads per abandoned epoch."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        errbox = []
        stop = threading.Event()

        def producer():
            try:
                for item in self._batches():
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:          # propagate to consumer
                errbox.append(e)
            finally:
                try:
                    q.put_nowait(sentinel)
                except queue.Full:
                    pass                        # consumer already gone

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if errbox:
                        raise errbox[0]
                    return
                yield item
        finally:
            stop.set()
            while not q.empty():                # unblock a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class EvalDataLoader:
    """Batched eval-crop extraction over unique trial files.

    Replaces the reference's batch-size-1 ``test_data_loader``
    (src/dataloader.py:275-292): files are decoded by a thread pool and
    yielded in fixed-size batches of ``[B, num_eval, T]`` for one forward
    pass per batch instead of one per file.

    Every yielded batch — including the last — has exactly ``batch_size``
    rows (the ragged remainder is padded by repeating its last file), so
    XLA compiles ONE program per (B, E, T) shape no matter the trial-list
    length. ``paths`` carries only the real files; consumers drop the
    padded rows with ``emb[:len(paths)]``.
    """

    def __init__(self, files, audio_spec: Mapping, num_eval: int = 10,
                 batch_size: int = 32, num_workers: int = 8,
                 pad_last: bool = True):
        self.files = list(files)
        self.spec = AudioSpec(audio_spec)
        self.num_eval = num_eval
        if num_eval == 0:
            # whole-file mode returns variable-length [1, T_file] arrays
            # (audio.py num_eval==0 path) — they cannot be stacked into
            # fixed batches, so each file is its own batch (this is
            # exactly the reference's batch-1 eval, dataloader.py:275)
            batch_size = 1
        self.batch_size = batch_size
        # clamp to the host's cores: oversubscribed decode threads on a
        # small host thrash the GIL (measured 3.4x slower at 8 threads on
        # 1 CPU); the reference passes num_workers straight to torch
        # worker PROCESSES, which don't have this failure mode
        self.num_workers = max(1, min(num_workers, _usable_cpus()))
        self.pad_last = pad_last

    def __len__(self) -> int:
        return (len(self.files) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple]:
        def load(path):
            return load_wav(path, self.spec, evalmode=True,
                            num_eval=self.num_eval)          # [E, T]

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(0, len(self.files), self.batch_size):
                chunk = self.files[b:b + self.batch_size]
                waves = list(pool.map(load, chunk))
                if self.pad_last and len(waves) < self.batch_size:
                    waves.extend([waves[-1]] *
                                 (self.batch_size - len(waves)))
                yield np.stack(waves), chunk                 # [B, E, T], paths


def train_data_loader(hparams: Mapping, num_replicas: int = 1,
                      rank: int = 0) -> TrainDataLoader:
    """Build from the reference YAML schema (parity: src/dataloader.py:241-272)."""
    opts = hparams.get("dataloader_options", {})
    manifest = Manifest.read(hparams["train_annotation"])
    shard_source = None
    if opts.get("shards"):
        from speakerverification_tpu.data.shards import ShardedAudioSource
        shard_source = ShardedAudioSource(opts["shards"])
    return TrainDataLoader(
        manifest=manifest,
        shard_source=shard_source,
        audio_spec=hparams["audio_spec"],
        batch_size=int(opts.get("batch_size", hparams.get("batch_size", 32))),
        nPerSpeaker=int(opts.get("nPerSpeaker", 1)),
        max_seg_per_spk=int(opts.get("max_seg_per_spk", 500)),
        augment=bool(hparams.get("augment", False)),
        augment_options=hparams.get("augment_options"),
        random_chunk=bool(hparams.get("random_chunk", True)),
        num_workers=int(opts.get("num_workers", 8)),
        seed=int(hparams.get("seed", 0)),
        num_replicas=num_replicas, rank=rank)
