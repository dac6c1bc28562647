"""Packed-shard dataset: crop-sized reads instead of file-per-utterance.

The reference reads one WAV per ``__getitem__`` (src/dataloader.py:
113-144 via audio_loader.py loadWAV) — a filesystem open + RIFF header
parse + full-file read per utterance. On local disk that costs ~µs; on
the network filesystems real corpora live on (GCS fuse, NFS), each open
is ~ms and the full-file read moves 10-60 s of audio to crop 2 s of it.
A chip consuming ~3.4k utt/s (PARITY.md train bench) starves on that
layout long before the decoder is the bottleneck.

``pack_shards`` rewrites the corpus once into a few large shards of
concatenated raw little-endian int16 PCM plus a JSON index; at train
time ``ShardedAudioSource`` memory-maps the shards and serves each crop
as ONE seek + read of exactly ``max_audio`` samples — no opens, no
header parse, no decode, O(crop) bytes moved. Values are scaled
1/32768, the same convention as ``data/wavio.py`` decode, so crops are
byte-identical to the file path for mono 16-bit PCM sources (tested,
tests/test_shards.py); stereo averages and 24/32-bit or float WAVs are
quantized ONCE to int16 at pack time (<=0.5 LSB, far below the bf16
compute precision) and the pack stats report how many
(``requantized``).

Index format (``shard_index.json``)::

    {"version": 1, "sample_rate": N, "shards": ["shard-00000.bin", ...],
     "utts": [[shard_i, offset_samples, length_samples, label, key], ...]}

``utts`` is in MANIFEST ORDER, so the loader's manifest indices address
shard entries directly; ``key`` (the original path) is kept for
integrity checks and path-based lookup.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Mapping, Optional, Sequence, Union

import numpy as np

from speakerverification_tpu.data.audio import AudioSpec
from speakerverification_tpu.data.wavio import read_wav

__all__ = ["pack_shards", "ShardedAudioSource"]

INDEX_NAME = "shard_index.json"


def manifest_fingerprint(paths: Sequence[str]) -> str:
    """Order-sensitive digest of the full path list: spot-probing rows
    0 and N-1 cannot catch a same-length manifest regeneration whose
    middle membership changed (silent mislabeled training)."""
    h = hashlib.sha1()
    for p in paths:
        h.update(str(p).encode())
        h.update(b"\n")
    return h.hexdigest()


def pack_shards(manifest, out_dir: Union[str, Path],
                shard_mb: int = 1024,
                sample_rate: Optional[int] = None) -> dict:
    """Pack every manifest utterance into raw-PCM shards + index.

    manifest: object with ``paths`` (sequence of WAV paths) and
    ``labels`` (sequence of int speaker ids) — ``data/manifest.py``.
    ``shard_mb`` caps each shard file; ``sample_rate`` (default: first
    file's rate) is enforced across the corpus.
    Returns stats: {"utts", "shards", "samples", "bytes"}.
    """
    if len(manifest.paths) == 0:
        raise ValueError("manifest has no utterances — nothing to pack")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    shard_samples_cap = int(shard_mb) * (1 << 20) // 2   # int16 = 2 B
    utts, shards = [], []
    cur = None
    cur_samples = 0
    total = 0
    requantized = 0        # sources that were not exactly 16-bit PCM

    def _open_next():
        nonlocal cur, cur_samples
        if cur is not None:
            cur.close()
        name = f"shard-{len(shards):05d}.bin"
        shards.append(name)
        cur = open(out / name, "wb")
        cur_samples = 0

    try:
        _open_next()
        for i, path in enumerate(manifest.paths):
            audio, sr = read_wav(path)
            if sample_rate is None:
                sample_rate = int(sr)
            elif int(sr) != int(sample_rate):
                raise ValueError(f"{path}: sample rate {sr} != "
                                 f"{sample_rate}")
            audio = np.asarray(audio, np.float32)
            pcm = np.clip(np.round(audio * 32768.0),
                          -32768, 32767).astype("<i2")
            # byte-identity holds only for sources already on the int16
            # grid (mono 16-bit PCM); stereo averages / 24-32-bit /
            # float WAVs quantize by <=0.5 LSB here — record it
            if not np.array_equal(pcm.astype(np.float32) / 32768.0,
                                  audio):
                requantized += 1
            if cur_samples and cur_samples + len(pcm) > shard_samples_cap:
                _open_next()
            utts.append([len(shards) - 1, cur_samples, int(len(pcm)),
                         int(manifest.labels[i]), str(path)])
            cur.write(pcm.tobytes())
            cur_samples += len(pcm)
            total += len(pcm)
    finally:
        if cur is not None:
            cur.close()

    index = {"version": 1, "sample_rate": int(sample_rate),
             "manifest_sha1": manifest_fingerprint(manifest.paths),
             "shards": shards, "utts": utts}
    tmp = out / (INDEX_NAME + ".tmp")
    tmp.write_text(json.dumps(index))
    os.replace(tmp, out / INDEX_NAME)
    return {"utts": len(utts), "shards": len(shards),
            "samples": total, "bytes": total * 2,
            "requantized": requantized}


class ShardedAudioSource:
    """mmap-backed reader over ``pack_shards`` output.

    ``crop_train(i, spec, rng)`` reproduces ``load_wav(path, spec,
    evalmode=False, random_chunk=True, rng=rng)`` EXACTLY (same
    pad-wrap, same single ``rng.random()`` draw, same float scaling)
    while reading only the crop's samples from the mapped shard.
    """

    def __init__(self, shard_dir: Union[str, Path]):
        d = Path(shard_dir)
        idx_path = d / INDEX_NAME
        if not idx_path.exists():
            raise FileNotFoundError(f"no {INDEX_NAME} in {d}")
        index = json.loads(idx_path.read_text())
        if index.get("version") != 1:
            raise ValueError(f"unsupported shard index version "
                             f"{index.get('version')!r}")
        self.sample_rate = int(index["sample_rate"])
        self.manifest_sha1 = index.get("manifest_sha1")
        self.utts = index["utts"]
        self._by_key = None        # lazy: the train loader never needs it
        self._maps = [np.memmap(d / name, dtype="<i2", mode="r")
                      for name in index["shards"]]

    def __len__(self) -> int:
        return len(self.utts)

    def index_of(self, key: str) -> int:
        if self._by_key is None:   # built on first use — a 1M-entry
            self._by_key = {u[4]: i          # dict costs startup + RAM
                            for i, u in enumerate(self.utts)}
        return self._by_key[key]

    def _slice(self, i: int, start: int, n: int) -> np.ndarray:
        shard, off, _, _, _ = self.utts[i]
        return (self._maps[shard][off + start: off + start + n]
                .astype(np.float32) / 32768.0)

    def load(self, i: Union[int, str]) -> np.ndarray:
        """Full utterance, float32 1/32768-scaled (decode convention)."""
        if isinstance(i, str):
            i = self.index_of(i)
        return self._slice(i, 0, self.utts[i][2])

    def label(self, i: int) -> int:
        return int(self.utts[i][3])

    def crop_train(self, i: int, spec: Mapping,
                   rng: Optional[np.random.Generator] = None,
                   random_chunk: bool = True) -> np.ndarray:
        """One train crop ``[1, max_audio]`` — byte-equal to the
        ``load_wav`` file path (for 16-bit PCM sources; others are
        quantized once at pack time), reading only the crop's bytes.

        Only the long-utterance fast path is bespoke (the seek+read
        that motivates the format, one ``rng.random()`` draw identical
        to audio.py's crop math); short utterances are fully read
        anyway, so they DELEGATE to ``load_wav``'s ndarray path — the
        pad-wrap semantics live in exactly one place (audio.py)."""
        from speakerverification_tpu.data.audio import load_wav

        spec = AudioSpec(spec)
        max_audio = spec.max_audio
        length = self.utts[i][2]
        if length <= max_audio:
            return load_wav(self._slice(i, 0, length), spec,
                            evalmode=False, random_chunk=random_chunk,
                            rng=rng, normalize=False)
        if random_chunk:
            rng = rng or np.random.default_rng()
            start = int(rng.random() * (length - max_audio))
        else:
            start = 0
        return np.expand_dims(self._slice(i, start, max_audio), 0)

    def crops_eval(self, i: Union[int, str], spec: Mapping,
                   num_eval: int = 10) -> np.ndarray:
        """Eval crops ``[num_eval, max_audio]`` (linspace starts) —
        delegates the crop math to ``load_wav``'s ndarray path (eval
        reads the whole utterance regardless, so there is no
        partial-read win to justify duplicating the linspace logic)."""
        from speakerverification_tpu.data.audio import load_wav

        if isinstance(i, str):
            i = self.index_of(i)
        full = self._slice(i, 0, self.utts[i][2])
        return load_wav(full, spec, evalmode=True, num_eval=num_eval,
                        normalize=False)
