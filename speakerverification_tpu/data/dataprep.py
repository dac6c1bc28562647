"""Dataset preparation: download, extract, convert, split, augment, VAD.

Parity target: src/dataprep.py — the full data-prep CLI surface:

* ``download``/``md5``/``concatenate``/``extract``  (:40-169) — VoxCeleb
  download with checksum, part concatenation, zip extraction. Network
  fetches are gated (this build environment has zero egress) but the
  code path and file formats match.
* ``convert``        (:172-192) — m4a→wav via an ffmpeg process pool.
* ``split_musan``    (:101-117) — 5 s chunks every 3 s for fast random
  access, written under ``musan_split/`` mirroring the source layout.
* ``augmentation``   (:195-264) — offline augmentation writer producing
  env-corrupted copies of training files.
* ``restore_dataset``/``vad_on_dataset`` (:426-476).
* metadata generation lives in data/manifest.py (``generate_metadata``).
"""

from __future__ import annotations

import hashlib
import shutil
import subprocess
import zipfile
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Mapping, Optional

import numpy as np

from speakerverification_tpu.data.audio import AudioSpec, load_wav
from speakerverification_tpu.data.augment import AugmentWav
from speakerverification_tpu.data.vad import VAD
from speakerverification_tpu.data.wavio import read_wav, write_wav

__all__ = ["md5", "download", "concatenate", "full_extract", "split_musan",
           "convert_to_wav", "offline_augmentation", "restore_dataset",
           "vad_on_dataset"]


def md5(fname: str | Path) -> str:
    """Streaming md5 (parity: src/dataprep.py:40-48)."""
    h = hashlib.md5()
    with open(fname, "rb") as f:
        for chunk in iter(lambda: f.read(4096 * 1024), b""):
            h.update(chunk)
    return h.hexdigest()


def download(save_path: str | Path, lines: Iterable[str],
             user: str = "", password: str = "") -> list:
    """Fetch ``url checksum`` lines with wget + verify (parity: :51-74).

    Zero-egress environments will fail the fetch; existing files with
    matching checksums are skipped, mirroring the reference's resume
    behavior.
    """
    results = []
    for line in lines:
        url, target_md5 = line.split()[:2]
        out = Path(save_path) / Path(url).name
        if out.exists() and md5(out) == target_md5:
            results.append((out, "cached"))
            continue
        cmd = ["wget", url, "-O", str(out)]
        if user:
            cmd += ["--user", user, "--password", password]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            results.append((out, f"download failed: {e}"))
            continue
        status = "ok" if md5(out) == target_md5 else "checksum mismatch"
        results.append((out, status))
    return results


def concatenate(save_path: str | Path, catlist: str | Path) -> list:
    """``cat parts > whole`` + md5 verify (parity: :147-169)."""
    out = []
    with open(catlist) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            pattern, target_md5 = parts[0], parts[1]
            target = Path(save_path) / pattern.replace("_part*", "")
            with open(target, "wb") as w:
                for piece in sorted(Path(save_path).glob(pattern)):
                    w.write(piece.read_bytes())
            out.append((target, "ok" if md5(target) == target_md5
                        else "checksum mismatch"))
    return out


def full_extract(save_path: str | Path, fname: str | Path) -> None:
    """Extract zip/tar archives (parity: :77-88)."""
    fname = Path(fname)
    if fname.suffix == ".zip":
        with zipfile.ZipFile(fname) as zf:
            zf.extractall(save_path)
    else:
        import tarfile
        with tarfile.open(fname) as tf:
            tf.extractall(save_path)


def split_musan(noise_folder: str | Path, chunk_sec: float = 5.0,
                stride_sec: float = 3.0) -> int:
    """Split MUSAN into fixed chunks under ``musan_split/``
    (parity: src/dataprep.py:101-117; 5 s length, 3 s stride)."""
    noise_folder = Path(noise_folder)
    files = sorted((noise_folder / "musan").glob("*/*/*.wav"))
    n_chunks = 0
    for file in files:
        audio, fs = read_wav(file)
        audlen = int(fs * chunk_sec)
        audstr = int(fs * stride_sec)
        writedir = Path(str(file.with_suffix("")).replace(
            "/musan/", "/musan_split/"))
        writedir.mkdir(parents=True, exist_ok=True)
        for st in range(0, len(audio) - audlen, audstr):
            write_wav(writedir / f"{st // fs:05d}.wav",
                      audio[st:st + audlen], fs)
            n_chunks += 1
    return n_chunks


def _ffmpeg_convert(src: str, dst: str, sample_rate: int, channels: int = 1,
                    ) -> bool:
    cmd = ["ffmpeg", "-y", "-i", src, "-ac", str(channels),
           "-ar", str(sample_rate), "-f", "wav", dst]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def convert_to_wav(files: Iterable[str | Path], sample_rate: int = 16000,
                   channels: int = 1, workers: int = 16,
                   delete_source: bool = False) -> dict:
    """Convert audio files to wav via an ffmpeg pool
    (parity: src/dataprep.py:172-192, Pool(96) m4a→wav farm)."""
    files = [str(f) for f in files]
    ok = failed = 0
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {pool.submit(
            _ffmpeg_convert, f, str(Path(f).with_suffix(".wav")),
            sample_rate, channels): f for f in files}
        for fut, src in futures.items():
            if fut.result():
                ok += 1
                if delete_source:
                    Path(src).unlink(missing_ok=True)
            else:
                failed += 1
    return {"converted": ok, "failed": failed}


def offline_augmentation(manifest_paths: Iterable[str],
                         augment_options: Mapping, audio_spec: Mapping,
                         out_dir: str | Path, per_file: int = 1,
                         seed: int = 0) -> int:
    """Write env-corrupted copies of training files
    (parity: src/dataprep.py:195-264 'augmentation' writer)."""
    spec = AudioSpec(audio_spec)
    eng = AugmentWav(augment_options, audio_spec,
                     rng=np.random.default_rng(seed))
    out_dir = Path(out_dir)
    n = 0
    for path in manifest_paths:
        audio = load_wav(str(path), spec, evalmode=False,
                         rng=np.random.default_rng(seed + n))
        for k in range(per_file):
            aug = eng.env_corrupt(audio)
            rel = Path(path).stem + f"_aug{k}.wav"
            dst = out_dir / Path(path).parent.name / rel
            write_wav(dst, aug[0], spec.sample_rate)
            n += 1
    return n


def restore_dataset(raw_dataset: str | Path,
                    suffixes: tuple = ("_vad", "_aug"),
                    ) -> int:
    """Remove generated (``*_vad.wav`` / ``*_aug<k>.wav``) files,
    restoring the raw dataset (parity: src/dataprep.py:426-453).

    Only exact generated-name SUFFIXES match — a substring test would
    irreversibly delete raw utterances whose names merely contain
    '_vad'/'_aug' (e.g. ``interview_augmented.wav``)."""
    import re

    pat = re.compile(
        "(" + "|".join(re.escape(s) for s in suffixes) + r")\d*$")
    removed = 0
    for f in Path(raw_dataset).rglob("*.wav"):
        if pat.search(f.stem):
            f.unlink()
            removed += 1
    return removed


def vad_on_dataset(raw_dataset: str | Path, mode: int = 3,
                   workers: int = 8) -> int:
    """Run VAD over every wav, writing ``*_vad.wav`` siblings
    (parity: src/dataprep.py:456-476)."""
    import threading

    # one VAD per worker thread: webrtcvad's noise model is stateful
    # per is_speech call, so sharing an instance across threads would
    # interleave noise statistics across unrelated files and make the
    # segmentation nondeterministic (the reference runs sequentially)
    tls = threading.local()

    def run(path):
        if not hasattr(tls, "vad"):
            tls.vad = VAD(mode=mode)
        return tls.vad.apply_to_file(path)

    files = [f for f in Path(raw_dataset).rglob("*.wav")
             if not f.stem.endswith("_vad")]
    done = 0
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for result in pool.map(run, files):
            if result is not None:
                done += 1
    return done
