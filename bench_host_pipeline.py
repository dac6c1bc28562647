"""Host input-pipeline throughput: bare decode vs env_corrupt-augmented.

VERDICT r2 weak #4: the no-augment loading rate was known (~3,000
utt/s/core) but MUSAN mixing + full FFT reverb per utterance was never
measured. This script fabricates a realistic-size MUSAN/RIR tree
(16 kHz, noise files 4-8 s, 16k-tap RIRs), then times:

  * bare   — load_wav random-crop decode of a 2 s training utterance
  * augment— the same plus AugmentWAV.env_corrupt with the reference's
             rev/noise/both/none .2/.4/.2/.2 mix (audio_loader.py:158-244)

Run: python bench_host_pipeline.py  (single-core numbers; multiply by
host cores for pipeline capacity). Results recorded in PARITY.md.
"""

import json
import os
import tempfile
import time

import numpy as np

from speakerverification_tpu.data.audio import AudioSpec, load_wav
from speakerverification_tpu.data.augment import AugmentWav
from speakerverification_tpu.data.wav_conversion import write_wav

SR = 16000
SPEC = {"sample_rate": SR, "max_frames": 200}     # 2 s crops + 240


def build_tree(root):
    rng = np.random.default_rng(0)
    musan = os.path.join(root, "musan_split")
    for cat in ("noise", "speech", "music"):
        for i in range(20):
            n = int(rng.integers(4 * SR, 8 * SR))
            write_wav(os.path.join(musan, cat, "sub", f"x{i}", f"{i}.wav"),
                      rng.normal(0, 0.1, n).astype(np.float32), SR)
    rirs = os.path.join(root, "RIRS_NOISES")
    for i in range(20):
        rir = (np.exp(-np.arange(16000) / 2000.0)
               * rng.normal(0, 1, 16000)).astype(np.float32)
        write_wav(os.path.join(rirs, "simulated_rirs", "small", f"Room{i}",
                               f"r{i}.wav"), rir, SR)
    utts = []
    for i in range(64):
        n = int(rng.integers(3 * SR, 6 * SR))
        p = os.path.join(root, "utts", f"u{i}.wav")
        write_wav(p, rng.normal(0, 0.2, n).astype(np.float32), SR)
        utts.append(p)
    return utts


def main():
    with tempfile.TemporaryDirectory() as root:
        utts = build_tree(root)
        spec = AudioSpec(SPEC)
        rng = np.random.default_rng(1)
        aug = AugmentWav({
            "augment_paths": {"musan": os.path.join(root, "musan_split"),
                              "noise_vad": "/nonexistent",
                              "rirs": os.path.join(root, "RIRS_NOISES")},
            "augment_chain": ["env_corrupt"],
            "noise_snr": {"noise": [0, 15], "speech": [13, 20],
                          "music": [5, 15], "noise_vad": [0, 15],
                          "noise_rirs": [0, 15]},
            "noise_samples": {"noise": [1, 1], "speech": [3, 7],
                              "music": [1, 1], "noise_vad": [1, 1],
                              "noise_rirs": [1, 1]},
        }, SPEC, rng=rng)

        def run(fn, n=400):
            # warmup
            for i in range(20):
                fn(utts[i % len(utts)])
            t0 = time.perf_counter()
            for i in range(n):
                fn(utts[i % len(utts)])
            return n / (time.perf_counter() - t0)

        bare = run(lambda p: load_wav(p, spec, evalmode=False, rng=rng))
        augd = run(lambda p: aug.env_corrupt(
            load_wav(p, spec, evalmode=False, rng=rng)))
        # fixed worst-case chains for context
        rev = run(lambda p: aug.reverberate(
            load_wav(p, spec, evalmode=False, rng=rng)), n=200)
        noise = run(lambda p: aug.additive_noise("speech",
            load_wav(p, spec, evalmode=False, rng=rng)), n=200)

        print(json.dumps({
            "bare_utt_per_s_core": round(bare, 1),
            "env_corrupt_utt_per_s_core": round(augd, 1),
            "always_reverb_utt_per_s_core": round(rev, 1),
            "always_noise_3to7_utt_per_s_core": round(noise, 1),
        }))


if __name__ == "__main__":
    main()
