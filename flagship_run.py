"""Flagship everything-on run (VERDICT r4 #7): the DEFAULT model with
every production feature composed in ONE CLI run on the real chip —
Raw3_ECAPA (full size), bf16 mixed precision, on-device env_corrupt
augmentation, packed raw-PCM shards, EMA weights, AS-norm scored eval
over int16 wire transport — proving the features compose end-to-end
through the user-facing CLI (reference flow: src/main.py train →
src/inference.py eval).

Builds a synthetic 8 kHz corpus + MUSAN-style noise/RIR trees in a
scratch dir, packs shards via the dataprep CLI, trains via
``--do_train``, evals via ``--do_infer --eval --scoring_mode norm
--eval_transport int16 --use_ema``, and prints one JSON line with
step-time/throughput and artifact checks. Results are recorded in
PARITY.md ("flagship run").

Usage:  python flagship_run.py [workdir]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[flagship +{time.perf_counter() - T0:6.1f}s] {m}",
          file=sys.stderr, flush=True)


import os

N_SPK = int(os.environ.get("SVTPU_FLAGSHIP_SPK", 32))
UTTS = int(os.environ.get("SVTPU_FLAGSHIP_UTTS", 30))
# C shrinks the raw branch for CPU smoke runs of this script; the
# recorded chip run uses the full default (1024)
C_RAW = int(os.environ.get("SVTPU_FLAGSHIP_C", 1024))
BATCH = int(os.environ.get("SVTPU_FLAGSHIP_BATCH", 64))
SR = 8000
SECONDS = 2.0


def build_corpus(root: Path) -> None:
    from speakerverification_tpu.data import write_wav

    rng = np.random.default_rng(0)
    t = np.arange(int(SR * (SECONDS + 0.4))) / SR
    for s in range(N_SPK):
        f0 = 90 + 8 * s
        am = rng.uniform(2, 18, 3)
        for u in range(UTTS):
            sig = sum((1 + 0.8 * np.sin(2 * np.pi * a * t
                                        + rng.uniform(0, 6.28)))
                      * 0.2 / (h + 1)
                      * np.sin(2 * np.pi * f0 * (h + 1) * t
                               + rng.uniform(0, 6.28))
                      for h, a in enumerate(am))
            sig = sig + rng.normal(0, 0.02, len(t))
            write_wav(root / "data" / f"spk{s:03d}" / f"u{u:02d}.wav",
                      sig.astype(np.float32), SR)
    # MUSAN-style noise tree + simulated RIRs for env_corrupt
    for cat in ("noise", "music"):
        for i in range(4):
            write_wav(root / "musan_split" / cat / "s" / f"x{i}" / f"{i}.wav",
                      rng.normal(0, 0.1, SR * 3).astype(np.float32), SR)
    write_wav(root / "RIRS_NOISES" / "simulated_rirs" / "sm" / "R0" / "r.wav",
              np.exp(-np.arange(1500) / 300.0).astype(np.float32), SR)

    # verification trials over the last 4 utts of each speaker
    rng2 = np.random.default_rng(1)
    lines = []
    files = {s: [str(root / "data" / f"spk{s:03d}" / f"u{u:02d}.wav")
                 for u in range(UTTS - 4, UTTS)] for s in range(N_SPK)}
    for _ in range(300):
        s1 = int(rng2.integers(N_SPK))
        if rng2.random() < 0.5:
            a, b = rng2.choice(4, 2, replace=False)
            lines.append(f"1 {files[s1][a]} {files[s1][b]}")
        else:
            s2 = int((s1 + 1 + rng2.integers(N_SPK - 1)) % N_SPK)
            lines.append(f"0 {files[s1][0]} "
                         f"{files[s2][int(rng2.integers(4))]}")
    (root / "trials.txt").write_text("\n".join(lines) + "\n")


CONFIG = """\
seed: 7
output_folder: {root}/run
save_folder: !ref <output_folder>/save
skip_prep: False
data_folder: {root}/data
train_annotation: !ref <save_folder>/metadata/train.csv
valid_annotation: !ref <save_folder>/metadata/dev.csv
evaluation_file: {root}/trials.txt
verification_file: {root}/trials.txt
number_of_epochs: 2
batch_size: {batch}
lr: 0.001
base_lr: 0.000001
nClasses: {n_spk}
save_model_last: True
ckpt_interval_minutes: -1
mixedprec: True
device_augment: True
augment: True
augment_options:
  augment_chain: [env_corrupt]
  augment_paths:
    musan: {root}/musan_split
    noise_vad: {root}/nonexistent
    rirs: {root}/RIRS_NOISES
  noise_snr:
    noise: [0, 15]
    music: [5, 15]
  noise_samples:
    noise: [1, 1]
    music: [1, 1]
dataloader_options:
  batch_size: !ref <batch_size>
  num_workers: 4
  max_seg_per_spk: 100
  nPerSpeaker: 2
  split_ratio: -1
  shards: {root}/shards
audio_spec:
  sample_rate: {sr}
  channels: 1
  sentence_len: {seconds}
  win_len: 0.025
  hop_len: 0.01
n_mels: 80
features: raw
model:
  name: Raw3_ECAPA
  feature_type: !ref <features>
  nOut: 512
  C: {c_raw}
criterion:
  name: ARmSoftmax
  margin: 0.1
  scale: 30
optimizer:
  name: AdaBelief
  weight_decay: 0.00002
  lr_decay: 0.95
  ema_decay: 0.999
callbacks:
  name: cosine_annealinglr_pt
early_stopping: False
test_interval: -1
num_eval: 6
dcf:
  dcf_p_target: 0.05
  dcf_c_miss: 1
  dcf_c_fa: 1
test_threshold: 0
scoring_mode: cosine
prepare: cohorts
pretrained:
  use: False
  path: ""
initial_model_infer: null
cohorts_path: {root}/run/cohorts.npy
"""


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speakerverification_tpu.cli.dataprep import main as dataprep_main
    from speakerverification_tpu.cli.main import main as cli_main
    from speakerverification_tpu.data.manifest import generate_metadata

    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship")
    root.mkdir(parents=True, exist_ok=True)
    log(f"workdir {root}; backend {jax.default_backend()} "
        f"({len(jax.devices())} dev)")

    log("building corpus")
    build_corpus(root)
    (root / "config.yaml").write_text(
        CONFIG.format(root=root, n_spk=N_SPK, sr=SR, seconds=SECONDS,
                      c_raw=C_RAW, batch=BATCH))

    log("generating metadata + packing shards")
    generate_metadata(root / "data", root / "run" / "save" / "metadata",
                      num_val_utts=3)
    rc = dataprep_main(["--config", str(root / "config.yaml"),
                        "--pack", str(root / "shards")])
    assert rc == 0, "shard packing failed"

    log("training (CLI --do_train): full Raw3_ECAPA, bf16, device-augment, "
        "shards, EMA")
    t0 = time.perf_counter()
    rc = cli_main(["--do_train", "--config", str(root / "config.yaml")])
    train_s = time.perf_counter() - t0
    assert rc == 0, "train failed"

    model_dir = root / "run" / "save" / "Raw3_ECAPA" / "ARmSoftmax" / "model"
    result_dir = root / "run" / "save" / "Raw3_ECAPA" / "ARmSoftmax" / "result"
    assert (model_dir / "best_state.msgpack").exists()

    # steps/sec from the training log (excludes the one-off compile)
    scores_txt = (result_dir / "scores.txt").read_text()

    log("cohort prepare + AS-norm eval over int16 transport with EMA "
        "weights (CLI --do_infer)")
    rc = cli_main(["--do_infer", "--prepare", "--config",
                   str(root / "config.yaml")])
    assert rc == 0, "prepare failed"
    t0 = time.perf_counter()
    rc = cli_main(["--do_infer", "--eval", "--config",
                   str(root / "config.yaml"), "--scoring_mode", "norm",
                   "--eval_transport", "int16", "--use_ema"])
    eval_s = time.perf_counter() - t0
    assert rc == 0, "eval failed"

    inf_log = (result_dir / "Inference_log.txt").read_text()
    eer = re.findall(r"EER[^\d]*([\d.]+)", inf_log)
    n_rows = len((result_dir / "evaluation_results.csv")
                 .read_text().strip().splitlines()) - 1

    out = {
        "run": "flagship-everything-on",
        "model": f"Raw3_ECAPA nOut=512 C={C_RAW}",
        "features": ["bf16 mixedprec", "device_augment env_corrupt",
                     "packed shards", "EMA", "AS-norm eval",
                     "int16 eval transport", "cosine-annealing sched"],
        "train_wall_s": round(train_s, 1),
        "eval_wall_s": round(eval_s, 1),
        "epochs": 2,
        "train_utts": N_SPK * UTTS,
        "eval_trials": n_rows,
        "eer_pct": float(eer[-1]) if eer else None,
        "artifacts": sorted(p.name for p in model_dir.iterdir()),
        "scores_log_tail": scores_txt.strip().splitlines()[-2:],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
