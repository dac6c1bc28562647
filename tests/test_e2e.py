"""End-to-end smoke: CLI train → infer --eval → --test → export on a
synthetic dataset (the tiny e2e test SURVEY.md §4 calls for)."""

import textwrap
from pathlib import Path

import numpy as np
import pytest

from speakerverification_tpu.cli.main import main as cli_main
from speakerverification_tpu.data import write_wav

N_SPK = 4
SR = 8000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    data = root / "data"
    # distinct per-speaker spectra so the tiny model can separate them
    for spk in range(N_SPK):
        for utt in range(6):
            t = np.arange(int(1.2 * SR)) / SR
            f0 = 120 + 90 * spk
            sig = sum(0.25 / (h + 1) * np.sin(2 * np.pi * f0 * (h + 1) * t
                                              + rng.uniform(0, 6))
                      for h in range(3))
            sig = sig + rng.normal(0, 0.01, len(t))
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      sig.astype(np.float32), SR)

    # trial list over held-out utterances (use train files; smoke only)
    trials = root / "trials.txt"
    lines = []
    rng2 = np.random.default_rng(1)
    files = {s: [str(data / f"spk{s}" / f"u{u}.wav") for u in range(6)]
             for s in range(N_SPK)}
    for _ in range(40):
        s1 = int(rng2.integers(N_SPK))
        if rng2.random() < 0.5:
            a, b = rng2.choice(6, 2, replace=False)
            lines.append(f"1 {files[s1][a]} {files[s1][b]}")
        else:
            s2 = int((s1 + 1 + rng2.integers(N_SPK - 1)) % N_SPK)
            lines.append(f"0 {files[s1][0]} {files[s2][int(rng2.integers(6))]}")
    trials.write_text("\n".join(lines) + "\n")

    cfg = root / "config.yaml"
    cfg.write_text(textwrap.dedent(f"""\
        device: cpu
        seed: 7
        output_folder: {root}/run
        save_folder: !ref <output_folder>/save
        skip_prep: False
        data_folder: {data}
        train_annotation: !ref <save_folder>/metadata/train.csv
        valid_annotation: !ref <save_folder>/metadata/dev.csv
        evaluation_file: {trials}
        verification_file: {trials}
        number_of_epochs: 3
        batch_size: 4
        lr: 0.005
        base_lr: 0.000001
        nClasses: {N_SPK}
        save_model_last: True
        ckpt_interval_minutes: -1
        dataloader_options:
          batch_size: !ref <batch_size>
          num_workers: 2
          max_seg_per_spk: 100
          nPerSpeaker: 2
          split_ratio: -1
        audio_spec:
          sample_rate: {SR}
          channels: 1
          sentence_len: 1.0
          win_len: 0.025
          hop_len: 0.01
        n_mels: 40
        n_mfcc: 40
        features: melspectrogram
        model:
          name: ECAPA_TDNN
          feature_type: !ref <features>
          nOut: 32
          channels: [32, 32, 32, 32, 96]
          kernel_sizes: [5, 3, 3, 3, 1]
          dilations: [1, 2, 3, 4, 1]
          attention_channels: 8
          res2net_scale: 4
          se_channels: 8
        criterion:
          name: AAmSoftmax
          margin: 0.2
          scale: 30
        optimizer:
          name: adam
          weight_decay: 0.0
          lr_decay: 0.95
        callbacks:
          name: cosine_annealinglr_pt
        early_stopping: False
        augment: False
        augment_options:
          augment_chain: []
        test_interval: -1
        num_eval: 3
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
        """))
    return root, cfg


def test_cli_train(workspace):
    root, cfg = workspace
    rc = cli_main(["--do_train", "--config", str(cfg)])
    assert rc == 0
    model_dir = root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
    assert (model_dir / "best_state.msgpack").exists()
    assert (model_dir / "last_state.msgpack").exists()
    scores = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
              / "scores.txt").read_text()
    assert "epoch 3" in scores
    # metadata was generated
    assert (root / "run" / "save" / "metadata" / "train.csv").exists()


def test_cli_infer_eval(workspace):
    root, cfg = workspace
    rc = cli_main(["--do_infer", "--eval", "--config", str(cfg)])
    assert rc == 0
    result_dir = root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
    csv_path = result_dir / "evaluation_results.csv"
    assert csv_path.exists()
    assert len(csv_path.read_text().strip().splitlines()) == 41  # header + 40
    log = (result_dir / "Inference_log.txt").read_text()
    assert "EER" in log


def test_cli_infer_eval_averaged_checkpoints(workspace, capsys):
    """--average_ckpts soups the retained best_state_top{1..k} weights."""
    root, cfg = workspace
    top1 = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "best_state_top1.msgpack")
    if not top1.exists():               # self-sufficient under -k filters
        assert cli_main(["--do_train", "--config", str(cfg)]) == 0
        capsys.readouterr()
    rc = cli_main(["--do_infer", "--eval", "--average_ckpts",
                   "--config", str(cfg)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "averaged" in out and "best_state_top1" in out


def test_cli_infer_prepare_and_norm_eval(workspace):
    root, cfg = workspace
    rc = cli_main(["--do_infer", "--prepare", "--config", str(cfg)])
    assert rc == 0
    cohorts = np.load(root / "run" / "cohorts.npy")
    assert cohorts.shape == (N_SPK, 32)
    # AS-norm scored eval
    rc = cli_main(["--do_infer", "--eval", "--config", str(cfg),
                   "--scoring_mode", "norm"])
    assert rc == 0


@pytest.mark.slow
def test_cli_infer_eval_int8_quant(workspace):
    """--quant int8 routes extraction through quant.py; trial scores must
    track the float path (embeddings are cosine-aligned, test_quant.py).
    Slow tier (r5 cold budget, 11 s cold): the quant lowering itself is
    covered default-tier in test_quant.py; this is its CLI wiring.
    Self-sufficient under -m slow: trains first if no checkpoint."""
    root, cfg = workspace
    if not (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "best_state.msgpack").exists():
        assert cli_main(["--do_train", "--config", str(cfg)]) == 0
    result_dir = root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
    csv_path = result_dir / "evaluation_results.csv"

    def scores():
        rows = csv_path.read_text().strip().splitlines()[1:]
        return np.array([float(r.split(",")[1]) for r in rows])

    assert cli_main(["--do_infer", "--eval", "--config", str(cfg)]) == 0
    float_scores = scores()
    assert cli_main(["--do_infer", "--eval", "--config", str(cfg),
                     "--quant", "int8"]) == 0
    int8_scores = scores()
    assert int8_scores.shape == float_scores.shape
    assert np.max(np.abs(int8_scores - float_scores)) < 2e-2


def test_cli_infer_eval_int16_transport(workspace):
    """--eval_transport int16 halves the H2D bytes; for 16-bit-PCM WAV
    sources the 1/32768-grid round-trip is lossless, so trial scores must
    match the float32 wire exactly (inference.InferenceEngine.embed_fn)."""
    root, cfg = workspace
    result_dir = root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
    csv_path = result_dir / "evaluation_results.csv"

    def scores():
        rows = csv_path.read_text().strip().splitlines()[1:]
        return np.array([float(r.split(",")[1]) for r in rows])

    assert cli_main(["--do_infer", "--eval", "--config", str(cfg)]) == 0
    float_scores = scores()
    assert cli_main(["--do_infer", "--eval", "--config", str(cfg),
                     "--eval_transport", "int16"]) == 0
    int16_scores = scores()
    np.testing.assert_allclose(int16_scores, float_scores,
                               rtol=0, atol=1e-6)


def test_cli_infer_test_mode(workspace):
    root, cfg = workspace
    rc = cli_main(["--do_infer", "--test", "--config", str(cfg),
                   "--test_threshold", "0.5"])
    assert rc == 0
    out = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
           / "trials_results.txt")
    assert out.exists()
    assert len(out.read_text().strip().splitlines()) == 40


def test_cli_export(workspace):
    root, cfg = workspace
    rc = cli_main(["--do_export", "--config", str(cfg)])
    assert rc == 0
    exp = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
           / "export")
    assert (exp / "model.stablehlo").exists()
    assert (exp / "params.msgpack").exists()

    from speakerverification_tpu.export import load_exported
    fn = load_exported(exp)
    out = np.asarray(fn(np.zeros((3, SR), np.float32)))
    assert out.shape == (3, 32)


def test_cli_resume_training(workspace):
    """Second --do_train run must resume from last checkpoint."""
    root, cfg = workspace
    import json
    log = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
           / "model_state_log.json")
    before = json.loads(log.read_text())
    assert before["epoch"] == 3
    rc = cli_main(["--do_train", "--config", str(cfg),
                   "--number_of_epochs", "4"])
    assert rc == 0
    after = json.loads(log.read_text())
    assert after["epoch"] == 4


def test_cli_infer_predict_identification(workspace):
    """prepare(embed) + --predict nearest-speaker identification."""
    root, cfg = workspace
    from speakerverification_tpu.cli.main import load_hparams, build_parser
    from speakerverification_tpu.inference import InferenceEngine

    args = build_parser().parse_args(["--config", str(cfg)])
    h = load_hparams(args)
    engine = InferenceEngine(h)
    embeds, classes = engine.prepare("embed")
    assert embeds.shape[0] == N_SPK
    files = [str(root / "data" / f"spk{s}" / "u5.wav") for s in range(N_SPK)]
    names, scores = engine.predict(files)
    correct = sum(1 for s, n in enumerate(names) if n == f"spk{s}")
    assert correct >= N_SPK - 1          # trained model identifies speakers
    assert all(np.isfinite(scores))


def test_cli_train_with_validation_interval(workspace):
    """test_interval > 0: per-epoch validation EER from the dev manifest."""
    root, cfg = workspace
    rc = cli_main(["--do_train", "--config", str(cfg),
                   "--number_of_epochs", "5", "--test_interval", "1"])
    assert rc == 0
    result_dir = root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "result"
    assert (result_dir / "validation_trials.txt").exists()
    scores = (result_dir / "scores.txt").read_text()
    assert "VEER" in scores


def test_cli_parallelism_flags(workspace):
    """--distributed/--mixedprec/--data_parallel/--distributed_backend/
    --port land in hparams (reference flag surface, src/main.py:59-74)."""
    root, cfg = workspace
    from speakerverification_tpu.cli.main import build_parser, load_hparams

    args = build_parser().parse_args(
        ["--config", str(cfg), "--distributed", "--mixedprec",
         "--distributed_backend", "ici", "--port", "8888"])
    h = load_hparams(args)
    assert h["distributed"] is True
    assert h["mixedprec"] is True
    assert h["port"] == "8888"

    args = build_parser().parse_args(["--config", str(cfg), "--data_parallel"])
    h = load_hparams(args)
    assert h["distributed"] is True          # DP alias maps onto shard_map DP

    args = build_parser().parse_args(["--config", str(cfg)])
    h = load_hparams(args)
    assert not h.get("distributed")
    # --device is a mode flag (it pins the JAX platform); it must not
    # clobber a same-named YAML key
    yaml_device = h.get("device")
    args = build_parser().parse_args(["--config", str(cfg), "--device", "cpu"])
    assert load_hparams(args).get("device") == yaml_device


def test_settings_artifact_written(workspace):
    """settings.txt hyperparameter dump (parity: src/trainer.py:256-261)."""
    root, _ = workspace
    settings = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax"
                / "result" / "settings.txt")
    assert settings.exists()
    text = settings.read_text()
    assert "batch_size" in text and "criterion" in text


@pytest.mark.slow
def test_cli_train_and_eval_mixed_model(tmp_path):
    """Full CLI train → infer --eval on a LIST-valued model.name (the
    reference's dead Mixed_model path, working here): RawNet3+ECAPA
    branches, checkpoints under save/<A+B>/<loss>/, trial eval runs on
    the raw-passthrough encoder."""
    rng = np.random.default_rng(11)
    data = tmp_path / "data"
    for spk in range(N_SPK):
        for utt in range(6):
            t = np.arange(int(1.2 * SR)) / SR
            f0 = 130 + 85 * spk
            sig = sum(0.25 / (h + 1) * np.sin(2 * np.pi * f0 * (h + 1) * t
                                              + rng.uniform(0, 6))
                      for h in range(3)) + rng.normal(0, 0.01, len(t))
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      sig.astype(np.float32), SR)
    trials = tmp_path / "trials.txt"
    files = {s: [str(data / f"spk{s}" / f"u{u}.wav") for u in range(6)]
             for s in range(N_SPK)}
    lines = [f"1 {files[0][0]} {files[0][1]}", f"0 {files[0][0]} {files[1][0]}",
             f"1 {files[2][0]} {files[2][1]}", f"0 {files[2][0]} {files[3][0]}"]
    trials.write_text("\n".join(lines) + "\n")

    cfg = tmp_path / "config.yaml"
    cfg.write_text(textwrap.dedent(f"""\
        device: cpu
        seed: 7
        output_folder: {tmp_path}/run
        save_folder: !ref <output_folder>/save
        skip_prep: False
        data_folder: {data}
        train_annotation: !ref <save_folder>/metadata/train.csv
        valid_annotation: !ref <save_folder>/metadata/dev.csv
        evaluation_file: {trials}
        number_of_epochs: 1
        batch_size: 4
        lr: 0.005
        base_lr: 0.000001
        nClasses: {N_SPK}
        save_model_last: True
        ckpt_interval_minutes: -1
        dataloader_options:
          batch_size: !ref <batch_size>
          num_workers: 2
          max_seg_per_spk: 100
          nPerSpeaker: 2
          split_ratio: -1
        audio_spec:
          sample_rate: {SR}
          channels: 1
          sentence_len: 1.0
          win_len: 0.025
          hop_len: 0.01
        n_mels: 24
        features: raw
        model:
          name: [RawNet3, ECAPA_TDNN]
          nOut: 48
          nOuts: [32, 16]
          branch_options:
            - {{C: 16, model_scale: 8}}
            - {{channels: [16, 16, 16, 16, 48], attention_channels: 4,
                res2net_scale: 4, se_channels: 4}}
        criterion:
          name: AAmSoftmax
          margin: 0.2
          scale: 30
        optimizer:
          name: adam
          weight_decay: 0.0
          lr_decay: 0.95
        callbacks:
          name: steplr
        early_stopping: False
        augment: False
        augment_options:
          augment_chain: []
        test_interval: -1
        num_eval: 2
        dcf:
          dcf_p_target: 0.05
          dcf_c_miss: 1
          dcf_c_fa: 1
        test_threshold: 0
        scoring_mode: cosine
        pretrained:
          use: False
          path: ""
        initial_model_infer: null
        """))
    rc = cli_main(["--do_train", "--config", str(cfg)])
    assert rc == 0
    run = tmp_path / "run" / "save" / "RawNet3+ECAPA_TDNN" / "AAmSoftmax"
    assert (run / "model" / "best_state.msgpack").exists()
    rc = cli_main(["--do_infer", "--eval", "--config", str(cfg)])
    assert rc == 0
    assert (run / "result" / "evaluation_results.csv").exists()


@pytest.mark.slow
def test_cli_train_from_pretrained_params_only(workspace, tmp_path, capsys):
    """pretrained.use with a CONVERTER-STYLE params-only artifact (the
    fine-tune-a-reference-checkpoint-on-TPU flow): load_checkpoint's
    strict restore fails over to the tolerant load_params_only, training
    proceeds from the ported weights (parity: src/trainer.py:349-365
    pretrained > previous > scratch)."""
    import flax.serialization as fser

    root, cfg = workspace
    best = (root / "run" / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "best_state.msgpack")
    if not best.exists():         # self-sufficient under -m slow / -k
        assert cli_main(["--do_train", "--config", str(cfg)]) == 0
        capsys.readouterr()
    raw = fser.msgpack_restore(best.read_bytes())
    art = tmp_path / "pretrained_params_only.msgpack"
    art.write_bytes(fser.msgpack_serialize(
        {"params": raw["params"], "batch_stats": raw.get("batch_stats", {})}))

    cfg2 = tmp_path / "config_finetune.yaml"
    text = cfg.read_text().replace(
        f"output_folder: {root}/run", f"output_folder: {tmp_path}/run2")
    text = text.replace("number_of_epochs: 3", "number_of_epochs: 1")
    text = text.replace(
        "pretrained:\n  use: False\n  path: \"\"",
        f"pretrained:\n  use: True\n  path: {art}")
    assert "use: True" in text
    cfg2.write_text(text)
    rc = cli_main(["--do_train", "--config", str(cfg2)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "restored weights only" in out      # params-only fallback fired
    assert (tmp_path / "run2" / "save" / "ECAPA_TDNN" / "AAmSoftmax"
            / "model" / "best_state.msgpack").exists()
