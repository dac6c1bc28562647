"""dataprep CLI verbs end-to-end."""

import json

import numpy as np
import pytest

from speakerverification_tpu.cli.dataprep import main as dataprep_main
from speakerverification_tpu.data import write_wav

SR = 8000


@pytest.fixture()
def workspace(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    for spk in range(3):
        for u in range(4):
            t = np.arange(SR) / SR
            env = (np.sin(2 * np.pi * 1.1 * t) > 0).astype(np.float32)
            sig = env * np.sin(2 * np.pi * (200 + 80 * spk) * t) * 0.4
            write_wav(data / f"spk{spk}" / f"u{u}.wav",
                      (sig + rng.normal(0, 0.003, SR)).astype(np.float32), SR)
    cfg = tmp_path / "c.yaml"
    cfg.write_text(f"""\
data_folder: {data}
train_annotation: {tmp_path}/meta/train.csv
seed: 0
audio_spec: {{sample_rate: {SR}, sentence_len: 1.0, win_len: 0.025, hop_len: 0.01}}
dataloader_options: {{split_ratio: -1}}
noise_folder: {tmp_path}/noise
""")
    return tmp_path, cfg


def test_generate_and_stats(workspace, capsys):
    tmp_path, cfg = workspace
    rc = dataprep_main(["--generate", "--config", str(cfg)])
    assert rc == 0
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[0])
    assert stats["n_speakers"] == 3
    assert (tmp_path / "meta" / "train.csv").exists()

    rc = dataprep_main(["--stats", "--config", str(cfg)])
    assert rc == 0
    out = capsys.readouterr().out
    agg = json.loads(out)
    assert agg["n_files"] == 12
    assert agg["total_hours"] > 0


def test_vad_and_restore(workspace, capsys):
    tmp_path, cfg = workspace
    rc = dataprep_main(["--vad", "--config", str(cfg)])
    assert rc == 0
    assert "vad:" in capsys.readouterr().out
    n_vad = len(list((tmp_path / "data").rglob("*_vad.wav")))
    assert n_vad > 0
    rc = dataprep_main(["--restore", "--config", str(cfg)])
    assert rc == 0
    assert len(list((tmp_path / "data").rglob("*_vad.wav"))) == 0


def test_split_musan_cli(workspace, capsys):
    tmp_path, cfg = workspace
    rng = np.random.default_rng(1)
    write_wav(tmp_path / "noise" / "musan" / "noise" / "free" / "n0.wav",
              rng.normal(0, 0.1, 16000 * 9).astype(np.float32), 16000)
    rc = dataprep_main(["--split_musan", "--config", str(cfg)])
    assert rc == 0
    assert "split_musan: 2 chunks" in capsys.readouterr().out
