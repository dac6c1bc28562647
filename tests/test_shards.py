"""Packed-shard dataset (data/shards.py): pack → index → mmap reads;
crops byte-identical to the load_wav file path; loader integration."""

import json

import numpy as np
import pytest

from speakerverification_tpu.data.audio import load_wav
from speakerverification_tpu.data.manifest import Manifest
from speakerverification_tpu.data.shards import (
    INDEX_NAME,
    ShardedAudioSource,
    pack_shards,
)
from speakerverification_tpu.data.wavio import write_wav

SPEC = {"sample_rate": 8000, "channels": 1, "sentence_len": 1.0,
        "win_len": 0.025, "hop_len": 0.01}          # max_audio = 8000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """4 speakers x 3 utts; lengths straddle max_audio (8000):
    short (pad-wrap), exact boundary, long (real crops)."""
    root = tmp_path_factory.mktemp("shards_ds")
    rng = np.random.default_rng(0)
    paths, labels = [], []
    lengths = [3000, 8000, 21000]
    for spk in range(4):
        for u, n in enumerate(lengths):
            sig = (0.25 * np.sin(np.arange(n) * (0.02 + 0.003 * spk))
                   + rng.normal(0, 0.05, n)).astype(np.float32)
            p = root / "raw" / f"s{spk}" / f"u{u}.wav"
            write_wav(p, sig, 8000)
            paths.append(str(p))
            labels.append(spk)
    manifest = Manifest(paths=paths, labels=labels,
                        speakers=sorted(set(labels)))
    out = root / "packed"
    stats = pack_shards(manifest, out, shard_mb=1)   # small cap: 1 shard ok
    return manifest, out, stats


def test_pack_stats_and_index(corpus):
    manifest, out, stats = corpus
    assert stats["utts"] == 12
    assert stats["requantized"] == 0       # 16-bit PCM: exact round-trip
    assert (out / INDEX_NAME).exists()
    idx = json.loads((out / INDEX_NAME).read_text())
    assert idx["sample_rate"] == 8000
    assert [u[4] for u in idx["utts"]] == manifest.paths   # manifest order
    # offsets tile each shard contiguously
    by_shard = {}
    for s, off, n, lab, _ in idx["utts"]:
        assert off == by_shard.get(s, 0)
        by_shard[s] = off + n


def test_full_load_matches_wav_decode(corpus):
    manifest, out, _ = corpus
    src = ShardedAudioSource(out)
    for i in (0, 5, 11):
        got = src.load(i)
        want = load_wav(manifest.paths[i], SPEC, load_all=True)[0]
        np.testing.assert_array_equal(got, want)
        assert src.label(i) == manifest.labels[i]
    assert src.index_of(manifest.paths[3]) == 3


def test_train_crops_byte_identical_to_file_path(corpus):
    """Same rng seed -> exact same crop bytes through both paths, for
    short (pad-wrap), boundary, and long utterances."""
    manifest, out, _ = corpus
    src = ShardedAudioSource(out)
    for i in range(12):
        for seed in (1, 2):
            a = src.crop_train(i, SPEC, rng=np.random.default_rng(seed))
            b = load_wav(manifest.paths[i], SPEC, evalmode=False,
                         random_chunk=True, rng=np.random.default_rng(seed))
            np.testing.assert_array_equal(a, b, err_msg=f"utt {i}")
        # deterministic path too
        a = src.crop_train(i, SPEC, random_chunk=False)
        b = load_wav(manifest.paths[i], SPEC, evalmode=False,
                     random_chunk=False)
        np.testing.assert_array_equal(a, b)


def test_eval_crops_match_file_path(corpus):
    manifest, out, _ = corpus
    src = ShardedAudioSource(out)
    for i in (0, 2, 7):
        for num_eval in (0, 4):
            a = src.crops_eval(i, SPEC, num_eval=num_eval)
            b = load_wav(manifest.paths[i], SPEC, evalmode=True,
                         num_eval=num_eval)
            np.testing.assert_array_equal(a, b)


def test_loader_with_shards_equals_file_loader(corpus):
    from speakerverification_tpu.data.loader import TrainDataLoader

    manifest, out, _ = corpus
    src = ShardedAudioSource(out)
    mk = dict(manifest=manifest, audio_spec=SPEC, batch_size=3,
              nPerSpeaker=2, num_workers=2, seed=7)
    file_loader = TrainDataLoader(**mk)
    shard_loader = TrainDataLoader(**mk, shard_source=src)
    for fb, sb in zip(file_loader, shard_loader):
        np.testing.assert_array_equal(fb["wave"], sb["wave"])
        np.testing.assert_array_equal(fb["label"], sb["label"])
        break                                        # one batch suffices


def test_loader_shard_mismatch_fails_loudly(corpus, tmp_path):
    from speakerverification_tpu.data.loader import TrainDataLoader

    manifest, out, _ = corpus
    src = ShardedAudioSource(out)
    short = Manifest(paths=manifest.paths[:6], labels=manifest.labels[:6],
                     speakers=manifest.speakers)
    with pytest.raises(ValueError, match="repack"):
        TrainDataLoader(manifest=short, audio_spec=SPEC, batch_size=2,
                        nPerSpeaker=2, shard_source=src)
    with pytest.raises(FileNotFoundError):
        ShardedAudioSource(tmp_path / "nope")

    # SAME length, different middle membership: spot probes would pass;
    # the full-manifest fingerprint must catch it
    shuffled = list(manifest.paths)
    shuffled[3], shuffled[7] = shuffled[7], shuffled[3]
    remade = Manifest(paths=shuffled, labels=manifest.labels,
                      speakers=manifest.speakers)
    with pytest.raises(ValueError, match="different manifest"):
        TrainDataLoader(manifest=remade, audio_spec=SPEC, batch_size=3,
                        nPerSpeaker=2, shard_source=src)


def test_pack_rejects_sample_rate_mismatch(corpus, tmp_path):
    manifest, _, _ = corpus
    with pytest.raises(ValueError, match="sample rate"):
        pack_shards(manifest, tmp_path / "bad", sample_rate=16000)


def test_pack_empty_manifest_fails_loudly(tmp_path):
    empty = Manifest(paths=[], labels=[], speakers=[])
    with pytest.raises(ValueError, match="nothing to pack"):
        pack_shards(empty, tmp_path / "empty")


def test_loader_rejects_rate_mismatched_pack(corpus):
    from speakerverification_tpu.data.loader import TrainDataLoader

    manifest, out, _ = corpus
    src = ShardedAudioSource(out)              # packed at 8 kHz
    spec16 = dict(SPEC, sample_rate=16000)
    with pytest.raises(ValueError, match="8000 Hz"):
        TrainDataLoader(manifest=manifest, audio_spec=spec16,
                        batch_size=2, nPerSpeaker=2, shard_source=src)


def test_pack_counts_requantized_sources(tmp_path):
    """A float-WAV source is not on the int16 grid: packing still works
    but the stats record the quantization."""
    import struct
    from speakerverification_tpu.data.wavio import _parse_wav

    sig = (np.random.default_rng(3).uniform(-0.4, 0.4, 9000)
           .astype(np.float32) + 1e-6)         # off-grid values
    p = tmp_path / "f32.wav"
    data = sig.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                   8000 * 4, 4, 32)
           + b"data" + struct.pack("<I", len(data)))
    p.write_bytes(hdr + data)
    m = Manifest(paths=[str(p)], labels=[0], speakers=[0])
    stats = pack_shards(m, tmp_path / "packed")
    assert stats["requantized"] == 1
    src = ShardedAudioSource(tmp_path / "packed")
    got = src.load(0)
    np.testing.assert_allclose(got, sig, atol=0.5 / 32768)


def test_train_data_loader_hparams_wiring(corpus, tmp_path):
    """dataloader_options: {shards: dir} builds the shard source."""
    from speakerverification_tpu.data.loader import train_data_loader

    manifest, out, _ = corpus
    csv = tmp_path / "train.csv"
    Manifest.write(csv, [[f"s{l}", p] for p, l in
                         zip(manifest.paths, manifest.labels)])
    h = {"train_annotation": str(csv), "audio_spec": SPEC,
         "dataloader_options": {"batch_size": 3, "nPerSpeaker": 2,
                                "shards": str(out)}, "seed": 7}
    loader = train_data_loader(h)
    assert loader.shard_source is not None
    batch = next(iter(loader))
    assert batch["wave"].shape == (3, 2, 8000)
    assert np.isfinite(batch["wave"]).all()


def test_pack_cli(corpus, tmp_path):
    from speakerverification_tpu.cli.dataprep import main

    manifest, _, _ = corpus
    csv = tmp_path / "train.csv"
    Manifest.write(csv, [[f"s{l}", p] for p, l in
                         zip(manifest.paths, manifest.labels)])
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "train_annotation: %s\naudio_spec:\n  sample_rate: 8000\n"
        "  channels: 1\n  sentence_len: 1.0\n  win_len: 0.025\n"
        "  hop_len: 0.01\n" % csv)
    out = tmp_path / "packed"
    assert main(["--config", str(cfg), "--pack", str(out),
                 "--shard_mb", "1"]) == 0
    src = ShardedAudioSource(out)
    assert len(src) == 12
