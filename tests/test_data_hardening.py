"""Regression tests for data/evaluation edge cases found in the
round-3 full-directory review: augmentation-cancelling normalization,
destructive restore globs, trial-parsing desync, degenerate files,
loader thread leaks, and report misnaming.
"""

import threading
import time

import numpy as np
import pytest

from speakerverification_tpu.data.audio import load_wav

SPEC = {"sample_rate": 8000, "sentence_len": 0.2,
        "win_len": 0.025, "hop_len": 0.01}


def test_recrop_preserves_volume_gain():
    """load_wav(ndarray, normalize=False) must keep relative amplitude —
    peak-normalizing the post-augment re-crop exactly cancels volume
    augmentation (the reference normalizes by the int16 RANGE, which
    preserves gain: audio_loader.py:99, wav_conversion.py:35)."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.1, 4000).astype(np.float32)
    quiet = load_wav(0.25 * x, SPEC, evalmode=False, random_chunk=False,
                     normalize=False)
    loud = load_wav(x, SPEC, evalmode=False, random_chunk=False,
                    normalize=False)
    np.testing.assert_allclose(np.abs(quiet).max(),
                               0.25 * np.abs(loud).max(), rtol=1e-6)
    # default path still normalizes (reference ndarray-branch parity)
    n = load_wav(0.25 * x, SPEC, evalmode=False, random_chunk=False)
    assert np.abs(n).max() == pytest.approx(1.0, rel=1e-5)


def test_restore_dataset_exact_suffixes(tmp_path):
    """Only generated *_vad.wav / *_aug<k>.wav files are deleted — raw
    files whose names merely CONTAIN the markers survive."""
    from speakerverification_tpu.data.dataprep import restore_dataset
    from speakerverification_tpu.data.wav_conversion import write_wav

    sig = np.zeros(100, np.float32)
    keep = ["interview_augmented.wav", "sess_vadim_01.wav", "clean.wav"]
    drop = ["u1_vad.wav", "u1_aug0.wav", "u2_aug12.wav", "u3_aug.wav"]
    for name in keep + drop:
        write_wav(tmp_path / "spk" / name, sig, 8000)
    removed = restore_dataset(tmp_path)
    assert removed == len(drop)
    left = {p.name for p in (tmp_path / "spk").glob("*.wav")}
    assert left == set(keep)


def test_parse_trials_rejects_malformed_lines(tmp_path):
    from speakerverification_tpu.evaluation.evaluator import parse_trials

    bad = tmp_path / "bad.txt"
    bad.write_text("1 a.wav b.wav\n1 only_one_field.wav\n")
    with pytest.raises(ValueError, match="bad trial line 1"):
        parse_trials(bad, with_label=True)

    # a header first line is skipped WITHOUT desyncing the outputs
    hdr = tmp_path / "hdr.txt"
    hdr.write_text("label,file1,file2\n1,a.wav,b.wav\n0,c.wav,d.wav\n")
    labels, refs, coms = parse_trials(hdr, with_label=True)
    assert len(labels) == len(refs) == len(coms) == 2


def test_sniff_has_label(tmp_path):
    from speakerverification_tpu.evaluation.evaluator import sniff_has_label

    f = tmp_path / "t.txt"
    f.write_text("label,file1,file2\n1,a.wav,b.wav\n")
    assert sniff_has_label(f)                 # header must not hide labels
    f.write_text("-1 a.wav b.wav\n")
    assert sniff_has_label(f)                 # negative labels count
    f.write_text("a.wav b.wav\nc.wav d.wav\n")
    assert not sniff_has_label(f)


def test_audio_stats_empty_wav(tmp_path):
    """A zero-frame WAV reports duration 0 instead of crashing the
    quality scan that exists to quarantine it."""
    import struct

    from speakerverification_tpu.data.quality import audio_stats

    p = tmp_path / "empty.wav"
    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 0))
    p.write_bytes(hdr)
    st = audio_stats(p)
    assert st["duration"] == 0.0 and st["rms_dbfs"] <= -200


def test_train_loader_early_break_reclaims_threads(tmp_path):
    """Breaking out of an epoch mid-iteration must wind the producer
    (and its worker pool) down instead of leaking them every epoch."""
    from speakerverification_tpu.data.loader import TrainDataLoader
    from speakerverification_tpu.data.manifest import Manifest, generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav

    rng = np.random.default_rng(1)
    for spk in range(4):
        for utt in range(4):
            write_wav(tmp_path / "d" / f"s{spk}" / f"u{utt}.wav",
                      rng.normal(0, 0.1, 2000).astype(np.float32), 8000)
    generate_metadata(tmp_path / "d", tmp_path / "m", num_val_utts=0)
    manifest = Manifest.read(tmp_path / "m" / "train.csv")
    loader = TrainDataLoader(manifest=manifest, audio_spec=SPEC,
                             batch_size=2, num_workers=2, nPerSpeaker=1,
                             max_seg_per_spk=100)
    base = threading.active_count()
    for _ in range(5):
        for i, batch in enumerate(loader):
            break                                  # early exit every epoch
    deadline = time.time() + 10
    while threading.active_count() > base + 1 and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= base + 1, \
        f"leaked threads: {threading.enumerate()}"


def test_extract_embeddings_empty_list_raises():
    from speakerverification_tpu.evaluation.evaluator import extract_embeddings

    with pytest.raises(ValueError, match="empty file list"):
        extract_embeddings(lambda w: w, [], SPEC)


def test_eval_loader_whole_file_mode(tmp_path):
    """num_eval=0 (whole-file) batches one file at a time — stacking
    variable-length files is impossible (reference's batch-1 eval)."""
    from speakerverification_tpu.data.loader import EvalDataLoader
    from speakerverification_tpu.data.wav_conversion import write_wav

    rng = np.random.default_rng(2)
    f1, f2 = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(f1, rng.normal(0, 0.1, 3000).astype(np.float32), 8000)
    write_wav(f2, rng.normal(0, 0.1, 5000).astype(np.float32), 8000)
    loader = EvalDataLoader([str(f1), str(f2)], SPEC, num_eval=0,
                            batch_size=32)
    batches = list(loader)
    assert len(batches) == 2
    (w1, p1), (w2, p2) = batches
    assert w1.shape[0] == 1 and w2.shape[0] == 1
    assert w1.shape[-1] != w2.shape[-1]           # whole files, unpadded


def test_classification_report_absent_class():
    from speakerverification_tpu.evaluation.reports import classification_report

    rep = classification_report([1, 1, 1], [1, 1, 1],
                                target_names=["Label '0'", "Label '1'"])
    assert "Label '1'" in rep and "Label '0'" not in rep
