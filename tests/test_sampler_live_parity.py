"""Live-reference parity for the speaker-balanced batch sampler.

``data/sampler.py`` is a structural port of the reference's
``TrainSampler`` (src/dataloader.py:155-238): permute → per-speaker
``nPerSpeaker``-tuples capped at ``max_seg_per_spk`` → shuffle → greedy
no-same-speaker-per-batch filter → batch-multiple truncation → static
contiguous rank shard. The two implementations draw from different RNGs
(torch.Generator vs numpy), so sequences cannot match by seed. Here the
randomness is UNIFIED instead: the reference sampler runs live, and our
sampler is driven by a shim RNG that replays torch's exact
``randperm`` draws (same seed, same generator, same call order). Every
downstream list operation is then a pure function of identical inputs,
so the produced tuple sequences — including the same-speaker filter's
greedy decisions, the truncation length, and every rank's shard — must
be EXACTLY identical, element for element.

Covered: epochs 0/1/2 reseeding, a non-multiple ``max_seg_per_spk``
(the cap-then-round vs round-then-cap algebra), a speaker with fewer
utterances than ``nPerSpeaker`` (dropped by both), and distributed
world sizes 1/2/4 × every rank (reference float slicing
``int(rank/world*total)`` vs our integer ``rank*total//world``).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from speakerverification_tpu.data.sampler import SpeakerBatchSampler  # noqa: E402


@pytest.fixture(scope="module")
def ref_dataloader():
    """Import the reference's src/dataloader.py live (deps stubbed)."""
    from test_torch_parity import _install_asteroid_stub

    _install_asteroid_stub()
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    for name in ("soundfile", "pydub"):       # audio_loader import deps
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "pydub":
                mod.AudioSegment = type("AudioSegment", (), {})
            sys.modules[name] = mod
    import dataloader as m                    # /root/reference/src/dataloader.py

    return m


class _TorchPermRNG:
    """numpy-Generator shim that replays torch.randperm draws.

    Our sampler calls ``rng.permutation(n)`` in the same order the
    reference calls ``torch.randperm(n, generator=g)`` (indices first,
    then tuple shuffle), so seeding one torch.Generator reproduces the
    reference's exact random stream inside our implementation.
    """

    def __init__(self, seed: int):
        self.g = torch.Generator()
        self.g.manual_seed(int(seed))

    def permutation(self, n: int) -> np.ndarray:
        return torch.randperm(int(n), generator=self.g).numpy()


def _labels():
    # varied speaker sizes: below nPerSpeaker (spk 4 → dropped), above the
    # max_seg cap (spk 2), odd counts (tuple-rounding), singleton-heavy
    counts = {0: 7, 1: 3, 2: 12, 3: 5, 4: 1, 5: 9, 6: 2, 7: 8, 8: 6, 9: 4}
    labels = []
    for spk, n in counts.items():
        labels += [spk] * n
    return labels


def _run_reference(m, labels, *, n_per, max_seg, batch, seed, epoch,
                   world=1, rank=0):
    src = types.SimpleNamespace(data_label=list(labels))
    s = m.TrainSampler(src, nPerSpeaker=n_per, max_seg_per_spk=max_seg,
                       batch_size=batch, distributed=world > 1, seed=seed)
    s.set_epoch(epoch)
    if world > 1:
        # stand in for an initialized process group (single-node CI)
        s_dist = types.SimpleNamespace(get_world_size=lambda: world,
                                       get_rank=lambda: rank)
        orig = m.dist
        m.dist = s_dist
        try:
            out = [list(t) for t in s]
        finally:
            m.dist = orig
    else:
        out = [list(t) for t in s]
    return out


def _run_ours(labels, *, n_per, max_seg, batch, seed, epoch,
              world=1, rank=0, monkeypatch=None):
    ours = SpeakerBatchSampler(labels, batch_size=batch, nPerSpeaker=n_per,
                               max_seg_per_spk=max_seg, seed=seed,
                               num_replicas=world, rank=rank)
    ours.set_epoch(epoch)
    import speakerverification_tpu.data.sampler as sampler_mod

    monkeypatch.setattr(sampler_mod.np.random, "default_rng",
                        lambda s: _TorchPermRNG(s))
    try:
        return [list(t) for b in ours for t in b]
    finally:
        monkeypatch.undo()


@pytest.mark.parametrize("epoch", [0, 1, 2])
@pytest.mark.parametrize("n_per,max_seg,batch", [(2, 8, 3), (1, 500, 4),
                                                 (2, 7, 3), (3, 9, 2)])
def test_sampler_exact_parity_single(ref_dataloader, monkeypatch, epoch,
                                     n_per, max_seg, batch):
    labels = _labels()
    ref = _run_reference(ref_dataloader, labels, n_per=n_per,
                         max_seg=max_seg, batch=batch, seed=17, epoch=epoch)
    got = _run_ours(labels, n_per=n_per, max_seg=max_seg, batch=batch,
                    seed=17, epoch=epoch, monkeypatch=monkeypatch)
    assert got == ref
    assert len(ref) % batch == 0               # truncation parity implied


@pytest.mark.parametrize("world", [2, 4])
def test_sampler_exact_parity_rank_shards(ref_dataloader, monkeypatch, world):
    labels = _labels() * 3                     # enough tuples for 4 ranks
    shards = []
    for rank in range(world):
        ref = _run_reference(ref_dataloader, labels, n_per=2, max_seg=8,
                             batch=3, seed=5, epoch=1, world=world, rank=rank)
        got = _run_ours(labels, n_per=2, max_seg=8, batch=3, seed=5,
                        epoch=1, world=world, rank=rank,
                        monkeypatch=monkeypatch)
        assert got == ref, f"rank {rank}/{world} shard diverges"
        assert len(ref) > 0
        shards.append(ref)
    flat = [tuple(t) for s in shards for t in s]
    assert len(flat) == len(set(flat))         # disjoint contiguous shards


def test_trainloader_label_mapping_parity(ref_dataloader, tmp_path):
    """Manifest label assignment == reference TrainLoader's dictkeys map.

    The reference maps speaker ids to integer labels by sorted-unique
    order (src/dataloader.py:82-97); `Manifest.read` must produce the
    identical (path, label) pairs for the same CSV — including unsorted
    rows, interleaved speakers, and ids whose lexicographic order
    differs from numeric order ('id10' < 'id2').
    """
    from speakerverification_tpu.data.manifest import Manifest

    rows = [("id10", "a.wav", 1.0, "wav"), ("id2", "b.wav", 1.0, "wav"),
            ("id10", "c.wav", 1.0, "wav"), ("B", "d.wav", 1.0, "wav"),
            ("id2", "e.wav", 1.0, "wav"), ("B", "f.wav", 1.0, "wav")]
    csv_path = tmp_path / "train.csv"
    Manifest.write(csv_path, rows)

    spec = {"sample_rate": 8000, "channels": 1, "sentence_len": 1.0,
            "win_len": 0.025, "hop_len": 0.01}
    ref = ref_dataloader.TrainLoader(
        str(csv_path), augment=False,
        augment_options={"augment_paths": {}, "augment_chain": []},
        audio_spec=spec)
    ours = Manifest.read(csv_path)
    assert ours.paths == ref.data_list
    assert ours.labels == ref.data_label
    assert ours.num_classes == len(ref.label_dict)


def test_sampler_no_same_speaker_invariant(ref_dataloader, monkeypatch):
    """The greedy filter's guarantee, asserted on OUR native-RNG output."""
    labels = _labels()
    ours = SpeakerBatchSampler(labels, batch_size=3, nPerSpeaker=2,
                               max_seg_per_spk=8, seed=0)
    label_arr = np.asarray(labels)
    for batch in ours:
        spk = [label_arr[t[0]] for t in batch]
        assert len(spk) == len(set(spk))
