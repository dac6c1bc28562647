"""Device-resident SpeakerBank: exact parity with the reference's
host identification scan (src/inference.py:254-327 semantics), padding
masks, query bucketing, and the serving /identify device route."""

import http.client
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from speakerverification_tpu.evaluation.bank import (
    SpeakerBank,
    identify_with_bank,
)


def _host_scan(enrolled, queries):
    """The pre-bank path: d^2 expansion on normalized vectors,
    score = 1 - d^2/2 (evaluator.predict_identity)."""
    def norm(x):
        return x / np.clip(np.linalg.norm(x, axis=-1, keepdims=True),
                           1e-12, None)
    e, q = norm(enrolled), norm(queries)
    d2 = (np.sum(q**2, -1)[:, None] + np.sum(e**2, -1)[None, :]
          - 2.0 * q @ e.T)
    best = np.argmin(d2, axis=-1)
    return best, 1.0 - d2[np.arange(len(best)), best] / 2.0


def test_bank_matches_host_scan_with_padding():
    rng = np.random.default_rng(0)
    enrolled = rng.normal(size=(300, 16)).astype(np.float32)   # pads 300->384
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    bank = SpeakerBank(enrolled, pad_rows_to=128)
    assert bank.n_pad == 384

    scores, idx = bank.identify(queries, k=3)
    assert scores.shape == (7, 3) and idx.shape == (7, 3)
    best_host, score_host = _host_scan(enrolled, queries)
    np.testing.assert_array_equal(idx[:, 0], best_host)
    np.testing.assert_allclose(scores[:, 0], score_host, atol=1e-5)
    # top-k is sorted descending and indices are distinct real rows
    assert np.all(np.diff(scores, axis=1) <= 1e-7)
    assert np.all(idx < 300)


def test_bank_padding_never_wins_on_all_negative_scores():
    # every real cosine is negative — the -2 pad fill must still lose
    rng = np.random.default_rng(1)
    base = np.abs(rng.normal(size=(5, 8))).astype(np.float32)
    bank = SpeakerBank(base, pad_rows_to=64)                  # 59 pad rows
    scores, idx = bank.identify(-base[:2], k=5)
    assert np.all(idx < 5)
    assert np.all(scores > -1.5)


def test_bank_query_chunking_matches_one_shot():
    rng = np.random.default_rng(2)
    enrolled = rng.normal(size=(50, 12)).astype(np.float32)
    queries = rng.normal(size=(21, 12)).astype(np.float32)
    small = SpeakerBank(enrolled, pad_rows_to=64, query_buckets=(1, 4))
    big = SpeakerBank(enrolled, pad_rows_to=64, query_buckets=(32,))
    s1, i1 = small.identify(queries, k=2)      # chunks of <=4
    s2, i2 = big.identify(queries, k=2)        # one padded dispatch
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_bank_k_clamps_and_1d_query():
    rng = np.random.default_rng(3)
    bank = SpeakerBank(rng.normal(size=(3, 4)).astype(np.float32),
                       ["a", "b", "c"], pad_rows_to=8)
    scores, idx = bank.identify(rng.normal(size=4).astype(np.float32), k=10)
    assert scores.shape == (1, 3)              # k clamped to n
    assert bank.name(int(idx[0, 0])) in ("a", "b", "c")


def test_identify_with_bank_threshold_semantics():
    # orthonormal bank, query == row 1 -> score 1.0; threshold above it
    # yields 'unknown' (reference --predict semantics)
    enrolled = np.eye(4, dtype=np.float32)
    bank = SpeakerBank(enrolled, {0: "s0", 1: "s1", 2: "s2", 3: "s3"},
                       pad_rows_to=8)
    q = np.stack([enrolled[1], -enrolled[2]])
    names, scores = identify_with_bank(bank, q, threshold=0.5)
    assert names == ["s1", "unknown"]
    assert scores[0] == pytest.approx(1.0, abs=1e-6)
    # -e2's best match is any orthogonal row at cos 0 — still 'unknown'
    assert scores[1] == pytest.approx(0.0, abs=1e-6)


def test_bank_bf16_storage_ranks_separated_speakers():
    import jax.numpy as jnp
    enrolled = np.eye(8, dtype=np.float32)
    bank = SpeakerBank(enrolled, dtype=jnp.bfloat16, pad_rows_to=8)
    scores, idx = bank.identify(enrolled[5], k=1)
    assert int(idx[0, 0]) == 5
    assert scores.dtype == np.float32          # ranking stays fp32


def test_bank_input_validation():
    with pytest.raises(ValueError, match=r"\[N, D\]"):
        SpeakerBank(np.zeros((2, 3, 4), np.float32))
    bank = SpeakerBank(np.eye(3, dtype=np.float32), pad_rows_to=8)
    with pytest.raises(ValueError, match="dim"):
        bank.identify(np.zeros((1, 7), np.float32))


# ---------------------------------------------------------------- sharded
def _bank_mesh(n=8):
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:n]), ("bank",))


def test_sharded_bank_matches_unsharded_exactly():
    from speakerverification_tpu.evaluation.bank import ShardedSpeakerBank

    rng = np.random.default_rng(11)
    # 300 rows pad to 320 (8 devs x 5 x pad_rows_to=8): uneven tail shard
    enrolled = rng.normal(size=(300, 16)).astype(np.float32)
    queries = rng.normal(size=(9, 16)).astype(np.float32)
    mesh = _bank_mesh()
    sb = ShardedSpeakerBank(enrolled, mesh=mesh, pad_rows_to=8,
                            query_buckets=(16,))
    assert sb.shard_rows * 8 == sb.n_pad and sb.n_pad >= 300
    ub = SpeakerBank(enrolled, pad_rows_to=sb.n_pad, query_buckets=(16,))

    for k in (1, 3, 40):  # k=40 exceeds... shard candidates when small
        ss, si = sb.identify(queries, k=k)
        us, ui = ub.identify(queries, k=k)
        np.testing.assert_array_equal(si, ui)
        np.testing.assert_allclose(ss, us, atol=1e-5)


def test_sharded_bank_is_actually_row_sharded():
    import jax
    from jax.sharding import PartitionSpec as P
    from speakerverification_tpu.evaluation.bank import ShardedSpeakerBank

    mesh = _bank_mesh()
    sb = ShardedSpeakerBank(np.eye(16, dtype=np.float32), mesh=mesh,
                            pad_rows_to=2)
    assert sb._bank.sharding.spec == P("bank", None)
    # each device holds 1/8 of the rows
    shard = sb._bank.addressable_shards[0]
    assert shard.data.shape[0] == sb.n_pad // 8


def test_sharded_bank_predict_semantics_and_validation():
    from speakerverification_tpu.evaluation.bank import ShardedSpeakerBank

    mesh = _bank_mesh()
    enrolled = np.eye(8, dtype=np.float32)
    sb = ShardedSpeakerBank(enrolled, [f"s{i}" for i in range(8)],
                            mesh=mesh, pad_rows_to=1)
    names, scores = identify_with_bank(
        sb, np.stack([enrolled[3], -enrolled[0]]), threshold=0.5)
    assert names == ["s3", "unknown"]
    assert scores[0] == pytest.approx(1.0, abs=1e-6)

    with pytest.raises(ValueError, match="no axis"):
        ShardedSpeakerBank(enrolled, mesh=mesh, axis="rows")
    with pytest.raises(ValueError, match="dim"):
        sb.identify(np.zeros((1, 5), np.float32))


# ---------------------------------------------------------------- serving
def test_serving_identify_device_bank_matches_host(tmp_path):
    from tests.test_serving import (
        NUM_EVAL,
        SAMPLES,
        FakeEngine,
        _post,
        _serving_hparams,
    )
    from speakerverification_tpu.serving import make_serving_app

    rng = np.random.default_rng(7)
    pcm = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()

    results = {}
    # host scan / single-device bank / 8-way row-sharded bank
    for forced, bank_devices in ((False, 1), (True, 1), (True, 8)):
        engine = FakeEngine(tmp_path)
        h = _serving_hparams()
        h["serving"]["device_bank"] = forced
        h["serving"]["bank_devices"] = bank_devices
        handler, batcher = make_serving_app(engine, h)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            port = httpd.server_address[1]
            status, out = _post(port, "/embed",
                                {"pcm": pcm, "sample_rate": 8000})
            assert status == 200
            emb = np.asarray(out["embedding"], np.float32)
            np.save(tmp_path / "embeds.npy",
                    np.stack([np.roll(emb, 1), emb, -emb]))
            np.save(tmp_path / "classes.npy",
                    {0: "spk0", 1: "spk1", 2: "spk2"}, allow_pickle=True)
            status, out = _post(port, "/identify",
                                {"pcm": pcm, "sample_rate": 8000})
            assert status == 200
            results[(forced, bank_devices)] = out
        finally:
            httpd.shutdown()
            batcher.close()

    host, dev1, dev8 = (results[(False, 1)], results[(True, 1)],
                        results[(True, 8)])
    assert host["speaker"] == dev1["speaker"] == dev8["speaker"] == "spk1"
    assert dev1["score"] == pytest.approx(host["score"], abs=1e-4)
    assert dev8["score"] == pytest.approx(host["score"], abs=1e-4)


# ------------------------------------------------------------- enrollment
def test_bank_add_within_capacity_matches_rebuild():
    rng = np.random.default_rng(20)
    base = rng.normal(size=(100, 16)).astype(np.float32)
    extra = rng.normal(size=(7, 16)).astype(np.float32)
    queries = rng.normal(size=(5, 16)).astype(np.float32)

    live = SpeakerBank(base, pad_rows_to=128)          # 28 spare rows
    idx = live.add(extra)
    assert list(idx) == list(range(100, 107))
    assert live.n == 107 and live.n_pad == 128         # no growth

    rebuilt = SpeakerBank(np.concatenate([base, extra]), pad_rows_to=128)
    s1, i1 = live.identify(queries, k=4)
    s2, i2 = rebuilt.identify(queries, k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_bank_add_grows_past_padding():
    rng = np.random.default_rng(21)
    base = rng.normal(size=(30, 8)).astype(np.float32)
    extra = rng.normal(size=(6, 8)).astype(np.float32)
    bank = SpeakerBank(base, pad_rows_to=32)           # 2 spare rows
    bank.add(extra)                                    # 36 > 32: grows
    assert bank.n == 36 and bank.n_pad == 64

    rebuilt = SpeakerBank(np.concatenate([base, extra]), pad_rows_to=32)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    s1, i1 = bank.identify(q, k=3)
    s2, i2 = rebuilt.identify(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_bank_add_labels_and_validation():
    bank = SpeakerBank(np.eye(8, dtype=np.float32)[:4],
                       {i: f"s{i}" for i in range(4)}, pad_rows_to=8)
    bank.add(np.eye(8, dtype=np.float32)[5], ["newbie"])
    names, scores = identify_with_bank(
        bank, np.eye(8, dtype=np.float32)[5], threshold=0.5)
    assert names == ["newbie"]
    with pytest.raises(ValueError, match="names"):
        bank.add(np.zeros((2, 8), np.float32))         # labeled bank
    with pytest.raises(ValueError, match="dim"):
        bank.add(np.zeros((1, 5), np.float32), ["x"])
    with pytest.raises(ValueError, match="names"):
        bank.add(np.zeros((2, 8), np.float32), ["only-one"])


def test_sharded_bank_add_matches_rebuild_and_keeps_sharding():
    from jax.sharding import PartitionSpec as P
    from speakerverification_tpu.evaluation.bank import ShardedSpeakerBank

    rng = np.random.default_rng(22)
    mesh = _bank_mesh()
    base = rng.normal(size=(60, 16)).astype(np.float32)
    extra = rng.normal(size=(3, 16)).astype(np.float32)
    q = rng.normal(size=(5, 16)).astype(np.float32)

    live = ShardedSpeakerBank(base, mesh=mesh, pad_rows_to=8)   # pad 64
    live.add(extra)
    assert live.n == 63 and live.n_pad == 64
    assert live._bank.sharding.spec == P("bank", None)

    rebuilt = ShardedSpeakerBank(np.concatenate([base, extra]),
                                 mesh=mesh, pad_rows_to=8)
    s1, i1 = live.identify(q, k=4)
    s2, i2 = rebuilt.identify(q, k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    # growth across the sharded padding re-pads with equal shards
    live.add(rng.normal(size=(10, 16)).astype(np.float32))
    assert live.n == 73 and live.n_pad == 128
    assert live.shard_rows == 16
    assert live._bank.sharding.spec == P("bank", None)
    reb2 = ShardedSpeakerBank(np.asarray(live._bank)[:73], mesh=mesh,
                              pad_rows_to=8)
    s3, i3 = live.identify(q, k=4)
    s4, i4 = reb2.identify(q, k=4)
    np.testing.assert_array_equal(i3, i4)
    np.testing.assert_allclose(s3, s4, atol=1e-6)


def test_bank_remove_swap_with_last_matches_rebuild():
    rng = np.random.default_rng(23)
    base = rng.normal(size=(10, 8)).astype(np.float32)
    labels = [f"s{i}" for i in range(10)]
    bank = SpeakerBank(base, labels, pad_rows_to=16)

    moved = bank.remove(3)                 # s9 moves into slot 3
    assert moved == 3 and bank.n == 9
    assert bank.name(3) == "s9"
    want = base.copy()
    want[3] = base[9]
    rebuilt = SpeakerBank(want[:9], pad_rows_to=16)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    s1, i1 = bank.identify(q, k=3)
    s2, i2 = rebuilt.identify(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    assert bank.remove(8) is None          # removing the last row: no move
    assert bank.n == 8
    with pytest.raises(IndexError):
        bank.remove(8)

    # drain to empty: identify returns empty, then re-add works
    for _ in range(8):
        bank.remove(0)
    s, i = bank.identify(q, k=1)
    assert s.shape == (4, 0) and i.shape == (4, 0)
    with pytest.raises(ValueError, match="no enrolled"):
        identify_with_bank(bank, q)
    bank.add(base[0], ["back"])
    names, _ = identify_with_bank(bank, base[0])
    assert names == ["back"]


def test_sharded_bank_remove_matches_rebuild():
    from speakerverification_tpu.evaluation.bank import ShardedSpeakerBank

    rng = np.random.default_rng(24)
    mesh = _bank_mesh()
    base = rng.normal(size=(40, 16)).astype(np.float32)
    bank = ShardedSpeakerBank(base, mesh=mesh, pad_rows_to=4)
    bank.remove(5)
    want = base.copy()
    want[5] = base[39]
    rebuilt = ShardedSpeakerBank(want[:39], mesh=mesh, pad_rows_to=4)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    s1, i1 = bank.identify(q, k=5)
    s2, i2 = rebuilt.identify(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_serving_enroll_then_identify_and_persist(tmp_path):
    """POST /enroll adds a live speaker: the next /identify finds them
    on the device bank without a rebuild, and a server restart sees the
    persisted artifacts."""
    from tests.test_serving import SAMPLES, FakeEngine, _post, _serving_hparams
    from speakerverification_tpu.serving import make_serving_app

    rng = np.random.default_rng(9)
    pcm = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
    other = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()

    def _spin(engine, h):
        handler, batcher = make_serving_app(engine, h)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd, batcher, httpd.server_address[1]

    h = _serving_hparams()
    h["serving"]["device_bank"] = True
    httpd, batcher, port = _spin(FakeEngine(tmp_path), h)
    try:
        # seed bank: one far-away speaker
        status, out = _post(port, "/embed",
                            {"pcm": other, "sample_rate": 8000})
        assert status == 200
        emb = np.asarray(out["embedding"], np.float32)
        np.save(tmp_path / "embeds.npy", -emb[None, :])
        np.save(tmp_path / "classes.npy", {0: "faraway"}, allow_pickle=True)

        status, out = _post(port, "/enroll",
                            {"pcm": pcm, "sample_rate": 8000,
                             "name": "alice"})
        assert status == 200 and out["index"] == 1 and out["enrolled"] == 2

        status, out = _post(port, "/identify",
                            {"pcm": pcm, "sample_rate": 8000})
        assert status == 200 and out["speaker"] == "alice"

        status, out = _post(port, "/enroll", {"pcm": pcm,
                                              "sample_rate": 8000})
        assert status == 400 and "name" in out["error"]

        # top-k candidates: both speakers ranked, alice first
        status, out = _post(port, "/identify",
                            {"pcm": pcm, "sample_rate": 8000, "k": 5})
        assert status == 200
        names = [c["speaker"] for c in out["candidates"]]
        assert names[0] == out["speaker"] == "alice"
        assert set(names) == {"alice", "faraway"}
        scores = [c["score"] for c in out["candidates"]]
        assert scores == sorted(scores, reverse=True)
    finally:
        httpd.shutdown()
        batcher.close()

    # restart: the persisted artifacts carry the live enrollment
    httpd, batcher, port = _spin(FakeEngine(tmp_path), h)
    try:
        status, out = _post(port, "/identify",
                            {"pcm": pcm, "sample_rate": 8000})
        assert status == 200 and out["speaker"] == "alice"
        classes = np.load(tmp_path / "classes.npy", allow_pickle=True).item()
        assert classes == {0: "faraway", 1: "alice"}

        # /unenroll by name: alice swaps into slot 0 and persists
        status, out = _post(port, "/unenroll", {"name": "faraway"})
        assert status == 200 and out == {"speaker": "faraway",
                                         "enrolled": 1}
        status, out = _post(port, "/identify",
                            {"pcm": pcm, "sample_rate": 8000})
        assert status == 200 and out["speaker"] == "alice"
        classes = np.load(tmp_path / "classes.npy", allow_pickle=True).item()
        assert classes == {0: "alice"}
        status, out = _post(port, "/unenroll", {"name": "nobody"})
        assert status == 400
    finally:
        httpd.shutdown()
        batcher.close()


def test_serving_concurrent_enroll_is_serialized(tmp_path):
    """N parallel /enroll requests must each get a distinct index and
    all land in the bank (the banks_lock serializes index assignment
    while embedding still batches concurrently)."""
    from concurrent.futures import ThreadPoolExecutor
    from tests.test_serving import SAMPLES, FakeEngine, _post, _serving_hparams
    from speakerverification_tpu.serving import make_serving_app

    rng = np.random.default_rng(10)
    h = _serving_hparams()
    h["serving"]["device_bank"] = True
    handler, batcher = make_serving_app(FakeEngine(tmp_path), h)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        seed = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
        status, out = _post(port, "/embed",
                            {"pcm": seed, "sample_rate": 8000})
        emb = np.asarray(out["embedding"], np.float32)
        np.save(tmp_path / "embeds.npy", -emb[None, :])
        np.save(tmp_path / "classes.npy", {0: "seed"}, allow_pickle=True)

        # pre-generate audio: numpy Generators are not thread-safe
        pcms = [rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
                for _ in range(8)]

        def enroll(i):
            return _post(port, "/enroll", {"pcm": pcms[i],
                                           "sample_rate": 8000,
                                           "name": f"spk{i}"})

        with ThreadPoolExecutor(8) as ex:
            results = list(ex.map(enroll, range(8)))
        assert all(st == 200 for st, _ in results)
        indices = sorted(out["index"] for _, out in results)
        assert indices == list(range(1, 9))          # distinct, gap-free
        classes = np.load(tmp_path / "classes.npy",
                          allow_pickle=True).item()
        assert len(classes) == 9
        assert len(np.load(tmp_path / "embeds.npy")) == 9
    finally:
        httpd.shutdown()
        batcher.close()


def test_rwlock_readers_share_writers_exclude():
    import time
    from concurrent.futures import ThreadPoolExecutor
    from speakerverification_tpu.serving import _RWLock

    lock = _RWLock()
    peak = {"readers": 0}
    active = {"n": 0}
    guard = threading.Lock()

    def reader():
        with lock.read():
            with guard:
                active["n"] += 1
                peak["readers"] = max(peak["readers"], active["n"])
            time.sleep(0.05)
            with guard:
                active["n"] -= 1

    with ThreadPoolExecutor(4) as ex:
        list(ex.map(lambda _: reader(), range(4)))
    assert peak["readers"] >= 2            # readers overlapped

    # a writer blocks while a reader holds the lock, then proceeds
    got_in = threading.Event()

    def writer():
        with lock.write():
            got_in.set()

    lock._acq_read()
    t = threading.Thread(target=writer)
    t.start()
    assert not got_in.wait(0.15)           # excluded by the reader
    lock._rel_read()
    assert got_in.wait(2.0)                # admitted after release
    t.join()


def test_serving_mixed_identify_enroll_storm(tmp_path):
    """Concurrent identifies during enrolls: every request succeeds and
    the final bank holds every enrolled speaker (the RW lock keeps
    reads off deleted donated buffers without serializing them)."""
    from concurrent.futures import ThreadPoolExecutor
    from tests.test_serving import SAMPLES, FakeEngine, _post, _serving_hparams
    from speakerverification_tpu.serving import make_serving_app

    rng = np.random.default_rng(11)
    h = _serving_hparams()
    h["serving"]["device_bank"] = True
    handler, batcher = make_serving_app(FakeEngine(tmp_path), h)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        seed = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
        status, out = _post(port, "/embed",
                            {"pcm": seed, "sample_rate": 8000})
        emb = np.asarray(out["embedding"], np.float32)
        np.save(tmp_path / "embeds.npy", emb[None, :])
        np.save(tmp_path / "classes.npy", {0: "seed"}, allow_pickle=True)

        pcms = [rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
                for _ in range(6)]

        def work(i):
            if i % 2 == 0:           # enroll
                return _post(port, "/enroll",
                             {"pcm": pcms[i // 2], "sample_rate": 8000,
                              "name": f"spk{i // 2}"})
            return _post(port, "/identify",
                         {"pcm": seed, "sample_rate": 8000})

        with ThreadPoolExecutor(6) as ex:
            results = list(ex.map(work, range(12)))
        assert all(st == 200 for st, _ in results), results
        # identifies of the seed audio must return SOME valid speaker
        for i, (st, out) in enumerate(results):
            if i % 2 == 1:
                assert out["speaker"] in (
                    {"seed"} | {f"spk{j}" for j in range(6)})
        classes = np.load(tmp_path / "classes.npy",
                          allow_pickle=True).item()
        assert len(classes) == 7
    finally:
        httpd.shutdown()
        batcher.close()


def test_serving_bank_devices_beyond_visible_fails_loudly(tmp_path):
    """An explicit bank_devices the host can't satisfy must 400 with a
    clear message, not silently build a smaller bank (the bank was
    sized for that many chips' HBM)."""
    from tests.test_serving import SAMPLES, FakeEngine, _post, _serving_hparams
    from speakerverification_tpu.serving import make_serving_app

    rng = np.random.default_rng(8)
    pcm = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()
    engine = FakeEngine(tmp_path)
    h = _serving_hparams()
    h["serving"]["device_bank"] = True
    h["serving"]["bank_devices"] = 9999
    handler, batcher = make_serving_app(engine, h)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        np.save(tmp_path / "embeds.npy", np.eye(3, 8, dtype=np.float32))
        np.save(tmp_path / "classes.npy", {0: "a", 1: "b", 2: "c"},
                allow_pickle=True)
        status, out = _post(port, "/identify",
                            {"pcm": pcm, "sample_rate": 8000})
        assert status == 400
        assert "bank_devices" in out.get("error", "")
    finally:
        httpd.shutdown()
        batcher.close()
