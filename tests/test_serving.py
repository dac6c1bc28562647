"""Serving daemon: dynamic batcher + HTTP endpoints (serving.py).

The default tier exercises the full HTTP path against a fake extractor
(no jit, no compile); the slow tier runs the real InferenceEngine
end-to-end through the server.
"""

import http.client
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

from speakerverification_tpu.serving import DynamicBatcher, make_serving_app

NUM_EVAL = 3
SAMPLES = 400


class FakeEmbed:
    """Deterministic 'extractor': row i -> normalized f(first samples)."""

    def __init__(self, dim=8):
        self.dim = dim
        self.calls = []
        self.lock = threading.Lock()

    def __call__(self, waves):
        with self.lock:
            self.calls.append(np.asarray(waves).shape)
            self.last_input = np.asarray(waves).copy()
        w = np.asarray(waves)
        if w.dtype == np.int16:
            # serving int16 wire contract: embed_fn dequantizes
            # (make_eval_embed_fn does this inside its jitted program)
            w = w.astype(np.float32) * (1.0 / 32768.0)
        w = w.astype(np.float32)
        # embedding from the first dim samples; deterministic per row
        emb = w[:, :self.dim] + 0.01
        return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def _crops(seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(NUM_EVAL, SAMPLES)).astype(np.float32)


def test_batcher_coalesces_into_fixed_shape_batches():
    fake = FakeEmbed()
    b = DynamicBatcher(fake, batch_utts=4, num_eval=NUM_EVAL,
                       samples=SAMPLES, max_wait_ms=200)
    try:
        crops = [_crops(i) for i in range(7)]
        with ThreadPoolExecutor(8) as ex:
            futs = list(ex.map(lambda c: b.submit(c), crops))
        results = [f.result(timeout=10) for f in futs]
        # every call was the same static shape (one-compile rule)
        assert set(fake.calls) == {(4 * NUM_EVAL, SAMPLES)}
        # 7 utts over batch 4 -> exactly 2 device calls once coalesced
        assert len(fake.calls) == 2
        # each result maps to ITS OWN request, crop-wise
        for c, r in zip(crops, results):
            expect = np.asarray(fake(c))
            np.testing.assert_allclose(r, expect, rtol=1e-6)
    finally:
        b.close()


def test_batcher_flushes_single_request_after_max_wait():
    fake = FakeEmbed()
    b = DynamicBatcher(fake, batch_utts=8, num_eval=NUM_EVAL,
                       samples=SAMPLES, max_wait_ms=10)
    try:
        t0 = time.monotonic()
        r = b.submit(_crops(0)).result(timeout=10)
        assert time.monotonic() - t0 < 5
        assert r.shape == (NUM_EVAL, 8)
        assert fake.calls == [(8 * NUM_EVAL, SAMPLES)]   # padded, not waited
    finally:
        b.close()


def test_batcher_rejects_bad_shapes_and_propagates_errors():
    fake = FakeEmbed()
    b = DynamicBatcher(fake, batch_utts=2, num_eval=NUM_EVAL,
                       samples=SAMPLES, max_wait_ms=5)
    try:
        with pytest.raises(ValueError):
            b.submit(np.zeros((NUM_EVAL + 1, SAMPLES), np.float32))

        def boom(w):
            raise RuntimeError("device on fire")

        bb = DynamicBatcher(boom, batch_utts=2, num_eval=NUM_EVAL,
                            samples=SAMPLES, max_wait_ms=5)
        try:
            with pytest.raises(RuntimeError, match="device on fire"):
                bb.submit(_crops(0)).result(timeout=10)
        finally:
            bb.close()
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit(_crops(1))          # closed


# ----------------------------------------------------------------------
class FakeEngine:
    def __init__(self, model_dir: Path, dim=8):
        self.embed_fn = FakeEmbed(dim)
        self.dirs = {"model": model_dir}


def _serving_hparams(sr=8000, sentence_len=SAMPLES / 8000,
                     transport="float32"):
    # float32 transport here so the fake-extractor expectations stay
    # bit-exact; the int16 wire default is covered by its own tests
    return {
        "model": {"name": "FAKE"},
        "num_eval": NUM_EVAL,
        "audio_spec": {"sample_rate": sr, "sentence_len": sentence_len},
        "serving": {"batch_utts": 2, "max_wait_ms": 5,
                    "transport": transport},
    }


@pytest.fixture()
def http_app(tmp_path):
    engine = FakeEngine(tmp_path)
    handler, batcher = make_serving_app(engine, _serving_hparams())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1], engine, tmp_path
    httpd.shutdown()
    batcher.close()


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, json.dumps(obj),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_http_embed_score_identify_and_health(http_app, tmp_path):
    port, engine, model_dir = http_app
    rng = np.random.default_rng(3)
    pcm = rng.normal(size=2 * SAMPLES).astype(np.float32).tolist()

    status, out = _post(port, "/embed", {"pcm": pcm, "sample_rate": 8000})
    assert status == 200 and out["dim"] == 8
    emb = np.asarray(out["embedding"])
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)

    # reference trial semantics: mean |cos| over ALL num_eval x num_eval
    # crop pairs — for identical audio the crops still differ, so compute
    # the exact expected value through the same decode + fake extractor
    from speakerverification_tpu.data.audio import load_wav
    crops = load_wav(np.asarray(pcm, np.float32),
                     _serving_hparams()["audio_spec"],
                     evalmode=True, num_eval=NUM_EVAL)
    e = np.asarray(engine.embed_fn(crops))
    expected = float(np.mean(np.abs(e @ e.T)))
    status, out = _post(port, "/score", {
        "enroll": {"pcm": pcm, "sample_rate": 8000},
        "test": {"pcm": pcm, "sample_rate": 8000}})
    assert status == 200
    assert out["score"] == pytest.approx(expected, abs=1e-5)

    # identification against a 2-speaker bank where spk1 IS the query
    np.save(model_dir / "embeds.npy",
            np.stack([np.roll(emb, 1), emb]))
    np.save(model_dir / "classes.npy", {0: "spk0", 1: "spk1"},
            allow_pickle=True)
    status, out = _post(port, "/identify", {"pcm": pcm,
                                            "sample_rate": 8000})
    assert status == 200 and out["speaker"] == "spk1"
    assert out["score"] == pytest.approx(1.0, abs=1e-4)

    # health reflects traffic
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    health = json.loads(resp.read())
    conn.close()
    assert resp.status == 200 and health["status"] == "ok"
    assert health["utts_served"] >= 4


def test_http_error_paths(http_app):
    port, _, _ = http_app
    status, out = _post(port, "/embed", {"pcm": []})
    assert status == 400 and "pcm" in out["error"]
    status, out = _post(port, "/embed",
                        {"pcm": [0.0] * 100, "sample_rate": 44100})
    assert status == 400 and "sample_rate" in out["error"]
    status, out = _post(port, "/embed", {})
    assert status == 400
    status, out = _post(port, "/identify", {"pcm": [0.1] * 100})
    assert status == 400 and "embeds.npy" in out["error"]
    status, out = _post(port, "/nope", {})
    assert status == 404


def test_batcher_int16_transport_wire_format():
    """transport='int16' puts exactly-quantized 16-bit PCM on the wire:
    round(x*32768) clipped to the int16 range (serving.py _run)."""
    fake = FakeEmbed()
    b = DynamicBatcher(fake, batch_utts=1, num_eval=NUM_EVAL,
                       samples=SAMPLES, max_wait_ms=5, transport="int16")
    try:
        crops = np.clip(_crops(0), -1.5, 1.5)     # includes out-of-range
        b.submit(crops).result(timeout=10)
        assert len(fake.calls) == 1
        wire = fake.last_input
        assert wire.dtype == np.int16
        expect = np.clip(np.round(crops * 32768.0), -32768, 32767)
        np.testing.assert_array_equal(wire, expect.astype(np.int16))
    finally:
        b.close()
    with pytest.raises(ValueError, match="transport"):
        DynamicBatcher(fake, 1, NUM_EVAL, SAMPLES, transport="int8")


def test_int16_transport_app_matches_float_path(tmp_path):
    """The default int16 wire + on-device dequant must reproduce the
    float32-transport embedding to quantization precision (<=0.5/32768
    per sample into a scale-invariant extractor)."""
    rng = np.random.default_rng(7)
    pcm = (0.5 * rng.normal(size=2 * SAMPLES)).astype(np.float32).tolist()

    embs = {}
    for transport in ("float32", "int16"):
        engine = FakeEngine(tmp_path)
        handler, batcher = make_serving_app(
            engine, _serving_hparams(transport=transport))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            port = httpd.server_address[1]
            status, out = _post(port, "/embed",
                                {"pcm": pcm, "sample_rate": 8000})
            assert status == 200
            embs[transport] = np.asarray(out["embedding"])
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            assert json.loads(resp.read())["transport"] == transport
            conn.close()
        finally:
            httpd.shutdown()
            batcher.close()
    np.testing.assert_allclose(embs["int16"], embs["float32"], atol=1e-3)


def test_eval_embed_fn_dequantizes_int16_in_program():
    """make_eval_embed_fn's jitted program dtype-specializes on int16
    and fuses the dequant (wave/32768) in-program — the serving wire
    contract (serving.py transport=int16). int16 and float32 calls must
    agree exactly (the quantized grid is exactly representable)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from speakerverification_tpu.training.train_step import (
        make_eval_embed_fn,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, w):
            return nn.Dense(4)(w[:, :16])

    model = Tiny()
    wave_f = np.round(np.random.default_rng(0).normal(
        size=(3, 64)) * 8192) / 32768.0          # exact int16 grid
    wave_f = wave_f.astype(np.float32)
    wave_i = (wave_f * 32768.0).astype(np.int16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((3, 64), jnp.float32))
    embed = make_eval_embed_fn(model, normalize=True)
    out_f = np.asarray(embed(variables["params"], {}, wave_f))
    out_i = np.asarray(embed(variables["params"], {}, wave_i))
    np.testing.assert_array_equal(out_f, out_i)


# ----------------------------------------------------------------------
@pytest.mark.slow
def test_serving_real_engine_end_to_end(tmp_path):
    """Full path: InferenceEngine -> batcher -> HTTP, real jitted model."""
    from speakerverification_tpu.data import write_wav
    from speakerverification_tpu.inference import InferenceEngine

    sr = 8000
    h = {
        "output_folder": str(tmp_path / "run"),
        "save_folder": str(tmp_path / "run/save"),
        "seed": 0,
        "nClasses": 4,
        "num_eval": 2,
        "audio_spec": {"sample_rate": sr, "channels": 1,
                       "sentence_len": 0.5,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 40,
        "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "feature_type": "melspectrogram",
                  "nOut": 16, "channels": [16, 16, 16, 16, 48],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1],
                  "attention_channels": 4, "res2net_scale": 2,
                  "se_channels": 4},
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "serving": {"batch_utts": 2, "max_wait_ms": 5},
    }
    engine = InferenceEngine(h)

    from speakerverification_tpu.serving import make_serving_app
    handler, batcher = make_serving_app(engine, h)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        t = np.arange(sr) / sr
        wav = tmp_path / "q.wav"
        write_wav(wav, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                  sr)
        status, out = _post(port, "/embed", {"path": str(wav)})
        assert status == 200 and out["dim"] == 16
        status, out = _post(port, "/score", {"enroll": {"path": str(wav)},
                                             "test": {"path": str(wav)}})
        assert status == 200 and out["score"] == pytest.approx(1.0, abs=1e-4)
    finally:
        httpd.shutdown()
        batcher.close()
