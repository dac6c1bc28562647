"""Serving latency/throughput bench for the dynamic-batching daemon.

Drives the REAL stack end-to-end — HTTP request -> JSON decode ->
load_wav eval crops -> DynamicBatcher coalescing -> one fixed-shape
jitted device call -> crop-mean embedding -> JSON reply — with a
closed-loop load generator at several concurrency levels, and reports
per-request latency percentiles, sustained throughput, and the
coalescing ratio (utterances per device dispatch).

Beyond-reference capability (the reference has no serving path at all,
src/model.py:783-792 is a bare helper), so there is no baseline to
beat; the numbers go to PARITY.md as the serving SLO record. Kept out
of ``bench.py`` so the driver's round-end run stays bounded.

Usage::

    python bench_serving.py                  # flagship model, real backend
    python bench_serving.py --fake           # batcher/HTTP overhead only
    python bench_serving.py --levels 1 8 32 --requests 200
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import tempfile
import threading
import time
import wave as wavemod
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np

SR = 8000
SECONDS = 2.0          # audio_spec.sentence_len (default yamls)
NUM_EVAL = 10          # reference eval protocol (src/dataloader.py:138)


def _log(msg: str) -> None:
    print(f"[bench_serving] {msg}", file=sys.stderr, flush=True)


def _write_wav(path: Path, seconds: float, seed: int) -> None:
    rng = np.random.default_rng(seed)
    pcm = (rng.normal(0, 0.1, int(seconds * SR)) * 32767 * 0.3)
    pcm = np.clip(pcm, -32768, 32767).astype("<i2")
    with wavemod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


class _Engine:
    """Minimal InferenceEngine stand-in: make_serving_app only touches
    ``embed_fn`` and ``dirs['model']`` (speakerverification_tpu/serving.py)."""

    def __init__(self, embed_fn, model_dir: Path):
        self.embed_fn = embed_fn
        self.dirs = {"model": model_dir}


def _real_embed_fn(batch_utts: int, transport: str = "int16"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship
    from speakerverification_tpu.training.train_step import make_eval_embed_fn

    on_tpu = jax.default_backend() != "cpu"
    model = _flagship(frontend_backend="auto" if on_tpu else "xla")
    model = model.clone(compute_dtype=jnp.bfloat16)
    T = int(SECONDS * SR)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, T)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    embed = make_eval_embed_fn(model, normalize=True,
                               compute_dtype=jnp.bfloat16)
    shape = (batch_utts * NUM_EVAL, T)
    wire_dtype = jnp.int16 if transport == "int16" else jnp.float32
    _log(f"compiling extraction program {shape} {wire_dtype.__name__} "
         f"({jax.default_backend()} backend)")
    # the int16 wire format compiles its own dtype-specialized program
    # with the dequant fused in (make_eval_embed_fn)
    compiled = embed.lower(params, batch_stats,
                           jnp.zeros(shape, wire_dtype)).compile()

    def fn(waves):
        return compiled(params, batch_stats, jnp.asarray(waves))

    return fn


def _fake_embed_fn(dim: int = 192):
    def fn(waves):
        w = np.asarray(waves)
        if w.dtype == np.int16:   # serving int16 wire contract
            w = w.astype(np.float32) * (1.0 / 32768.0)
        w = w.astype(np.float32)[:, :dim] + 0.01
        return w / np.linalg.norm(w, axis=1, keepdims=True)
    return fn


def _run_level(port: int, wav_paths, concurrency: int, n_requests: int,
               deadline_s: float):
    """Closed loop: `concurrency` clients, each fires its next request
    the moment the previous reply lands. Returns (latencies_s, wall_s)."""
    lat, lock = [], threading.Lock()
    stop = time.monotonic() + deadline_s
    it = iter(range(n_requests))

    def client(cid: int):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        body_cache = {}
        while time.monotonic() < stop:
            with lock:
                try:
                    i = next(it)
                except StopIteration:
                    break
            p = wav_paths[i % len(wav_paths)]
            body = body_cache.setdefault(p, json.dumps({"path": str(p)}))
            t0 = time.monotonic()
            conn.request("POST", "/embed", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            payload = json.loads(resp.read())
            dt = time.monotonic() - t0
            assert resp.status == 200, payload
            with lock:
                lat.append(dt)
        conn.close()

    t0 = time.monotonic()
    with ThreadPoolExecutor(concurrency) as ex:
        list(ex.map(client, range(concurrency)))
    return lat, time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake", action="store_true",
                    help="numpy extractor: batcher/HTTP overhead only")
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--requests", type=int, default=200,
                    help="requests per concurrency level")
    ap.add_argument("--batch_utts", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--transport", choices=["int16", "float32"],
                    default="int16")
    ap.add_argument("--deadline_s", type=float, default=120.0,
                    help="hard cap per level")
    args = ap.parse_args()

    from speakerverification_tpu.serving import make_serving_app

    tmp = Path(tempfile.mkdtemp(prefix="svtpu_serve_bench_"))
    wavs = []
    for i in range(16):
        p = tmp / f"utt{i}.wav"
        _write_wav(p, SECONDS + 1.0, seed=i)     # longer than crop window
        wavs.append(p)

    embed_fn = (_fake_embed_fn() if args.fake
                else _real_embed_fn(args.batch_utts, args.transport))
    hparams = {
        "model": {"name": "ECAPA_TDNN" if not args.fake else "FAKE"},
        "num_eval": NUM_EVAL,
        "audio_spec": {"sample_rate": SR, "sentence_len": SECONDS},
        "serving": {"batch_utts": args.batch_utts,
                    "max_wait_ms": args.max_wait_ms,
                    "transport": args.transport},
    }
    handler, batcher = make_serving_app(_Engine(embed_fn, tmp), hparams)
    # warm: full-shape batch through the batcher (compile + first dispatch)
    warm = np.zeros((NUM_EVAL, int(SECONDS * SR)), np.float32)
    batcher.submit(warm).result(timeout=600)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    _log(f"server up on :{port} (batch_utts={args.batch_utts}, "
         f"max_wait={args.max_wait_ms}ms, transport={args.transport}, "
         f"fake={args.fake})")

    results = []
    try:
        for c in args.levels:
            b0, u0 = batcher.batches_run, batcher.utts_served
            lat, wall = _run_level(port, wavs, c, args.requests,
                                   args.deadline_s)
            db, du = batcher.batches_run - b0, batcher.utts_served - u0
            lat_ms = np.sort(np.asarray(lat)) * 1e3
            results.append({
                "concurrency": c,
                "requests": len(lat),
                "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
                "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
                "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
                "throughput_rps": round(len(lat) / wall, 2),
                "utts_per_dispatch": round(du / max(db, 1), 2),
            })
            _log(f"c={c}: {results[-1]}")
    finally:
        httpd.shutdown()
        batcher.close()

    print(json.dumps({
        "metric": "serving /embed closed-loop latency (dynamic batcher)",
        "unit": "ms", "backend": "fake" if args.fake else "real",
        "batch_utts": args.batch_utts, "max_wait_ms": args.max_wait_ms,
        "transport": args.transport, "num_eval": NUM_EVAL,
        "levels": results,
    }))


if __name__ == "__main__":
    main()
