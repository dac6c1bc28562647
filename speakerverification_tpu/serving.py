"""Production serving: a dynamic-batching embedding/scoring HTTP daemon.

Beyond-reference capability. The reference's closest analogue is the
bare ``onnx_inference`` helper (src/model.py:783-792) — there is no
server, no batching, no request path. On TPU the per-dispatch overhead
dominates batch-1 latency (PARITY.md measures ~3.65 ms host round-trip
per dispatch on the bench chip), so a serving layer MUST coalesce
concurrent requests into one device program call. This module does
exactly that:

- :class:`DynamicBatcher` — concurrent requests enqueue ``[num_eval, T]``
  crop stacks; a dispatcher thread coalesces up to ``batch_utts``
  utterances (or flushes after ``max_wait_ms``) into ONE fixed-shape
  ``[batch_utts * num_eval, T]`` device batch. The shape never changes,
  so the extraction program compiles exactly once (XLA static-shape
  rule) and short batches are padded, not recompiled. By default the
  batch crosses the host->device link as 16-bit PCM (``serving:
  {transport: int16}``; ``float32`` opts out) and is dequantized on
  device — half the bytes on the dominant wire, with quantization
  error an order below the bf16 compute precision.
- :class:`ServingHandler` / :func:`serve` — a dependency-free
  ``ThreadingHTTPServer`` exposing::

      GET  /healthz            -> {"status": "ok", model, dim, ...}
      POST /embed              -> {"embedding": [D floats], "dim": D}
      POST /score              -> {"score": s}   (reference cosine
                                  semantics: mean |cos| over all
                                  num_eval x num_eval crop pairs,
                                  src/utils.py:163-164)
      POST /identify           -> {"speaker": name, "score": s}
                                  (nearest enrolled speaker over the
                                  prepare-type=embed banks,
                                  src/inference.py:254-327 semantics)

  Audio is supplied per request as ``{"path": server-local file}`` or
  ``{"pcm": [...], "sample_rate": N}``; ``/score`` takes ``enroll`` and
  ``test`` objects of the same shape.

The utterance embedding returned by ``/embed`` is the re-normalized
mean of the per-crop embeddings — the same pooling the reference uses
for its cohort/enrollment banks (src/model.py:578-609), so served
embeddings are directly comparable to ``--prepare`` artifacts.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Mapping, Optional

import numpy as np

from speakerverification_tpu.evaluation.bank import (
    AUTO_DEVICE_BANK_MIN_ROWS,
    ShardedSpeakerBank,
    SpeakerBank,
)

__all__ = ["DynamicBatcher", "serve", "make_serving_app"]


class _RWLock:
    """Readers-writer lock for the serving banks: identify requests
    (readers) proceed concurrently; enroll/unenroll/load (writers, which
    donate the device bank buffer and swap host arrays in place) get
    exclusive access. Classic first-reader-locks scheme; writers can
    starve under saturating read load, which is the right trade for a
    read-dominated identification service."""

    def __init__(self):
        self._counter = threading.Lock()
        self._exclusive = threading.Lock()
        self._readers = 0

    class _Ctx:
        def __init__(self, acq, rel):
            self._acq, self._rel = acq, rel

        def __enter__(self):
            self._acq()

        def __exit__(self, *exc):
            self._rel()

    def _acq_read(self):
        with self._counter:
            self._readers += 1
            if self._readers == 1:
                self._exclusive.acquire()

    def _rel_read(self):
        with self._counter:
            self._readers -= 1
            if self._readers == 0:
                self._exclusive.release()

    def read(self):
        return self._Ctx(self._acq_read, self._rel_read)

    def write(self):
        return self._Ctx(self._exclusive.acquire, self._exclusive.release)


class DynamicBatcher:
    """Coalesce concurrent embedding requests into fixed-shape batches.

    ``embed`` maps ``[N, T] float32 -> [N, D]`` (the jitted extractor
    from ``make_eval_embed_fn``; N = batch_utts * num_eval is constant
    across calls). ``submit`` is thread-safe and returns a Future
    resolving to the ``[num_eval, D]`` crop embeddings of that request.
    """

    def __init__(self, embed: Callable, batch_utts: int, num_eval: int,
                 samples: int, max_wait_ms: float = 5.0,
                 transport: str = "float32"):
        if batch_utts < 1:
            raise ValueError("batch_utts must be >= 1")
        if transport not in ("float32", "int16"):
            raise ValueError(f"transport must be float32|int16, "
                             f"got {transport!r}")
        self.embed = embed
        self.batch_utts = int(batch_utts)
        self.num_eval = int(num_eval)
        self.samples = int(samples)
        self.transport = transport
        self.max_wait = float(max_wait_ms) / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self.batches_run = 0          # observability: coalescing ratio
        self.utts_served = 0
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="svtpu-batcher")
        self._thread.start()

    def submit(self, crops: np.ndarray) -> Future:
        crops = np.asarray(crops, np.float32)
        if crops.shape != (self.num_eval, self.samples):
            raise ValueError(
                f"crops shape {crops.shape} != "
                f"({self.num_eval}, {self.samples})")
        if self._closed:
            raise RuntimeError("batcher is closed")
        if self.transport == "int16":
            # wire format: 16-bit PCM. Crops are 1/32768-scaled
            # (data/wavio.py decode convention), so this exactly
            # recovers the source samples for 16-bit audio and
            # quantizes others at <=0.5/32768 — an order below the
            # bf16 compute precision — while HALVING host->device
            # bytes per dispatch (the serving hot wire). Quantizing
            # HERE runs on the caller's (HTTP handler) thread, in
            # parallel across requests, off the dispatcher's serial
            # hot loop.
            crops = np.clip(np.round(crops * 32768.0),
                            -32768, 32767).astype(np.int16)
        fut: Future = Future()
        self._q.put((crops, fut))
        return fut

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join(timeout=10)

    # ------------------------------------------------------------------
    def _worker(self) -> None:
        import time
        while True:
            head = self._q.get()
            if head is None:
                return
            batch = [head]
            deadline = time.monotonic() + self.max_wait
            # coalesce: wait up to max_wait for more requests, flush
            # early once the batch is full
            while len(batch) < self.batch_utts:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._run(batch)
                    return
                batch.append(item)
            self._run(batch)

    def _run(self, batch) -> None:
        n = len(batch)
        try:
            # crops arrive already in wire dtype (submit quantized them)
            dtype = np.int16 if self.transport == "int16" else np.float32
            waves = np.empty((self.batch_utts * self.num_eval, self.samples),
                             dtype)
            for i, (crops, _) in enumerate(batch):
                waves[i * self.num_eval:(i + 1) * self.num_eval] = crops
            if n < self.batch_utts:
                # pad slots repeat request 0's crops: the shape stays
                # static (no recompile) and the rows are numerically
                # benign; padded outputs are sliced away below
                waves[n * self.num_eval:] = np.tile(
                    batch[0][0], (self.batch_utts - n, 1))
            emb = np.asarray(self.embed(waves), np.float32)
            emb = emb.reshape(self.batch_utts, self.num_eval, -1)
            self.batches_run += 1
            self.utts_served += n
            for i, (_, fut) in enumerate(batch):
                fut.set_result(emb[i])
        except Exception as exc:                    # pragma: no cover
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)


# ----------------------------------------------------------------------
def _decode_audio_spec(obj: Mapping, spec: Mapping,
                       num_eval: int) -> np.ndarray:
    """Request audio object -> [num_eval, T] eval crops."""
    from speakerverification_tpu.data.audio import AudioSpec, load_wav
    aspec = AudioSpec(spec)
    if "path" in obj:
        return load_wav(str(obj["path"]), spec, evalmode=True,
                        num_eval=num_eval)
    if "pcm" in obj:
        sr = int(obj.get("sample_rate", aspec.sample_rate))
        if sr != aspec.sample_rate:
            raise ValueError(
                f"pcm sample_rate {sr} != configured {aspec.sample_rate} "
                "(resample client-side)")
        pcm = np.asarray(obj["pcm"], np.float32)
        if pcm.ndim != 1 or pcm.size == 0:
            raise ValueError("pcm must be a non-empty 1-D sample list")
        return load_wav(pcm, spec, evalmode=True, num_eval=num_eval)
    raise ValueError("audio object needs 'path' or 'pcm'")


def _pair_cosine(e1: np.ndarray, e2: np.ndarray) -> float:
    """Reference cosine trial score: mean |cos| over all crop pairs
    (src/utils.py:163-164; crop embeddings arrive L2-normalized when the
    head's test_normalize is set, matching the eval path)."""
    return float(np.mean(np.abs(e1 @ e2.T)))


def _utt_embedding(crop_emb: np.ndarray) -> np.ndarray:
    """Re-normalized crop mean (bank pooling, src/model.py:578-609)."""
    mean = crop_emb.mean(axis=0)
    return mean / max(float(np.linalg.norm(mean)), 1e-12)


def make_serving_app(engine, hparams: Mapping,
                     batch_utts: Optional[int] = None,
                     max_wait_ms: Optional[float] = None):
    """Build (handler_class, batcher) around an ``InferenceEngine``.

    Split from :func:`serve` so tests can mount the handler on an
    ephemeral port without going through the CLI.
    """
    h = dict(hparams)
    serving = dict(h.get("serving") or {})
    num_eval = int(h.get("num_eval", 10))
    if num_eval == 0:
        raise ValueError("serving requires num_eval >= 1 (fixed shapes)")
    spec = h.get("audio_spec", {})
    samples = int(float(spec.get("sentence_len", 2.0))
                  * int(spec.get("sample_rate", 8000)))
    batch_utts = int(batch_utts if batch_utts is not None
                     else serving.get("batch_utts", 8))
    max_wait_ms = float(max_wait_ms if max_wait_ms is not None
                        else serving.get("max_wait_ms", 5.0))
    transport = str(serving.get("transport", "int16"))
    # transport='int16' puts 16-bit PCM on the host->device wire (half
    # the float32 bytes on the dominant serving byte stream); the
    # engine's embed_fn dequantizes INSIDE its compiled program
    # (make_eval_embed_fn / make_int8_embed_fn dtype-specialize on
    # int16), so the cast+scale fuses into the frontend's first op —
    # no eager device round-trip on the request path.
    batcher = DynamicBatcher(engine.embed_fn, batch_utts, num_eval,
                             samples, max_wait_ms, transport=transport)

    # optional identification banks (prepare_type='embed' artifacts);
    # serving.device_bank: true/false/'auto' (auto = device GEMM once the
    # bank reaches AUTO_DEVICE_BANK_MIN_ROWS — a host scan over millions
    # of speakers per request would dominate the latency budget)
    device_bank_cfg = serving.get("device_bank", "auto")
    # serving.bank_devices: row-shard the bank across this many local
    # chips (ShardedSpeakerBank) — aggregate HBM capacity for banks past
    # one chip; 1 (default) keeps the single-device bank
    bank_devices_cfg = int(serving.get("bank_devices", 1))
    banks = {"embeds": None, "classes": None, "device": None}
    # ThreadingHTTPServer serves each request on its own thread; without
    # a lock a second /identify landing mid-construction would see a
    # half-initialized dict (embeds set, device bank still building) and
    # silently fall back to a host scan over the full bank. Reads
    # (identify) share; writes (load/enroll/unenroll, which donate the
    # device buffer and swap host arrays in place) are exclusive — so
    # identify traffic is never serialized by other identifies, only
    # paused by the rare mutation.
    banks_lock = _RWLock()

    def _build_device_bank(embeds, classes):
        import jax
        ndev = bank_devices_cfg
        if ndev > len(jax.devices()):
            # an explicit capacity request must not silently shrink:
            # the bank was sized for ndev chips' HBM
            raise ValueError(
                f"serving.bank_devices={ndev} but only "
                f"{len(jax.devices())} device(s) visible")
        if ndev > 1:
            from jax.sharding import Mesh
            mesh = Mesh(np.array(jax.devices()[:ndev]), ("bank",))
            return ShardedSpeakerBank(embeds, classes, mesh=mesh)
        return SpeakerBank(embeds, classes)

    def _load_banks():
        # double-checked fast path: banks["embeds"] is assigned LAST
        # under the write lock, so a non-None read here proves init
        # completed — steady-state identifies never touch the write
        # lock (which would serialize them behind in-flight readers)
        if banks["embeds"] is not None:
            return banks["embeds"], banks["classes"], banks["device"]
        with banks_lock.write():
            if banks["embeds"] is None:
                mdir = engine.dirs["model"]
                epath, cpath = mdir / "embeds.npy", mdir / "classes.npy"
                if not (epath.exists() and cpath.exists()):
                    raise FileNotFoundError(
                        "identification needs embeds.npy/classes.npy — run "
                        "--do_infer --prepare with prepare: embed first")
                embeds = np.load(epath)
                classes = np.load(cpath, allow_pickle=True).item()
                use_dev = (len(embeds) >= AUTO_DEVICE_BANK_MIN_ROWS
                           if device_bank_cfg == "auto"
                           else bool(device_bank_cfg))
                if use_dev:
                    banks["device"] = _build_device_bank(embeds, classes)
                banks["classes"] = classes
                banks["embeds"] = embeds     # last: marks init complete
        return banks["embeds"], banks["classes"], banks["device"]

    # serving.persist_enroll (default true): rewrite the --prepare
    # artifacts after each /enroll//unenroll. The rewrite is O(bank) disk
    # I/O under banks_lock — fine up to ~100k speakers; for multi-GB
    # banks disable it and persist out-of-band
    persist_enroll = bool(serving.get("persist_enroll", True))

    def _persist_banks():
        """Write the --prepare artifacts atomically (tmp + rename) so a
        crash mid-save never truncates the enrollment bank. Both tmp
        files are fully written BEFORE the two back-to-back renames —
        the slow, failure-prone phase (serializing a possibly-large
        array) cannot leave embeds.npy and classes.npy from different
        generations, which would silently misidentify after a restart.
        Caller holds banks_lock."""
        if not persist_enroll:
            return
        mdir = engine.dirs["model"]
        pairs = []
        for fname, arr in (("embeds.npy", banks["embeds"]),
                           ("classes.npy", banks["classes"])):
            tmp = mdir / fname.replace(".npy", ".tmp.npy")
            np.save(tmp, arr, allow_pickle=True)
            pairs.append((tmp, mdir / fname))
        for tmp, dst in pairs:
            os.replace(tmp, dst)

    model_name = (h.get("model") or {}).get("name", "?")

    class ServingHandler(BaseHTTPRequestHandler):
        server_version = "svtpu-serving/1.0"
        protocol_version = "HTTP/1.1"
        # socket timeout: keep-alive handlers otherwise block forever in
        # rfile.readline(), and the drain-on-shutdown join
        # (daemon_threads=False + server_close) would hang on one idle
        # persistent connection; on timeout handle_one_request closes
        # the connection and the thread exits
        timeout = 30
        # TCP_NODELAY: headers and body go out in separate writes;
        # with Nagle on, the body write stalls behind the client's
        # delayed ACK (~40 ms quantum) — measured loopback /embed p50
        # dropped 60 ms -> 10 ms when disabled (fake extractor)
        disable_nagle_algorithm = True

        def log_message(self, fmt, *args):          # quiet by default
            if serving.get("access_log"):
                super().log_message(fmt, *args)

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok", "model": model_name,
                    "num_eval": num_eval, "samples": samples,
                    "batch_utts": batch_utts,
                    "transport": transport,
                    "batches_run": batcher.batches_run,
                    "utts_served": batcher.utts_served,
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                obj = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as exc:
                return self._reply(400, {"error": f"bad JSON: {exc}"})
            try:
                if self.path == "/embed":
                    crops = _decode_audio_spec(obj, spec, num_eval)
                    emb = batcher.submit(crops).result()
                    utt = _utt_embedding(emb)
                    return self._reply(200, {
                        "embedding": [float(x) for x in utt],
                        "dim": int(utt.shape[0])})
                if self.path == "/score":
                    futs = [batcher.submit(
                        _decode_audio_spec(obj[k], spec, num_eval))
                        for k in ("enroll", "test")]
                    e1, e2 = (f.result() for f in futs)
                    return self._reply(200, {"score": _pair_cosine(e1, e2)})
                if self.path == "/identify":
                    # validate BEFORE the embedding dispatch: a bad k
                    # must not consume a batcher slot or device work
                    k = int(obj.get("k", 1))
                    if not 1 <= k <= 100:
                        raise ValueError("k must be in [1, 100]")
                    crops = _decode_audio_spec(obj, spec, num_eval)
                    utt = _utt_embedding(batcher.submit(crops).result())
                    _load_banks()
                    # a read lock covers the bank READ too: /enroll's
                    # donated scatter deletes the device array a
                    # concurrent identify would otherwise dispatch on,
                    # and /unenroll swaps the host arrays in place —
                    # but identifies run concurrently with each other
                    # the device lookup compiles one program per k
                    # (lru_cache'd): bucket client k to a tiny grid so
                    # arbitrary values can't trace+compile under the
                    # read lock or thrash the program cache; results
                    # trim back to the requested k
                    k_eff = next(b for b in (1, 5, 10, 50, 100)
                                 if k <= b)
                    with banks_lock.read():
                        embeds, classes = banks["embeds"], banks["classes"]
                        dev_bank = banks["device"]
                        if len(embeds) == 0:
                            raise ValueError("no speakers enrolled")
                        # nearest enrolled speaker by mean pairwise
                        # distance, score = 1 - d^2/2
                        # (src/inference.py:254-327); on normalized
                        # vectors that equals the cosine the device bank
                        # ranks by (evaluation/bank.py)
                        if dev_bank is not None:
                            s, i = dev_bank.identify(utt, k=k_eff)
                            cand = [(str(dev_bank.name(int(ii))),
                                     float(ss))
                                    for ss, ii in zip(s[0][:k], i[0][:k])]
                        else:
                            d = np.linalg.norm(embeds - utt[None, :],
                                               axis=1)
                            kk = min(k, len(d))
                            # argpartition keeps the host path O(N) for
                            # any k (argsort would full-sort the bank)
                            part = np.argpartition(d, kk - 1)[:kk]
                            order = part[np.argsort(d[part])]
                            cand = [(str(classes[int(b)]),
                                     float(1.0 - d[b] ** 2 / 2.0))
                                    for b in order]
                    payload = {"speaker": cand[0][0],
                               "score": cand[0][1]}
                    if k > 1:
                        payload["candidates"] = [
                            {"speaker": nm, "score": sc}
                            for nm, sc in cand]
                    return self._reply(200, payload)
                if self.path == "/enroll":
                    # live enrollment: {"name": ..., "pcm"/"path": ...}
                    # embeds the utterance and appends it to the serving
                    # bank in place (SpeakerBank.add: donated scatter, no
                    # recompile) + persists the --prepare artifacts so a
                    # restart sees the new speaker
                    name = obj.get("name")
                    if not isinstance(name, str) or not name:
                        raise ValueError("/enroll needs a 'name' string")
                    crops = _decode_audio_spec(obj, spec, num_eval)
                    utt = _utt_embedding(batcher.submit(crops).result())
                    _load_banks()
                    with banks_lock.write():
                        new_idx = len(banks["embeds"])
                        if banks["device"] is not None:
                            # device first: if the scatter/growth fails
                            # the host mirror is untouched and the two
                            # stay consistent (add also inserts the label
                            # into the SHARED classes dict)
                            banks["device"].add(utt, [name])
                        banks["classes"][new_idx] = name
                        banks["embeds"] = np.concatenate(
                            [banks["embeds"], utt[None, :]])
                        if (banks["device"] is None
                                and device_bank_cfg == "auto"
                                and len(banks["embeds"])
                                >= AUTO_DEVICE_BANK_MIN_ROWS):
                            # live growth crossed the auto threshold:
                            # promote to the device bank now rather than
                            # host-scanning until a restart
                            banks["device"] = _build_device_bank(
                                banks["embeds"], banks["classes"])
                        _persist_banks()
                    return self._reply(200, {
                        "speaker": name, "index": new_idx,
                        "enrolled": new_idx + 1})
                if self.path == "/unenroll":
                    # {"index": i} or {"name": ...} (name must be unique);
                    # swap-with-last removal mirrored on the host arrays,
                    # device bank, and persisted artifacts
                    _load_banks()
                    with banks_lock.write():
                        if "index" in obj:
                            idx = int(obj["index"])
                        else:
                            nm = obj.get("name")
                            hits = [i for i, v in banks["classes"].items()
                                    if v == nm]
                            if len(hits) != 1:
                                raise ValueError(
                                    f"name {nm!r} matches {len(hits)} "
                                    "speakers; pass 'index'")
                            idx = hits[0]
                        n = len(banks["embeds"])
                        if not 0 <= idx < n:
                            raise ValueError(f"index {idx} not in bank "
                                             f"of {n}")
                        removed = banks["classes"][idx]
                        last = n - 1
                        if banks["device"] is not None:
                            # the device bank's labels ARE banks['classes']
                            # (same dict, by construction in _load_banks /
                            # /enroll): remove() applies the swap-with-last
                            # label fix-up exactly once. The invariant is
                            # load-bearing — verify it instead of letting
                            # a future copy silently desynchronize the
                            # persisted artifacts from the device bank
                            if banks["device"]._labels is not \
                                    banks["classes"]:
                                raise RuntimeError(
                                    "device bank labels lost aliasing "
                                    "with serving classes (bug)")
                            banks["device"].remove(idx)
                        else:
                            if idx != last:
                                banks["classes"][idx] = \
                                    banks["classes"][last]
                            banks["classes"].pop(last, None)
                        if idx != last:
                            banks["embeds"][idx] = banks["embeds"][last]
                        banks["embeds"] = banks["embeds"][:last]
                        _persist_banks()
                    return self._reply(200, {
                        "speaker": str(removed), "enrolled": last})
                return self._reply(404, {"error": f"unknown path {self.path}"})
            except (KeyError, ValueError, TypeError,
                    FileNotFoundError) as exc:
                return self._reply(400, {"error": str(exc)})

    return ServingHandler, batcher


def serve(hparams: Mapping, host: str = "0.0.0.0",
          port: int = 8008) -> None:
    """Blocking server entry (CLI ``--do_serve``)."""
    from speakerverification_tpu.inference import InferenceEngine

    engine = InferenceEngine(hparams)
    handler, batcher = make_serving_app(engine, hparams)
    # warm the compile before accepting traffic: one request through the
    # batcher pads to the full batch shape AND exercises the transport
    # path (int16 dequant program included), so the first client never
    # pays a compile
    batcher.submit(np.zeros((batcher.num_eval, batcher.samples),
                            np.float32)).result(timeout=1200)
    httpd = ThreadingHTTPServer((host, port), handler)
    # drain on shutdown: non-daemon handler threads + server_close()
    # (ThreadingMixIn joins them via block_on_close) — otherwise
    # interpreter exit kills handlers mid-reply
    httpd.daemon_threads = False
    print(f"[INFO] serving {hparams.get('model', {}).get('name', '?')} "
          f"on {host}:{port} (batch_utts={batcher.batch_utts}, "
          f"max_wait={batcher.max_wait * 1000:.0f}ms)")
    # preemption-safe like the trainer (training/trainer.py SIGTERM
    # handling): the first SIGTERM/SIGINT stops the accept loop and
    # drains; original handlers are restored immediately so a SECOND
    # signal escalates (Ctrl-C Ctrl-C still kills a stuck drain)
    import signal as _signal
    old_handlers = {}

    def _graceful(signum, frame):
        for s, h in old_handlers.items():
            _signal.signal(s, h)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    for s in (_signal.SIGTERM, _signal.SIGINT):
        try:
            old_handlers[s] = _signal.signal(s, _graceful)
        except ValueError:                          # pragma: no cover
            pass                                    # non-main thread
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:                       # pragma: no cover
        pass
    finally:
        httpd.shutdown()
        httpd.server_close()      # join in-flight handler threads
        batcher.close()           # after handlers: no late submits
        print("[INFO] serving stopped cleanly")
