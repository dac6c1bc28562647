"""Million-speaker identification bench for the device SpeakerBank.

The reference's --predict path scans the enrolled bank on the host per
query (src/inference.py:254-327) — numpy [N,D] distance + argmin. The
device bank (evaluation/bank.py) does the same math as one MXU GEMM +
lax.top_k against an HBM-resident bank.

Methodology notes (tunneled v5e):
  * every query batch is a DISTINCT device array — the tunnel elides
    repeated identical dispatches (measured 7 ms "per call" for
    identical inputs vs ~23 ms for distinct ones), so repeating one
    input flatters the number;
  * per-call latency syncs after every call; pipelined throughput keeps
    several calls in flight and syncs once (the serving shape — the
    DynamicBatcher overlaps requests the same way);
  * the measured per-call time is FLAT in N (48 MB..384 MB banks all
    land ~23-46 ms run-to-run) and in Q (64..1024) — i.e. it is the
    tunnel's fixed dispatch floor, not compute: on-chip work for
    [Q,192]x[192,1M] + top_k is sub-ms. A PCIe-local host pays ~0.2 ms
    per dispatch instead, so production rates are far higher; we report
    what this rig can measure.

Kept out of bench.py so the driver's round-end run stays bounded.
Prints one JSON line.
"""
import json
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[bank-bench +{time.perf_counter() - T0:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speakerverification_tpu.evaluation.bank import SpeakerBank

    N, D, K, REPS = 1_000_000, 192, 5, 8
    rng = np.random.default_rng(0)
    enrolled = rng.normal(size=(N, D)).astype(np.float32)
    out = {"metric": "speaker identification, 1M-speaker bank (D=192)",
           "unit": "queries/sec", "n": N, "d": D, "k": K}

    # --- host scan (the reference's path), one 64-query batch -----------
    Qh = 64
    queries = rng.normal(size=(Qh, D)).astype(np.float32)
    en = enrolled / np.linalg.norm(enrolled, axis=-1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    t = time.perf_counter()
    d2 = (np.sum(qn**2, -1)[:, None] + np.sum(en**2, -1)[None, :]
          - 2.0 * qn @ en.T)
    best_host = np.argmin(d2, axis=-1)
    host_s = time.perf_counter() - t
    out["host_scan_qps"] = round(Qh / host_s, 2)
    log(f"host scan: {Qh} queries in {host_s:.3f}s "
        f"({out['host_scan_qps']} q/s)")

    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        bank = SpeakerBank(enrolled, dtype=dtype,
                           query_buckets=(1, 64, 512))
        log(f"{tag} bank resident: {bank.nbytes / 1e6:.0f} MB")

        log(f"{tag}: compiling/first identify...")
        # correctness probe vs the host scan
        s, i = bank.identify(queries, k=K)
        agree = float(np.mean(i[:, 0] == best_host))
        out[f"{tag}_top1_agreement_vs_host"] = agree

        for Q in (1, 64, 512):
            batches = [rng.normal(size=(Q, D)).astype(np.float32)
                       for _ in range(REPS)]
            bank.identify(batches[0], k=K)            # warm the compile
            # per-call latency: sync after each distinct batch
            t = time.perf_counter()
            for b in batches:
                bank.identify(b, k=K)
            percall = (time.perf_counter() - t) / REPS
            out[f"{tag}_latency_ms_q{Q}"] = round(percall * 1e3, 1)
            out[f"{tag}_qps_percall_q{Q}"] = round(Q / percall, 1)
        log(f"{tag}: latency q1 {out[f'{tag}_latency_ms_q1']} ms | "
            f"q64 {out[f'{tag}_qps_percall_q64']} q/s | "
            f"q512 {out[f'{tag}_qps_percall_q512']} q/s | "
            f"top1 agree {agree:.4f}")
        del bank

    out["value"] = out["fp32_qps_percall_q512"]
    out["vs_baseline"] = round(out["value"] / out["host_scan_qps"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
