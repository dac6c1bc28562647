"""Benchmark: ECAPA-TDNN embedding-extraction throughput (utt/s/chip).

The reference extracts embeddings file-by-file at batch size 1 and scores
trial pairs in a Python loop (src/model.py:369-448); BASELINE.md's
operative target is ≥10× utterances/sec/chip vs an A100 running that
path. We benchmark the batched jitted extraction on the full-size
ECAPA-TDNN (C=1024, emb 192) over 2-second 16 kHz utterances, mel
frontend traced into the same XLA program.

``vs_baseline`` is measured against an assumed 100 utt/s for the
reference's batch-1 A100 loop (no published numbers exist — see
BASELINE.md; 100 utt/s is a generous estimate for per-file forward +
host sync at batch 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

ASSUMED_REFERENCE_UTTS_PER_SEC = 100.0
BATCH = 128
SECONDS = 2.0
SR = 16000
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship()
    T = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    wave_h = rng.normal(0, 0.1, (BATCH, T)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, T)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def embed(params, batch_stats, wave):
        emb = model.apply({"params": params, "batch_stats": batch_stats}, wave)
        return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                              1e-12)

    wave = jnp.asarray(wave_h)
    for _ in range(WARMUP):
        # NOTE: under the axon tunnel block_until_ready can return before
        # the device finishes; a D2H fetch is the only reliable fence.
        np.asarray(embed(params, batch_stats, wave))

    # best of 3 windows: remote-link hiccups only ever slow a window down
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = wave
        for _ in range(ITERS):
            out = embed(params, batch_stats, wave)
        np.asarray(out)      # fence: device executes calls in order
        best_dt = min(best_dt, time.perf_counter() - t0)

    utts_per_sec = BATCH * ITERS / best_dt
    print(json.dumps({
        "metric": "ECAPA-TDNN embedding extraction throughput "
                  "(2s utts, batch 128, mel frontend fused)",
        "value": round(utts_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utts_per_sec / ASSUMED_REFERENCE_UTTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
