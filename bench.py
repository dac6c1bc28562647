"""Benchmark: ECAPA-TDNN embedding-extraction throughput + MFU.

The reference extracts embeddings file-by-file at batch size 1 and scores
trial pairs in a Python loop (src/model.py:369-448); BASELINE.md's
operative target is ≥10× utterances/sec/chip vs an A100 running that
path. Batch 512 is the measured sweet spot on this chip (256→512 is
+11% — bigger per-instruction matmuls amortize the ~60 µs dispatch
floor; 1024 adds only 1.6% more). We benchmark the batched jitted extraction on the full-size
ECAPA-TDNN (C=1024, emb 192) over 2-second 16 kHz utterances, mel
frontend traced into the same XLA program — extraction runs bf16 with
the frontend pinned fp32 (mirroring the reference's autocast exclusion,
src/models/ECAPA_TDNN.py:469-478), params cast in-step.

MFU: FLOPs come from XLA cost analysis of the compiled program;
peak is TPU v5e bf16 (197 TFLOP/s). A training-step entry (forward +
backward + AdaBelief update, batch 512 utts — the measured sweet spot,
see bench_train_sweep.py) is reported alongside.

Timing methodology: the axon tunnel adds ~3.65 ms of host round-trip
per dispatch (measured with a trivial jitted add — a production host
pays none of this), so the REPORTED throughput chains the workload
inside ONE XLA program via ``lax.scan`` with a data-dependent carry
(XLA cannot hoist the loop body); the dispatch-inclusive per-call rate
is kept as ``utts_per_sec_percall``.

Roofline context: this bench measures the chip's PRACTICAL bf16 GEMM
ceiling with a SHAPE SWEEP of chained large matmuls (8192³ reaches
~136 TF/s on the tunneled v5-lite; model-shaped K=512 GEMMs are
HBM-bandwidth-bound at ~51) and reports throughput as a fraction of
the sweep max (``pct_of_practical_peak``), plus a measured
per-instruction issue-floor microbench and a per-pass time split
(MXU-busy / instruction floor / VPU-layout residual) for the embed and
train points. ECAPA's Res2Net inner convs sit on the instruction
floor: the cascade is 21 inherently sequential small convolutions per
pass (see ops/pallas_res2net.py — a VMEM-fused kernel lands at par,
so it ships opt-in).

``vs_baseline`` is measured against an assumed 100 utt/s for the
reference's batch-1 A100 loop (no published numbers exist — see
BASELINE.md; 100 utt/s is a generous estimate for per-file forward +
host sync at batch 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)

ASSUMED_REFERENCE_UTTS_PER_SEC = 100.0
PEAK_BF16_TFLOPS = 197.0          # TPU v5e (v5 lite) bf16 peak per chip
BATCH = 512
SECONDS = 2.0
SR = 16000
WARMUP = 3
ITERS = 10


def _flops_of(compiled) -> float:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):          # older jax returns [dict]
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) if cost else 0.0


def _time_best(fn, fence, windows: int = 3, iters: int = ITERS) -> float:
    """Best-of-N windows; remote-link hiccups only slow a window down."""
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        fence(out)          # device executes calls in order
        best = min(best, time.perf_counter() - t0)
    return best


def _gemm_rate_tflops(M: int, K: int, N: int, pairs: int = 10) -> float:
    """Measured bf16 GEMM rate for one shape: ``2*pairs`` matmuls
    chained inside ONE program (lax.scan), so remote-dispatch latency
    can't pollute the rate. Each scan step does TWO dependent GEMMs
    with distinct weights (A@B then @C) and no dtype round-trips — a
    single same-weight serially-dependent matmul per step measures up
    to ~1.8x LOWER at model shapes (r5: 64 vs 114 TF/s at
    102912x1024x1024) because nothing overlaps the memory phases; the
    ceiling must be the best achievable rate."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 1.0 / 64.0, (K, N)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    c = jnp.asarray(rng.normal(0, 1.0 / 64.0, (N, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    @jax.jit
    def f(a, b, c):
        def body(h, _):
            return (h @ b) @ c, None
        h, _ = jax.lax.scan(body, a, None, length=pairs)
        return h[0, :2]

    np.asarray(f(a, b, c))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(a, b, c)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return 2.0 * 2.0 * M * K * N * pairs / best / 1e12


def _practical_peak_sweep() -> dict:
    """Defend the practical-peak denominator (VERDICT r4 #4): probe the
    bf16 GEMM ceiling at several square-ish MXU-friendly shapes instead
    of assuming one. K=N so the chained-carry trick keeps shapes static.

    The last two entries are MODEL-shaped (M = batch×frames, K=N =
    channel width): on this chip the rate is strongly K-dependent —
    K=512 GEMMs are HBM-bandwidth-bound (~51 TF/s, r5 measurement)
    while K=1024 reaches ~114 and 8192³ ~136 — so per-branch
    "saturation" must be judged against the SHAPE-MATCHED ceiling, not
    the global max (which remains the reported practical peak)."""
    sweep = {}
    for M, K, N in ((8192, 4096, 4096), (4096, 4096, 4096),
                    (8192, 8192, 8192), (2048, 2048, 2048),
                    (102912, 512, 512), (102912, 1024, 1024)):
        sweep[f"{M}x{K}x{N}"] = round(_gemm_rate_tflops(M, K, N), 1)
    return sweep


def _per_instr_floor_us() -> float:
    """Measured fixed cost per dependent MXU instruction: chain many
    TINY matmuls (128x128 — compute time ~ns-scale next to the issue
    overhead) and take the per-step cost."""
    import jax
    import jax.numpy as jnp

    REPS = 400
    a = jnp.eye(128, dtype=jnp.bfloat16) * 0.99
    b = jnp.eye(128, dtype=jnp.bfloat16) * 1.01

    @jax.jit
    def f(a, b):
        def body(h, _):
            return (h @ b).astype(jnp.bfloat16), None
        h, _ = jax.lax.scan(body, a, None, length=REPS)
        return h

    np.asarray(f(a, b)[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(a, b)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e6


def _matmul_instrs(compiled) -> int:
    """dot/convolution instruction count in the optimized HLO. Count on
    a program whose workload body appears ONCE (a single-pass compile,
    or a lax.scan chain — the body lowers into a while loop printed
    once regardless of trip count)."""
    import re
    return len(re.findall(r" = \S+ (?:dot|convolution)\(",
                          compiled.as_text()))


def _time_split(total_ms_per_pass: float, flops_per_pass: float,
                n_matmul_instrs: int, gemm_rate_tflops: float,
                per_instr_us: float) -> dict:
    """Attribute one pass's wall time into measured categories:
    GEMM-busy at the SHAPE-MATCHED measured rate (for this model's
    K=1024-dominated GEMMs — using the global sweep max would
    understate the memory-bound GEMM time ~2-3x and misattribute it
    to the residual), the measured per-instruction issue floor, and
    the unexplained residual (VPU/elementwise, layout changes,
    scheduling slack)."""
    mxu_ms = flops_per_pass / (gemm_rate_tflops * 1e12) * 1e3
    floor_ms = n_matmul_instrs * per_instr_us / 1e3
    resid_ms = max(0.0, total_ms_per_pass - mxu_ms - floor_ms)
    return {
        "total_ms": round(total_ms_per_pass, 2),
        "mxu_busy_ms": round(mxu_ms, 2),
        "gemm_rate_tflops_used": round(gemm_rate_tflops, 1),
        "instr_floor_ms": round(floor_ms, 2),
        "vpu_layout_other_ms": round(resid_ms, 2),
        "matmul_instrs": n_matmul_instrs,
        "pct_explained": round(100.0 * min(1.0, (mxu_ms + floor_ms)
                                           / total_ms_per_pass), 1),
    }


def _backend_or_report(timeout_s: int = 420) -> None:
    """Probe backend health with a hard deadline before committing.

    The tunneled TPU backend can be UNAVAILABLE (observed: init blocks
    in C for 25+ minutes, then 'Unable to initialize backend axon' —
    signal.alarm can't interrupt a C-blocked init, so the probe runs in
    a CHILD process that can simply be killed). A healthy init takes
    well under a minute; rather than hanging to the driver's timeout
    and recording nothing, print one explanatory JSON line and exit so
    the failure mode is legible.
    """
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('NDEV', len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
        if out.returncode == 0 and "NDEV" in out.stdout:
            _log(f"backend probe ok: {out.stdout.strip().splitlines()[-1]}")
            return
        reason = (out.stderr or out.stdout).strip().splitlines()[-1:]
        reason = reason[0] if reason else f"rc={out.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"backend init still blocked after {timeout_s}s"
    print(json.dumps({
        "metric": "ECAPA-TDNN embedding extraction throughput",
        "value": None, "unit": "utterances/sec/chip",
        "vs_baseline": None,
        "error": f"TPU backend unavailable at bench time ({reason}); "
                 "last good on-chip record: BENCH_r02.json "
                 "(9650.57 utt/s; this run measured nothing)"}))
    sys.exit(0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs (and the driver's) hit
    # the cache instead of paying multi-minute remote TPU compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _backend_or_report()

    from __graft_entry__ import _flagship
    from speakerverification_tpu.training.train_step import (
        make_eval_embed_fn,
        make_train_step,
    )

    on_tpu = jax.default_backend() != "cpu"
    model = _flagship(frontend_backend="auto" if on_tpu else "xla")
    # bf16 extraction: frontend fp32, backbone bf16 (encoder.compute_dtype)
    model_bf16 = model.clone(compute_dtype=jnp.bfloat16)
    T = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(0, 0.1, (BATCH, T)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, T)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    embed = make_eval_embed_fn(model_bf16, normalize=True,
                               compute_dtype=jnp.bfloat16)
    _log("compiling embed")
    # make_eval_embed_fn's embed is already jitted — lower/compile ONCE
    # and call the compiled object (a second jit would recompile the
    # same program, minutes over the remote-compile tunnel)
    compiled = embed.lower(params, batch_stats, wave).compile()
    embed_flops = _flops_of(compiled)

    for _ in range(WARMUP):
        # NOTE: under the axon tunnel block_until_ready can return before
        # the device finishes; a D2H fetch is the only reliable fence.
        np.asarray(compiled(params, batch_stats, wave))

    dt = _time_best(lambda: compiled(params, batch_stats, wave),
                    lambda out: np.asarray(out))
    utts_per_sec_percall = BATCH * ITERS / dt

    # In-program chained timing: the axon tunnel costs ~3.65 ms of host
    # round-trip per dispatch (measured with a trivial jitted add), which
    # a production host would not pay. Chaining ITERS calls inside ONE
    # program via lax.scan — with a data-dependent carry so XLA cannot
    # hoist the loop-invariant body — measures pure device throughput.
    @jax.jit
    def embed_chained(params, batch_stats, wave):
        def body(w, _):
            e = embed(params, batch_stats, w)
            return w + e.astype(jnp.float32).sum() * 1e-12, None
        w, _ = jax.lax.scan(body, wave, None, length=ITERS)
        return w[0, :4]

    _log("compiling chained embed")
    embed_chained_c = embed_chained.lower(params, batch_stats,
                                          wave).compile()
    np.asarray(embed_chained_c(params, batch_stats, wave))    # warm
    cdt = _time_best(lambda: embed_chained_c(params, batch_stats, wave),
                     lambda out: np.asarray(out), windows=4, iters=1)
    utts_per_sec = BATCH * ITERS / cdt
    embed_tflops = embed_flops * ITERS / cdt / 1e12
    embed_mfu = 100.0 * embed_tflops / PEAK_BF16_TFLOPS

    # ---- training step: forward + backward + AdaBelief update, bf16 ----
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state

    tx = build_optimizer("AdaBelief", learning_rate=1e-3, weight_decay=2e-5)
    # 256×2 = 512 utts/step: measured sweet spot (bench_train_sweep.py —
    # 2807/3026/3251/3454/2802 utt/s at 64/128/256/512/1024 utts; 512
    # utts runs at 76.2 TF/s, near extraction's efficiency, so the r2
    # "training efficiency gap" was batch amortization of the ~60 µs
    # per-instruction floor, not a step-structure defect. 1024 utts
    # REGRESSES: XLA's HBM-pressure rematerialization pass recomputes
    # activations (cost analysis shows GF/utt inflate 22.0 -> 28.1).
    tb = 256
    twave = jnp.asarray(rng.normal(0, 0.1, (tb, 2, T)).astype(np.float32))
    tlabel = jnp.asarray(np.arange(tb) % 5994, jnp.int32)
    state = create_train_state(model_bf16, tx, jax.random.PRNGKey(0),
                               twave, tlabel)
    step_fn = make_train_step(model_bf16, tx, compute_dtype=jnp.bfloat16)
    step_rng = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    TRAIN_ITERS = 5

    @jax.jit
    def train_chained(state):
        # successive optimizer steps carry the state — already serially
        # dependent, so chaining measures real step time sans dispatch
        def body(s, _):
            s2, m = step_fn(s, twave, tlabel, step_rng, lr)
            return s2, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=TRAIN_ITERS)
        return losses[-1]

    _log("compiling chained train step")
    train_compiled = train_chained.lower(state).compile()
    # XLA cost analysis counts a lax.scan body ONCE (trip count is not
    # folded in), so this is already the per-step FLOPs
    train_flops = _flops_of(train_compiled)
    np.asarray(train_compiled(state))                       # warm
    tdt = _time_best(lambda: train_compiled(state),
                     lambda out: np.asarray(out), windows=3, iters=1)
    train_utts = tb * 2 * TRAIN_ITERS / tdt
    train_tflops = train_flops * TRAIN_ITERS / tdt / 1e12
    train_mfu = 100.0 * train_tflops / PEAK_BF16_TFLOPS

    # ---- optional: int8 MXU extraction (quant.py serving path) ----
    # opt-in via SVTPU_BENCH_INT8=1: two extra remote compiles (~4-5 min
    # over the tunnel) would push the default driver run against its
    # timeout; the measured numbers live in PARITY.md's roofline section.
    int8_fields = {}
    if os.environ.get("SVTPU_BENCH_INT8"):
        from speakerverification_tpu.quant import make_int8_embed_fn
        embed_i8 = make_int8_embed_fn(model_bf16, normalize=True,
                                      compute_dtype=jnp.bfloat16)

        @jax.jit
        def embed_i8_chained(params, batch_stats, wave):
            def body(w, _):
                e = embed_i8(params, batch_stats, w)
                return w + e.astype(jnp.float32).sum() * 1e-12, None
            w, _ = jax.lax.scan(body, wave, None, length=ITERS)
            return w[0, :4]

        _log("compiling chained int8 embed")
        i8_c = embed_i8_chained.lower(params, batch_stats, wave).compile()
        np.asarray(i8_c(params, batch_stats, wave))          # warm
        i8dt = _time_best(lambda: i8_c(params, batch_stats, wave),
                          lambda out: np.asarray(out), windows=4, iters=1)
        # fidelity vs the bf16 float path on the same batch
        e_f = np.asarray(compiled(params, batch_stats, wave))
        e_q = np.asarray(embed_i8(params, batch_stats, wave))
        cos = np.sum(e_f * e_q, axis=-1)
        int8_fields = {
            "embed_int8_utts_per_sec": round(BATCH * ITERS / i8dt, 2),
            "embed_int8_cos_min_vs_bf16": round(float(cos.min()), 5),
        }
        _log(f"int8 extraction: {int8_fields}")

    _log("measuring practical peak (shape sweep)")
    peak_sweep = _practical_peak_sweep()
    practical = max(peak_sweep.values())
    _log(f"peak sweep: {peak_sweep}")
    _log("measuring per-instruction issue floor")
    per_instr_us = _per_instr_floor_us()
    _log(f"per-instr floor: {per_instr_us:.1f} us")

    # Per-category attribution of each pass (VERDICT r4 #4). Instruction
    # counts come from the CHAINED compiles (scan bodies print once in
    # optimized HLO, so the count equals a single pass's). The GEMM
    # denominator is the sweep's MODEL-SHAPED K=1024 rate, not the
    # global max — this model's conv GEMMs are that shape and are
    # bandwidth-bound below the 8192^3 ceiling.
    model_rate = peak_sweep.get("102912x1024x1024", practical)
    embed_split = _time_split(cdt / ITERS * 1e3, embed_flops,
                              _matmul_instrs(embed_chained_c), model_rate,
                              per_instr_us)
    train_split = _time_split(tdt / TRAIN_ITERS * 1e3, train_flops,
                              _matmul_instrs(train_compiled), model_rate,
                              per_instr_us)
    _log(f"embed split: {embed_split}")
    _log(f"train split: {train_split}")
    _log("done")

    print(json.dumps({
        "metric": "ECAPA-TDNN embedding extraction throughput "
                  f"(2s utts, batch {BATCH}, bf16, mel frontend fused, "
                  "in-program chained timing)",
        "value": round(utts_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utts_per_sec / ASSUMED_REFERENCE_UTTS_PER_SEC, 2),
        "utts_per_sec_percall": round(utts_per_sec_percall, 2),
        "embed_gflops_per_utt": round(embed_flops / BATCH / 1e9, 2),
        "embed_tflops_per_sec": round(embed_tflops, 2),
        "embed_mfu_pct": round(embed_mfu, 1),
        "train_step_utts_per_sec": round(train_utts, 2),
        "train_tflops_per_sec": round(train_tflops, 2),
        "train_mfu_pct": round(train_mfu, 1),
        "peak_tflops_assumed": PEAK_BF16_TFLOPS,
        "practical_peak_tflops_measured": round(practical, 1),
        "practical_peak_sweep": peak_sweep,
        "pct_of_practical_peak": round(100.0 * embed_tflops / practical, 1),
        "per_instr_floor_us": round(per_instr_us, 1),
        "embed_time_split": embed_split,
        "train_time_split": train_split,
        **int8_fields,
    }))


if __name__ == "__main__":
    main()
