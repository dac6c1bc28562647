"""Raw3_ECAPA (the reference's DEFAULT model) train-side bench + profile
(VERDICT r3 item #3).

The default config (reference yaml/configuration.yaml:76: model Raw3_ECAPA,
criterion ARmSoftmax, optimizer AdaBelief, 2 s @ 8 kHz) had extraction
numbers only. This script measures the TRAIN step with the same chained
lax.scan methodology as bench.py / bench_train_sweep.py (the tunnel's
~3.65 ms per-dispatch cost must not pollute step time) and, in profile
mode, times each stage of the hybrid separately so the per-instruction
floor attribution is measured rather than asserted.

Usage: python bench_raw3_train.py <variant>
  tb32 | tb64 | tb128 | tb256 | tb512   — full train step (fwd+bwd+
                                          AdaBelief) at that half-batch
                                          (utts = 2*tb), bf16 compute
  fwd256 | fwd512                       — extraction forward only
  prof                                  — per-stage forwards at batch 512:
                                          sinc front / RawNet3 branch /
                                          mel+ECAPA branch / full hybrid,
                                          each with cost-analysis FLOPs
                                          and HLO matmul-instruction
                                          counts (roofline attribution)

Prints one JSON line per run.
"""
import json
import os
import re
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[raw3 +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def flops_of(c):
    cost = c.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) if cost else 0.0


def matmul_instr_count(c):
    """Count dot/convolution instructions in the optimized HLO (the ops
    that pay the chip's ~60 us per-instruction issue floor).

    Must be called on a SINGLE-PASS compile: a chained lax.scan lowers to
    a while loop whose body instructions appear ONCE in the HLO text
    regardless of trip count, so dividing a chained compile's count by
    ITERS undercounts by ~ITERS x (advisor finding, round 4)."""
    txt = c.as_text()
    return len(re.findall(r" = \S+ (?:dot|convolution)\(", txt))


def _model(compute_dtype):
    from speakerverification_tpu.encoder import SpeakerEncoder
    from speakerverification_tpu.losses import build_loss
    from speakerverification_tpu.models import build_model

    backbone = build_model("Raw3_ECAPA", nOut=512, sample_rate=8000)
    if compute_dtype is not None:
        backbone = backbone.clone(compute_dtype=compute_dtype)
    return SpeakerEncoder(
        backbone=backbone,
        # default criterion (configuration.yaml:90-97)
        loss=build_loss("ARmSoftmax", nOut=512, nClasses=5994,
                        margin=0.2, scale=30),
        feature_type="raw",            # hybrid featurizes in-model
        compute_dtype=compute_dtype,
    )


def bench_chained(fn_compiled, args, iters, utts):
    np.asarray(fn_compiled(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn_compiled(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "tb128"

    import jax
    import jax.numpy as jnp

    # the ambient site hook re-asserts JAX_PLATFORMS=axon programmatically;
    # honor an explicit env request (JAX_PLATFORMS=cpu smoke runs) by also
    # overriding via jax.config after import (.claude/skills/verify gotcha)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state
    from speakerverification_tpu.training.train_step import make_train_step

    T = int(os.environ.get("SVTPU_BENCH_T", 16000))   # 2 s @ 8 kHz default
    ITERS = int(os.environ.get("SVTPU_BENCH_ITERS", 5))
    rng = np.random.default_rng(0)

    if variant == "prof":
        model = _model(jnp.bfloat16)
        B = int(os.environ.get("SVTPU_BENCH_B", 512))
        wave = jnp.asarray(rng.normal(0, .1, (B, T)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), wave[:2])
        hybrid = model.backbone

        def chained(apply_fn, x, vars_):
            @jax.jit
            def run(x, v):
                def body(carry, _):
                    out = apply_fn(v, carry)
                    # data-dependent carry so XLA cannot hoist the body;
                    # per-iteration DIGEST only — returning the stacked
                    # outputs made the np.asarray fence fetch them over
                    # the ~10-20 MB/s tunnel D2H link, which dominated
                    # every big-output stage (the r5 prof's "30-80 s
                    # sinc passes" were 2-4 GB transfers, not compute)
                    return (carry + 0.0 * out.mean().astype(carry.dtype),
                            out.astype(jnp.float32).mean())
                _, digests = jax.lax.scan(body, x, None, length=ITERS)
                return digests
            # timing on the chained compile; FLOPs + instruction counts on a
            # separate single-pass compile (the scan lowers to a while loop
            # whose body appears once in HLO — counting on the chained text
            # and dividing by ITERS undercounts ~ITERS x)
            single = jax.jit(lambda x, v: apply_fn(v, x))
            return (run.lower(x, vars_).compile(),
                    single.lower(x, vars_).compile(), (x, vars_))

        stages = {}

        # full hybrid forward (embedding extraction, eval mode)
        stages["full"] = chained(
            lambda v, x: model.apply(v, x, train=False), wave, variables)

        # RawNet3 branch alone
        raw_vars = {"params": variables["params"]["backbone"]["raw_branch"],
                    "batch_stats":
                        variables["batch_stats"]["backbone"]["raw_branch"]}
        stages["rawnet3"] = chained(
            lambda v, x: hybrid.raw_branch.apply(v, x, train=False),
            wave, raw_vars)

        # mel frontend + ECAPA branch alone (linear-power mel, bf16 cast —
        # exactly what hybrid_featurize feeds the branch)
        ec_vars = {"params": variables["params"]["backbone"]["ecapa"],
                   "batch_stats":
                       variables["batch_stats"]["backbone"]["ecapa"]}

        from speakerverification_tpu.ops.frontend import make_frontend
        fe = make_frontend(hybrid.frontend, "melspectrogram")

        def ecapa_fwd(v, x):
            mel = fe(x.astype(jnp.float32))
            return hybrid.ecapa.apply(v, mel.astype(jnp.bfloat16),
                                      train=False)
        stages["mel_ecapa"] = chained(ecapa_fwd, wave, ec_vars)

        # mel frontend alone (fp32, as hybrid_featurize runs it)
        stages["frontend"] = chained(
            lambda v, x: fe(x.astype(jnp.float32)), wave,
            {"params": {}})

        # ECAPA branch on PRECOMPUTED mel (isolates the encoder from
        # the frontend share of the mel_ecapa stage)
        mel0 = fe(wave.astype(jnp.float32)).astype(jnp.bfloat16)
        stages["ecapa_on_mel"] = chained(
            lambda v, m: hybrid.ecapa.apply(v, m, train=False),
            mel0, ec_vars)

        # sinc front alone (the ParamSincFB conv) in both dtypes — the
        # r5 prof run recorded a pathological 30.7 s/pass for the bf16
        # standalone case; measure both to pin whether the conv dtype
        # or the standalone lowering is at fault
        from speakerverification_tpu.ops.sinc import SincConv
        sc = SincConv(256, kernel_size=251, stride=10, sample_rate=16000)
        sc_vars = jax.jit(sc.init)(jax.random.PRNGKey(0), wave[:2, :])
        stages["sinc_bf16"] = chained(
            lambda v, x: sc.apply(v, x.astype(jnp.bfloat16)), wave, sc_vars)
        stages["sinc_f32"] = chained(
            lambda v, x: sc.apply(v, x.astype(jnp.float32)), wave, sc_vars)

        out = {"variant": "prof", "batch": B, "stages": {}}
        for name, (c, c1, cargs) in stages.items():
            log(f"run {name}")
            best = bench_chained(c, cargs, ITERS, B)
            fl1 = flops_of(c1)          # per-pass FLOPs, single-pass compile
            out["stages"][name] = {
                "ms_per_pass": round(best / ITERS * 1e3, 2),
                "utts_per_s": round(B * ITERS / best, 1),
                "gflops_per_pass": round(fl1 / 1e9, 2),
                "tflops_per_s": round(fl1 * ITERS / best / 1e12, 2),
                "matmul_instrs": matmul_instr_count(c1),
            }
        print(json.dumps(out))
        return

    fwd = variant.startswith("fwd")
    tb = int(variant[3:]) if fwd else int(variant[2:])

    model = _model(jnp.bfloat16)
    tx = build_optimizer("AdaBelief", learning_rate=1e-3, weight_decay=2e-5)

    if fwd:
        wave = jnp.asarray(rng.normal(0, .1, (tb, T)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), wave[:2])

        @jax.jit
        def chained(x, v):
            def body(carry, _):
                emb = model.apply(v, carry, train=False)
                # digest, not the stacked embeddings — see prof chained()
                return (carry + 0.0 * emb.mean().astype(carry.dtype),
                        emb.astype(jnp.float32).mean())
            _, digests = jax.lax.scan(body, x, None, length=ITERS)
            return digests
        log(f"compile {variant}")
        c = chained.lower(wave, variables).compile()
        c1 = jax.jit(lambda x, v: model.apply(v, x, train=False)) \
            .lower(wave, variables).compile()
        best = bench_chained(c, (wave, variables), ITERS, tb)
        fl1 = flops_of(c1)
        print(json.dumps({
            "variant": variant,
            "utts_per_s": round(tb * ITERS / best, 1),
            "tflops_per_s": round(fl1 * ITERS / best / 1e12, 1),
            "pass_ms": round(best / ITERS * 1e3, 1),
            "matmul_instrs": matmul_instr_count(c1)}))
        return

    twave = jnp.asarray(rng.normal(0, .1, (tb, 2, T)).astype(np.float32))
    tlabel = jnp.asarray(np.arange(tb) % 5994, jnp.int32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               twave, tlabel)
    step_fn = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    @jax.jit
    def chained(state):
        def body(s, _):
            s2, m = step_fn(s, twave, tlabel, key, lr)
            return s2, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=ITERS)
        return losses[-1]

    log(f"compile {variant}")
    c = chained.lower(state).compile()
    # single-pass compile must return the FULL new state: returning only
    # the loss metric lets XLA dead-code-eliminate the whole backward
    # pass + optimizer update, and the "train FLOPs" silently become
    # forward-only (caught r5: 2999 GFLOP/step vs the real ~9000)
    c1 = jax.jit(lambda s: step_fn(s, twave, tlabel, key, lr)) \
        .lower(state).compile()
    fl1 = flops_of(c1)
    best = bench_chained(c, (state,), ITERS, tb * 2)
    print(json.dumps({
        "variant": variant,
        "utts_per_s": round(tb * 2 * ITERS / best, 1),
        "tflops_per_s": round(fl1 * ITERS / best / 1e12, 1),
        "step_ms": round(best / ITERS * 1e3, 1),
        "gflops_per_step": round(fl1 / 1e9, 1),
        "matmul_instrs": matmul_instr_count(c1)}))


if __name__ == "__main__":
    main()
