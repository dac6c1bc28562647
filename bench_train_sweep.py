"""Train-step efficiency probe (VERDICT r2 #5): one variant per run.

Usage: python bench_train_sweep.py <variant>
  tb32 | tb64 | tb128 | tb256 | tb512
                        — chained train step at that half-batch
                          (utts = 2×tb), AdaBelief update included
  tb256r | tb512r       — same with model.remat=True (explicit per-
                          SE-Res2Net-block rematerialization; probes
                          whether hand-placed remat beats XLA's
                          automatic HBM-pressure remat at 1024 utts)
  grad64                — forward+backward only at tb=64 (no update)

Same chained-lax.scan methodology as bench.py (the tunnel's ~3.65 ms
per-dispatch cost must not pollute step time); prints one JSON line.
Run each variant as its own process so a hung remote compile can be
retried without losing earlier results.
"""
import json
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[sweep +{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def flops_of(c):
    cost = c.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) if cost else 0.0


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "tb64"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/svtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state
    from speakerverification_tpu.training.train_step import make_train_step

    T = 32000
    ITERS = 5
    tb = {"tb32": 32, "tb64": 64, "tb128": 128, "tb256": 256, "tb512": 512,
          "tb256r": 256, "tb512r": 512, "grad64": 64}[variant]

    model = _flagship(frontend_backend="auto",
                      remat=variant.endswith("r"))
    model_bf16 = model.clone(compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    tx = build_optimizer("AdaBelief", learning_rate=1e-3, weight_decay=2e-5)

    twave = jnp.asarray(rng.normal(0, .1, (tb, 2, T)).astype(np.float32))
    tlabel = jnp.asarray(np.arange(tb) % 5994, jnp.int32)
    state = create_train_state(model_bf16, tx, jax.random.PRNGKey(0),
                               twave, tlabel)
    step_fn = make_train_step(model_bf16, tx, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    if variant == "grad64":
        def loss_only(params, stats):
            ap = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
            (l, p1), mut = model_bf16.apply(
                {"params": ap, "batch_stats": stats}, twave, tlabel,
                train=True, mutable=["batch_stats"],
                rngs={"specaug": key, "dropout": jax.random.fold_in(key, 1)})
            return l.astype(jnp.float32), mut["batch_stats"]

        @jax.jit
        def chained(params, stats):
            def body(carry, _):
                p, s = carry
                (l, ns), g = jax.value_and_grad(loss_only, has_aux=True)(p, s)
                p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
                return (p2, ns), l
            _, losses = jax.lax.scan(body, (params, stats), None,
                                     length=ITERS)
            return losses[-1]

        args = (state.params, state.batch_stats)
    else:
        @jax.jit
        def chained(state):
            def body(s, _):
                s2, m = step_fn(s, twave, tlabel, key, lr)
                return s2, m["loss"]
            _, losses = jax.lax.scan(body, state, None, length=ITERS)
            return losses[-1]

        args = (state,)

    log(f"compile {variant}")
    c = chained.lower(*args).compile()
    fl = flops_of(c)
    log("warm run")
    np.asarray(c(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(c(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "variant": variant,
        "utts_per_s": round(tb * 2 * ITERS / best, 1),
        "tflops_per_s": round(fl * ITERS / best / 1e12, 1),
        "step_ms": round(best / ITERS * 1e3, 1),
        "gflops_per_step": round(fl / 1e9, 1)}))


if __name__ == "__main__":
    main()
