"""Jitted train/eval steps, single-chip and shard_map data-parallel.

TPU-native replacement for the reference's ``ModelHandling.fit`` inner
loop (src/model.py:247-278: forward → AMP backward → allreduce via DDP →
optimizer step). Here a whole step is one XLA program; under data
parallelism the gradient mean is a ``psum`` over the ``data`` mesh axis
inside ``shard_map`` (replacing torch DDP's NCCL allreduce,
src/trainer.py:100-101).

The learning rate is fed as a scalar argument each step and written into
the optimizer's injected hyperparams, so host-side schedules — including
reduce-on-plateau — drive it without recompilation.

Mixed precision: on TPU, bf16 compute needs no loss scaling (unlike the
reference's CUDA AMP GradScaler, src/model.py:169,256-261); a bf16 policy
is applied by casting batch inputs; params stay fp32.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from speakerverification_tpu.optim import set_learning_rate
from speakerverification_tpu.training.state import TrainState

__all__ = ["make_train_step", "make_eval_embed_fn", "eval_dp_devices"]


def eval_dp_devices(hparams) -> Optional[list]:
    """The ONE policy for row-sharded eval extraction: all local devices
    when more than one is addressable and ``eval_data_parallel`` isn't
    disabled, else None. Shared by the Trainer's validation and the
    InferenceEngine so the opt-out key can't drift between call sites."""
    devs = jax.local_devices()
    if len(devs) > 1 and bool(hparams.get("eval_data_parallel", True)):
        return devs
    return None


def make_train_step(model, tx: optax.GradientTransformation,
                    axis_name: Optional[str] = None,
                    compute_dtype: Optional[jnp.dtype] = None,
                    grad_scale: float = 1.0,
                    augment_fn: Optional[Callable] = None,
                    accum_steps: int = 1) -> Callable:
    """Build ``step(state, wave, label, rng, lr) -> (state, metrics)``.

    With ``axis_name`` set, the step is meant to run inside ``shard_map``
    over that mesh axis: gradients and metrics are ``psum``-averaged.

    ``accum_steps=k`` runs gradient accumulation: the batch is split
    into k microbatches scanned sequentially inside the SAME XLA
    program, activations live for one microbatch at a time, and one
    optimizer update applies the mean gradient — effective batches far
    beyond what HBM fits in one forward/backward (the large-margin
    heads want big batches). Semantics are exactly "sequential data
    parallelism": every microbatch starts from the step's incoming
    batch stats and the k new stats are averaged, mirroring the DP
    pmean — tested equal to a k-device DP step to float tolerance.
    Composes with DP/TP (each shard accumulates its own slice).

    ``augment_fn(wave, rng, *aug_args) -> wave`` runs INSIDE the jitted
    step before the forward pass — the hook for on-device batched
    augmentation (ops/device_augment.py::device_env_corrupt); it draws
    from a dedicated rng fold so model rngs are unchanged. Any extra
    positional arguments given to the built step (e.g. noise/RIR banks)
    are forwarded to ``augment_fn`` — passing banks as step ARGUMENTS
    rather than closure constants lets the trainer refresh them every
    epoch (same shapes) without recompiling the step.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: fp32 master
    params are cast to bf16 for the forward/backward pass (bf16's fp32
    exponent range needs no loss scaling, unlike the reference's CUDA
    AMP GradScaler, src/model.py:169,256-261); gradients arrive fp32 at
    the cast boundary and the optimizer update stays fp32. The waveform
    is NOT cast: the model's frontend is pinned fp32 (encoder.py
    ``compute_dtype`` casts features after the frontend — build the
    model with the same dtype, e.g. via ``encoder_from_hparams``).
    """

    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def step(state: TrainState, wave, label, rng, lr, *aug_args):
        if augment_fn is not None:
            wave = augment_fn(wave, jax.random.fold_in(rng, 2), *aug_args)

        def value_and_grads(mb_wave, mb_label, mb_rng):
            def loss_fn(params):
                apply_params = params
                if compute_dtype is not None:
                    apply_params = jax.tree_util.tree_map(
                        lambda p: p.astype(compute_dtype)
                        if jnp.issubdtype(p.dtype, jnp.floating) else p,
                        params)
                (loss, prec1), mutated = model.apply(
                    {"params": apply_params,
                     "batch_stats": state.batch_stats},
                    mb_wave, mb_label, train=True,
                    mutable=["batch_stats"],
                    rngs={"specaug": mb_rng,
                          "dropout": jax.random.fold_in(mb_rng, 1)})
                loss = loss.astype(jnp.float32)
                return loss, (prec1,
                              mutated.get("batch_stats", state.batch_stats))
            return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        if accum_steps == 1:
            (loss, (prec1, new_stats)), grads = value_and_grads(
                wave, label, rng)
        else:
            k = accum_steps
            if wave.shape[0] % k:
                raise ValueError(
                    f"batch of {wave.shape[0]} speaker tuples does not "
                    f"split into accumulate_steps={k} microbatches")
            mb_w = wave.reshape(k, wave.shape[0] // k, *wave.shape[1:])
            mb_l = label.reshape(k, label.shape[0] // k,
                                 *label.shape[1:])
            mb_rngs = jax.random.split(jax.random.fold_in(rng, 3), k)

            def micro(carry, xs):
                g_acc, s_acc, l_acc, p_acc = carry
                (l_i, (p_i, s_i)), g_i = value_and_grads(*xs)
                add = lambda a, b: a + b
                return (jax.tree_util.tree_map(add, g_acc, g_i),
                        jax.tree_util.tree_map(add, s_acc, s_i),
                        l_acc + l_i, p_acc + p_i), None

            init = (jax.tree_util.tree_map(jnp.zeros_like, state.params),
                    jax.tree_util.tree_map(
                        lambda s: jnp.zeros_like(s, dtype=jnp.float32),
                        state.batch_stats),
                    jnp.float32(0.0), jnp.float32(0.0))
            (g, s, l_sum, p_sum), _ = jax.lax.scan(
                micro, init, (mb_w, mb_l, mb_rngs))
            inv = 1.0 / k
            grads = jax.tree_util.tree_map(lambda x: x * inv, g)
            new_stats = jax.tree_util.tree_map(
                lambda x, ref: (x * inv).astype(ref.dtype),
                s, state.batch_stats)
            loss, prec1 = l_sum * inv, p_sum * inv

        if grad_scale != 1.0:
            # model-parallel losses compute the identical GLOBAL loss on
            # every model shard from psum'ed partials; the psum transpose
            # then collects each shard's cotangent, scaling every gradient
            # by n_model — undo it (parallel/tp.py passes 1/n_model)
            grads = jax.tree_util.tree_map(lambda g: g * grad_scale, grads)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            prec1 = jax.lax.pmean(prec1, axis_name)
            # Cross-replica batch-stat averaging keeps replicas bit-identical
            # (the reference keeps per-rank BN — DDP default; averaging is
            # the sane choice for SPMD, documented in SURVEY.md §7 (d)).
            new_stats = jax.lax.pmean(new_stats, axis_name)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "prec1": prec1}

    return step


def make_eval_embed_fn(model, normalize: bool = True,
                       compute_dtype: Optional[jnp.dtype] = None,
                       devices=None) -> Callable:
    """Build a jitted ``embed(state, wave [B, T]) -> [B, D]`` extractor.

    Replaces the reference's file-by-file batch-size-1 embedding loop
    (src/model.py:369-394) with batched extraction; L2 normalization per
    the loss head's ``test_normalize``.

    ``devices`` (≥2 of them) turns on single-process data-parallel
    extraction: a 1-D ``Mesh`` over the given devices, params/stats
    replicated, the batch row-sharded — the standard TPU-VM serving
    shape (one process addressing 4-8 local chips), which the
    reference's per-process ``DistributedSampler`` eval
    (src/model.py:363-366) cannot express. Embedding is per-row math
    (eval-mode BN uses running stats), so the sharded result is
    bit-identical to single-device; batches that don't divide are
    padded by row-repetition and sliced back.
    """

    def _embed(params, batch_stats, wave):
        if wave.dtype == jnp.int16:
            # serving wire format (serving.py transport=int16): 16-bit
            # PCM crosses host->device at half the float32 bytes and is
            # dequantized HERE, inside the compiled program, so XLA
            # fuses the cast+scale into the frontend's first op. jit
            # specializes on dtype, so float32 callers are unaffected.
            wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
        if compute_dtype is not None:
            # params only — the model's frontend stays fp32 and casts
            # features to its compute_dtype (encoder.py)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        emb = model.apply({"params": params, "batch_stats": batch_stats}, wave)
        emb = emb.astype(jnp.float32)
        if normalize:
            emb = emb / jnp.clip(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    if devices is None or len(devices) < 2:
        return jax.jit(_embed)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(devices), ("dp",))
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("dp"))
    sharded = jax.jit(_embed, in_shardings=(repl, repl, rows),
                      out_shardings=rows)
    n = len(devices)

    def embed_dp(params, batch_stats, wave):
        B = wave.shape[0]
        pad = (-B) % n
        if pad:
            # repeat rows (cheap gather) rather than zero-pad: every row
            # the devices compute is a real utterance, so a frontend that
            # dislikes silence can't emit NaN into the padding lanes
            wave = jnp.asarray(wave)[jnp.arange(B + pad) % B]
        out = sharded(params, batch_stats, wave)
        return out[:B] if pad else out

    return embed_dp
