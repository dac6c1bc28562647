"""Every training feature composed in ONE jitted step.

Per-feature tests prove DP, DP x TP, gradient accumulation, EMA
tracking, on-device env_corrupt, per-block remat, and bf16 each work in
isolation (and a few pairs exactly: accum==k-device DP, bf16 DP, ...).
Production runs turn them ALL on at once, and cross-feature bugs hide
precisely in the composition — e.g. an augment hook that re-folds rng
under accumulation, a remat boundary that breaks the EMA leaf's donate,
or TP state specs that miss the EMA pytree. This file runs the
everything-on step on tiny shapes and asserts the state advances sanely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import build_loss
from speakerverification_tpu.losses.sharded import ShardedAAmSoftmax
from speakerverification_tpu.models import build_model
from speakerverification_tpu.optim import build_optimizer, get_ema_params
from speakerverification_tpu.ops.device_augment import (
    AugmentBanks,
    device_env_corrupt,
)
from speakerverification_tpu.training.state import create_train_state

L = 1600                       # samples per utt (>= n_fft, tiny compile)
N_CLASSES = 16                 # divisible by model_parallel=2
EMB = 16
EMA_DECAY = 0.9


def _banks(seed=0, n_noise=8, n_rir=4, lr=400):
    rng = np.random.default_rng(seed)
    noise = rng.normal(0, 0.1, (n_noise, L)).astype(np.float32)
    rir = rng.normal(0, 1, (n_rir, lr)).astype(np.float32)
    rir /= np.sqrt(np.sum(rir ** 2, axis=1, keepdims=True))
    return AugmentBanks(
        jnp.asarray(noise),
        jnp.asarray(10 * np.log10(np.mean(noise ** 2, 1) + 1e-4)),
        jnp.full((n_noise,), 5.0), jnp.full((n_noise,), 15.0),
        jnp.asarray(rir))


def _encoder(loss):
    # remat + bf16 + BN-carrying backbone: the composition under test
    return SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=EMB,
                             channels=(16, 16, 16, 16, 48),
                             attention_channels=4, res2net_scale=4,
                             se_channels=4, remat=True),
        loss=loss, compute_dtype=jnp.bfloat16)


def _batch(b=8, seed=3):
    rng = np.random.default_rng(seed)
    wave = jnp.asarray(rng.normal(0, 0.1, (b, L)).astype(np.float32))
    label = jnp.asarray(np.arange(b) % N_CLASSES, jnp.int32)
    return wave, label


def _assert_step_advanced(host0, state1, metrics):
    """host0: a jax.device_get snapshot taken BEFORE the step — the
    donated step may have deleted (aliased) device buffers of the
    pre-step state."""
    assert np.isfinite(float(metrics["loss"])), metrics
    d_params = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                   for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1).params),
        jax.tree_util.tree_leaves(host0.params)))
    assert d_params > 0, "params did not move"
    d_stats = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                  for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1).batch_stats),
        jax.tree_util.tree_leaves(host0.batch_stats)))
    assert d_stats > 0, "batch stats did not update"
    # EMA leaf exists, is finite, and lags the post-update params
    ema = get_ema_params(jax.device_get(state1).opt_state)
    assert ema is not None
    leaves_e = jax.tree_util.tree_leaves(ema)
    leaves_p = jax.tree_util.tree_leaves(jax.device_get(state1).params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves_e)
    d_ema = sum(float(jnp.abs(a - b).sum())
                for a, b in zip(leaves_e, leaves_p))
    assert d_ema > 0, "EMA must lag the params after one step"


@pytest.mark.slow
def test_everything_on_dp_step():
    """DP x accum=2 x EMA x device env_corrupt x remat x bf16.

    Slow tier (like its DP×TP sibling below): one ~30 s compile whose
    constituent features are each default-tier covered."""
    from speakerverification_tpu.parallel import make_dp_train_step

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    enc = _encoder(build_loss("AAmSoftmax", nOut=EMB, nClasses=N_CLASSES))
    tx = build_optimizer("adam", learning_rate=1e-3, ema_decay=EMA_DECAY)
    wave, label = _batch()
    state = create_train_state(enc, tx, jax.random.PRNGKey(0), wave, label)
    host0 = jax.device_get(state)

    step = make_dp_train_step(
        enc, tx, mesh, compute_dtype=jnp.bfloat16,
        augment_fn=lambda w, r, b: device_env_corrupt(w, b, r),
        n_aug_args=1, accum_steps=2)
    from speakerverification_tpu.parallel import replicate_state
    state_r = replicate_state(state, mesh)
    s1, m1 = step(state_r, wave, label, jax.random.PRNGKey(1), 1e-3,
                  _banks())
    _assert_step_advanced(host0, s1, m1)
    # epoch-boundary bank refresh (same shapes, new values): same program
    s2, m2 = step(s1, wave, label, jax.random.PRNGKey(2), 1e-3,
                  _banks(seed=9))
    assert np.isfinite(float(m2["loss"]))
    assert int(jax.device_get(s2).step) == 2


@pytest.mark.slow
def test_everything_on_dp_tp_step():
    """DP x TP x accum=2 x EMA x device env_corrupt x remat x bf16."""
    from speakerverification_tpu.parallel import (
        make_dp_tp_train_step,
        shard_state_tp,
    )

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    enc = _encoder(ShardedAAmSoftmax(nOut=EMB, nClasses=N_CLASSES))
    tx = build_optimizer("adam", learning_rate=1e-3, ema_decay=EMA_DECAY)
    wave, label = _batch()
    state = create_train_state(enc, tx, jax.random.PRNGKey(0), wave, label)
    host0 = jax.device_get(state)
    state_s = shard_state_tp(state, mesh)

    step = make_dp_tp_train_step(
        enc, tx, mesh, state_s, compute_dtype=jnp.bfloat16,
        augment_fn=lambda w, r, b: device_env_corrupt(w, b, r),
        n_aug_args=1, accum_steps=2)
    s1, m1 = step(state_s, wave, label, jax.random.PRNGKey(1), 1e-3,
                  _banks())
    _assert_step_advanced(host0, s1, m1)
    # the loss head's class shard must stay sharded after the step
    # (EMA and optimizer moments ride the same specs)
    w_spec = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(s1.params):
        if "loss" in jax.tree_util.keystr(path) and leaf.ndim == 2:
            w_spec = leaf.sharding.spec
    # trailing None is normalized away: P('model') == P('model', None)
    assert w_spec is not None and w_spec[0] == "model", w_spec
    s2, m2 = step(s1, wave, label, jax.random.PRNGKey(2), 1e-3,
                  _banks(seed=9))
    assert np.isfinite(float(m2["loss"]))
