"""Data-parallel shard_map training on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import build_loss
from speakerverification_tpu.models import build_model
from speakerverification_tpu.optim import build_optimizer
from speakerverification_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from speakerverification_tpu.training import create_train_state, make_train_step

SMALL = dict(channels=(32, 32, 32, 32, 96), kernel_sizes=(5, 3, 3, 3, 1),
             dilations=(1, 2, 3, 4, 1), attention_channels=8,
             res2net_scale=4, se_channels=8)


@pytest.fixture(scope="module")
def model_and_tx():
    model = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=16, **SMALL),
        loss=build_loss("AAmSoftmax", nOut=16, nClasses=8),
    )
    tx = build_optimizer("adam", learning_rate=1e-3)
    return model, tx


def test_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_mesh_shape_mismatch():
    with pytest.raises(ValueError):
        make_mesh(("data",), shape=[3])


@pytest.mark.slow        # ~21 s cold compile of the ECAPA+AdaBelief DP
                         # step; the same program class stays covered by
                         # default-tier tests: grad-accum-vs-DP equality
                         # (SGD DP step), metric-loss DP equality, the
                         # two-process psum test, and the driver dryrun
def test_dp_step_runs_and_replicates(model_and_tx):
    """ECAPA (per-shard BN) under 8-way DP runs finite and steps. Exact
    equality with single-device is checked on a BN-free backbone below —
    per-rank BN makes DP differ by design, the same semantics torch DDP
    has (SURVEY.md §7 hard part (d))."""
    model, tx = model_and_tx
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.1, (8, 2, 8000)).astype(np.float32)
    label = np.arange(8, dtype=np.int32)

    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label))
    state = replicate_state(state, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)

    step = make_dp_train_step(model, tx, mesh, donate=False)
    new_state, metrics = step(state, batch["wave"], batch["label"],
                              jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


class _BNFreeBackbone(__import__("flax").linen.Module):
    """Mean-pooled linear encoder: no BatchNorm, so DP == single-device
    exactly (ECAPA's per-shard BN makes DP differ by design — the same
    per-rank-BN semantics torch DDP has, SURVEY.md §7 hard part (d))."""
    n_out: int = 16

    @__import__("flax").linen.compact
    def __call__(self, x, train=False):
        import flax.linen as nn
        return nn.Dense(self.n_out)(x.mean(axis=1))


def test_dp_matches_single_device():
    """8-way DP gradient-mean must equal the single-device full-batch step."""
    model = SpeakerEncoder(backbone=_BNFreeBackbone(16),
                           loss=build_loss("AAmSoftmax", nOut=16, nClasses=8))
    tx = build_optimizer("adam", learning_rate=1e-3)
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    wave = rng.normal(0, 0.1, (8, 2, 8000)).astype(np.float32)
    label = np.arange(8, dtype=np.int32)

    state0 = create_train_state(model, tx, jax.random.PRNGKey(0),
                                jnp.asarray(wave), jnp.asarray(label))

    # single device, full batch
    single = jax.jit(make_train_step(model, tx))
    s1, m1 = single(state0, jnp.asarray(wave), jnp.asarray(label),
                    jax.random.PRNGKey(9), jnp.float32(1e-3))

    # 8-way DP
    dp = make_dp_train_step(model, tx, mesh, donate=False)
    sd = replicate_state(state0, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)
    s2, m2 = dp(sd, batch["wave"], batch["label"],
                jax.random.PRNGKey(9), jnp.float32(1e-3))

    # Losses must match: AAmSoftmax is per-example, so mean-of-shard-means
    # with equal shard sizes == full-batch mean.
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)

    # Parameters after one step must match within numeric tolerance.
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.slow        # shares the ECAPA+AdaBelief DP-step compile
                         # with test_dp_step_runs_and_replicates above —
                         # both must leave the default tier for the
                         # compile to actually drop out of it
def test_dp_multiple_steps_stay_finite(model_and_tx):
    model, tx = model_and_tx
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((8, 2, 8000), jnp.float32), jnp.zeros((8,), jnp.int32))
    state = replicate_state(state, mesh)
    step = make_dp_train_step(model, tx, mesh, donate=False)
    for i in range(3):
        wave = rng.normal(0, 0.1, (8, 2, 8000)).astype(np.float32)
        label = rng.integers(0, 8, 8).astype(np.int32)
        batch = shard_batch({"wave": wave, "label": label}, mesh)
        state, metrics = step(state, batch["wave"], batch["label"],
                              jax.random.PRNGKey(i), jnp.float32(1e-3))
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


def test_dp_metric_loss_gathers_global_batch():
    """gather_axis: metric losses see the FULL batch under shard_map DP —
    the DP loss must equal the single-device full-batch loss exactly for
    a BN-free encoder (improvement over per-rank DDP metric losses)."""
    model_dp = SpeakerEncoder(backbone=_BNFreeBackbone(16),
                              loss=build_loss("AngularProto"),
                              gather_axis="data")
    model_single = SpeakerEncoder(backbone=_BNFreeBackbone(16),
                                  loss=build_loss("AngularProto"))
    tx = build_optimizer("adam", learning_rate=1e-3)
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    wave = rng.normal(0, 0.1, (8, 2, 8000)).astype(np.float32)
    label = np.arange(8, dtype=np.int32)

    state = create_train_state(model_single, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label))
    single = jax.jit(make_train_step(model_single, tx))
    s1, m1 = single(state, jnp.asarray(wave), jnp.asarray(label),
                    jax.random.PRNGKey(9), jnp.float32(1e-3))

    dp = make_dp_train_step(model_dp, tx, mesh, donate=False)
    sd = replicate_state(state, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)
    s2, m2 = dp(sd, batch["wave"], batch["label"],
                jax.random.PRNGKey(9), jnp.float32(1e-3))

    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_trainer_distributed_flag(tmp_path):
    """Trainer with distributed: true runs shard_map DP over the virtual
    mesh through the standard CLI config path."""
    from speakerverification_tpu.data import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    rng = np.random.default_rng(0)
    for s in range(16):
        for u in range(4):
            write_wav(tmp_path / "d" / f"spk{s:02d}" / f"u{u}.wav",
                      rng.normal(0, 0.1, 9000).astype(np.float32), 8000)
    from speakerverification_tpu.data.manifest import generate_metadata
    generate_metadata(tmp_path / "d", tmp_path / "m", num_val_utts=0)

    hparams = {
        "distributed": True,
        "seed": 0,
        "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "m" / "train.csv"),
        "number_of_epochs": 1,
        "batch_size": 8,
        "lr": 1e-3,
        "nClasses": 16,
        "dataloader_options": {"batch_size": 8, "num_workers": 2,
                               "max_seg_per_spk": 10, "nPerSpeaker": 2},
        "audio_spec": {"sample_rate": 8000, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 40,
        "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "nOut": 16,
                  "channels": [32, 32, 32, 32, 96],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1],
                  "attention_channels": 8, "res2net_scale": 4,
                  "se_channels": 8},
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "optimizer": {"name": "adam", "weight_decay": 0.0},
        "callbacks": {"name": "steplr", "step_size": 10},
        "augment": False,
        "augment_options": {"augment_chain": []},
        "test_interval": -1,
        "save_model_last": True,
    }
    trainer = Trainer(hparams)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    result = trainer.fit()
    assert np.isfinite(result["min_loss"])


def test_trainer_distributed_bad_batch_size(tmp_path):
    from speakerverification_tpu.data import write_wav
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.training.trainer import Trainer
    rng = np.random.default_rng(1)
    for s in range(8):
        write_wav(tmp_path / "d" / f"s{s}" / "u0.wav",
                  rng.normal(0, 0.1, 9000).astype(np.float32), 8000)
        write_wav(tmp_path / "d" / f"s{s}" / "u1.wav",
                  rng.normal(0, 0.1, 9000).astype(np.float32), 8000)
    generate_metadata(tmp_path / "d", tmp_path / "m", num_val_utts=0)
    hparams = {
        "distributed": True, "seed": 0,
        "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "m" / "train.csv"),
        "batch_size": 6, "lr": 1e-3, "nClasses": 8,
        "dataloader_options": {"batch_size": 6, "num_workers": 1,
                               "nPerSpeaker": 2, "max_seg_per_spk": 10},
        "audio_spec": {"sample_rate": 8000, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 40, "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "nOut": 16,
                  "channels": [32, 32, 32, 32, 96],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1], "attention_channels": 8,
                  "res2net_scale": 4, "se_channels": 8},
        "criterion": {"name": "AAmSoftmax"},
        "optimizer": {"name": "adam"},
        "callbacks": {"name": "steplr"},
        "augment": False, "augment_options": {"augment_chain": []},
    }
    with pytest.raises(ValueError, match="must divide"):
        Trainer(hparams)


def test_builder_gates_gather_axis_on_single_device():
    """distributed: true on a 1-device host must NOT emit the metric-loss
    all_gather — the fallback jitted step has no 'data' axis bound and
    would crash with an unbound axis name (ADVICE r1, medium)."""
    from speakerverification_tpu.builder import encoder_from_hparams

    hparams = {
        "distributed": True, "n_mels": 40,
        "audio_spec": {"sample_rate": 8000, "win_len": 0.025, "hop_len": 0.01},
        "model": {"name": "ECAPA_TDNN", "nOut": 16,
                  "channels": [32, 32, 32, 32, 96],
                  "kernel_sizes": [5, 3, 3, 3, 1], "dilations": [1, 2, 3, 4, 1],
                  "attention_channels": 8, "res2net_scale": 4,
                  "se_channels": 8},
        "criterion": {"name": "AngularProto"},
        "nClasses": 8,
    }
    model = encoder_from_hparams(hparams, num_devices=1)
    assert model.gather_axis is None
    model8 = encoder_from_hparams(hparams, num_devices=8)
    assert model8.gather_axis == "data"

    tx = build_optimizer("adam", learning_rate=1e-3)
    rng = np.random.default_rng(7)
    wave = jnp.asarray(rng.normal(0, 0.1, (4, 2, 8000)).astype(np.float32))
    label = jnp.arange(4, dtype=jnp.int32)
    # the previously-crashing path: plain jitted step, no mesh. The
    # regression (unbound 'data' axis from the metric-loss all_gather)
    # fires at TRACE time, so lowering alone exercises it — no need to
    # pay the XLA compile of this unique (4,2,8000)+AngularProto shape
    state = create_train_state(model, tx, jax.random.PRNGKey(0), wave, label)
    step = jax.jit(make_train_step(model, tx))
    lowered = step.lower(state, wave, label, jax.random.PRNGKey(1),
                         jnp.float32(1e-3))
    txt = lowered.as_text()
    assert "all-gather" not in txt and "all_gather" not in txt


@pytest.mark.slow
def test_dp_step_bf16_mixed_precision(model_and_tx):
    """compute_dtype forwards through make_dp_train_step (ADVICE r1)."""
    model, tx = model_and_tx
    mesh = make_mesh()
    rng = np.random.default_rng(11)
    wave = rng.normal(0, 0.1, (8, 2, 8000)).astype(np.float32)
    label = np.arange(8, dtype=np.int32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label))
    state = replicate_state(state, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)
    step = make_dp_train_step(model, tx, mesh, donate=False,
                              compute_dtype=jnp.bfloat16)
    state, metrics = step(state, batch["wave"], batch["label"],
                          jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    # master params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params)
               if jnp.issubdtype(p.dtype, jnp.floating))


@pytest.mark.slow    # ~26 s cold: compiles BOTH an accum step and a DP step;
# default tier keeps DP equality (test_dp_matches_single_device) and the
# accum API surface (test_grad_accumulation_rejects_indivisible_batch)
def test_grad_accumulation_matches_dp(model_and_tx):
    """accum_steps=k is sequential data parallelism: microbatch grads
    and BN stats averaged from the same starting stats — so a k-way
    accumulated single-device step must match a k-device DP step on the
    same batch (contiguous split both ways; no stochastic layers in
    this model, so rng streams don't enter). SGD, not Adam: Adam's normalized
    update turns float-noise-level gradient differences on near-zero
    coordinates into ±lr sign flips, which says nothing about the
    accumulation math — with SGD the one-step parameter delta is
    exactly lr × the mean gradient."""
    model, _ = model_and_tx
    tx = build_optimizer("sgd", learning_rate=1e-2)
    mesh = make_mesh(("data",))
    rng = np.random.default_rng(7)

    wave0 = rng.normal(0, .1, (8, 2, 8000)).astype(np.float32)
    lab0 = np.arange(8, dtype=np.int32)
    s1 = create_train_state(model, tx, jax.random.PRNGKey(0),
                            jnp.asarray(wave0), jnp.asarray(lab0))
    s2 = replicate_state(s1, mesh)

    accum = jax.jit(make_train_step(model, tx, accum_steps=8))
    dp = make_dp_train_step(model, tx, mesh, donate=False)
    # ONE step: with SGD the param delta IS lr × the mean gradient, so
    # this compares the accumulated gradient itself; a second step would
    # re-run the forward on perturbed params and BN's rsqrt(var+eps)
    # amplifies float32 noise chaotically without testing anything new
    wave = rng.normal(0, .1, (8, 2, 8000)).astype(np.float32)
    lab = rng.integers(0, 8, 8).astype(np.int32)
    s1, m1 = accum(s1, jnp.asarray(wave), jnp.asarray(lab),
                   jax.random.PRNGKey(1), jnp.float32(1e-2))
    b = shard_batch({"wave": wave, "label": lab}, mesh)
    s2, m2 = dp(s2, b["wave"], b["label"], jax.random.PRNGKey(1),
                jnp.float32(1e-2))
    # sequential adds vs psum tree reduction: order-of-summation
    # noise only (measured ~1e-5 rel)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["prec1"]), float(m2["prec1"]),
                               rtol=1e-4)
    for a, d in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                   rtol=5e-4, atol=5e-6)
    for a, d in zip(
            jax.tree_util.tree_leaves(s1.batch_stats),
            jax.tree_util.tree_leaves(jax.device_get(s2.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                   rtol=5e-4, atol=5e-6)


def test_grad_accumulation_rejects_indivisible_batch(model_and_tx):
    model, tx = model_and_tx
    rng = np.random.default_rng(0)
    # batch 8 reuses the module's cached (8, 2, 8000) init compile — the
    # rejection itself fires at trace time, before any step compile
    wave = jnp.asarray(rng.normal(0, .1, (8, 2, 8000)).astype(np.float32))
    lab = jnp.asarray(np.arange(8, dtype=np.int32))
    s = create_train_state(model, tx, jax.random.PRNGKey(0), wave, lab)
    step = jax.jit(make_train_step(model, tx, accum_steps=3))
    with pytest.raises(ValueError, match="accumulate_steps"):
        step(s, wave, lab, jax.random.PRNGKey(0), jnp.float32(1e-3))


def test_eval_embed_data_parallel_exact(model_and_tx):
    """Single-process multi-device extraction (make_eval_embed_fn
    devices=...) must equal the single-device path exactly: embedding is
    per-row math (eval BN uses running stats), row-sharding changes the
    device layout, not the instructions. Covers both the divisible case
    and the row-repetition pad (B=13 on 8 devices)."""
    from speakerverification_tpu.training import make_eval_embed_fn

    model, tx = model_and_tx
    rng = np.random.default_rng(3)
    wave0 = rng.normal(0, .1, (8, 2, 8000)).astype(np.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave0),
                               jnp.asarray(np.arange(8, dtype=np.int32)))

    single = make_eval_embed_fn(model)
    dp = make_eval_embed_fn(model, devices=jax.devices())
    for B in (16, 13):                      # divisible + pad path
        wave = rng.normal(0, .1, (B, 8000)).astype(np.float32)
        e1 = np.asarray(single(state.params, state.batch_stats,
                               jnp.asarray(wave)))
        e2_dev = dp(state.params, state.batch_stats, jnp.asarray(wave))
        # downstream scoring consumes the sharded array directly —
        # make sure device-resident ops on it work before materializing
        sums = np.asarray(jnp.sum(e2_dev * e2_dev, axis=-1))
        e2 = np.asarray(e2_dev)
        assert e2.shape == (B, 16)
        np.testing.assert_allclose(e2, e1, rtol=0, atol=1e-6)
        np.testing.assert_allclose(sums, (e1 * e1).sum(-1),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_batchnorm_drift_bounded(model_and_tx):
    """Quantify the per-shard-BN divergence (VERDICT r1 weak #7): after 3
    training steps of DP vs single-device full-batch, the produced
    EMBEDDINGS must still agree to cosine > 0.95 (measured: min 0.9947
    for 2-way DP, min 0.9597 for the 8-way mesh used here — batch 8
    split to ONE speaker-tuple per shard is the worst realistic case).

    Per-shard BN makes the LOSSES legitimately differ (up to ~12% rel
    here, same semantics as torch DDP's per-rank BN) — the bound asserts
    the divergence stays functionally irrelevant at the embedding level,
    which is what eval consumes.
    """
    from speakerverification_tpu.training import make_eval_embed_fn

    model, tx = model_and_tx
    # full 8-device mesh: the dp step compiles to the same program as
    # test_dp_step_runs_and_replicates, so the persistent cache dedupes
    mesh = make_mesh(("data",))
    rng = np.random.default_rng(0)
    wave0 = rng.normal(0, .1, (8, 2, 8000)).astype(np.float32)
    lab0 = np.arange(8, dtype=np.int32)
    s1 = create_train_state(model, tx, jax.random.PRNGKey(0),
                            jnp.asarray(wave0), jnp.asarray(lab0))
    s2 = replicate_state(s1, mesh)
    single = jax.jit(make_train_step(model, tx))
    dp = make_dp_train_step(model, tx, mesh, donate=False)
    for i in range(3):
        wave = rng.normal(0, .1, (8, 2, 8000)).astype(np.float32)
        lab = rng.integers(0, 8, 8).astype(np.int32)
        s1, _ = single(s1, jnp.asarray(wave), jnp.asarray(lab),
                       jax.random.PRNGKey(i), jnp.float32(1e-3))
        b = shard_batch({"wave": wave, "label": lab}, mesh)
        s2, _ = dp(s2, b["wave"], b["label"], jax.random.PRNGKey(i),
                   jnp.float32(1e-3))

    embed = make_eval_embed_fn(model)
    test_wave = jnp.asarray(rng.normal(0, .1, (4, 8000)).astype(np.float32))
    e1 = embed(s1.params, s1.batch_stats, test_wave)
    e2 = embed(jax.device_get(s2.params), jax.device_get(s2.batch_stats),
               test_wave)
    cos = np.asarray(jnp.sum(e1 * e2, axis=-1))
    assert cos.min() > 0.95, f"BN-under-DP drift too large: cos={cos}"


@pytest.mark.slow
def test_grad_accumulation_composes_with_dp(model_and_tx):
    """DP(8 shards) x accum_steps=2 == single-device accum_steps=16 on
    the same 16-tuple batch: each shard scans its 2 microbatches, the
    pmean then matches the 16-microbatch mean (one SGD step, same
    rationale as test_grad_accumulation_matches_dp)."""
    model, _ = model_and_tx
    tx = build_optimizer("sgd", learning_rate=1e-2)
    mesh = make_mesh(("data",))
    rng = np.random.default_rng(11)

    wave0 = rng.normal(0, .1, (16, 2, 8000)).astype(np.float32)
    lab0 = np.tile(np.arange(8, dtype=np.int32), 2)
    s1 = create_train_state(model, tx, jax.random.PRNGKey(0),
                            jnp.asarray(wave0[:8]), jnp.asarray(lab0[:8]))
    s2 = replicate_state(s1, mesh)

    accum16 = jax.jit(make_train_step(model, tx, accum_steps=16))
    dp_accum = make_dp_train_step(model, tx, mesh, donate=False,
                                  accum_steps=2)
    wave = rng.normal(0, .1, (16, 2, 8000)).astype(np.float32)
    lab = rng.integers(0, 8, 16).astype(np.int32)
    s1, m1 = accum16(s1, jnp.asarray(wave), jnp.asarray(lab),
                     jax.random.PRNGKey(1), jnp.float32(1e-2))
    b = shard_batch({"wave": wave, "label": lab}, mesh)
    s2, m2 = dp_accum(s2, b["wave"], b["label"], jax.random.PRNGKey(1),
                      jnp.float32(1e-2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, d in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                   rtol=5e-4, atol=5e-6)
