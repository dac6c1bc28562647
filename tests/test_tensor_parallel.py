"""Class-sharded (tensor-parallel) classifier over a 2-D data×model mesh.

The 4×2-sharded ShardedAAmSoftmax step must reproduce the single-device
AAmSoftmax step exactly (same init, same batch): identical loss/prec1
and identical updated parameters — including the gathered classifier
weight. Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import flax.linen as nn
import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import ShardedAAmSoftmax, build_loss
from speakerverification_tpu.optim import build_optimizer
from speakerverification_tpu.parallel import (
    make_dp_tp_train_step,
    make_mesh,
    shard_batch,
    shard_state_tp,
    tp_state_specs,
)
from speakerverification_tpu.training import create_train_state, make_train_step

N_CLASSES = 16
N_OUT = 8


class _BNFree(nn.Module):
    n_out: int = N_OUT

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(self.n_out)(x.mean(axis=1))


def _batch():
    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.1, (8, 2, 4000)).astype(np.float32)
    label = (np.arange(8, dtype=np.int32) * 2) % N_CLASSES
    return wave, label


def _make(loss):
    return SpeakerEncoder(backbone=_BNFree(), loss=loss)


def test_sharded_loss_matches_plain_outside_mesh():
    """Outside shard_map the module degrades to the plain computation."""
    plain = _make(build_loss("AAmSoftmax", nOut=N_OUT, nClasses=N_CLASSES))
    shard = _make(ShardedAAmSoftmax(nOut=N_OUT, nClasses=N_CLASSES))
    wave, label = _batch()
    v = plain.init(jax.random.PRNGKey(0), jnp.asarray(wave),
                   jnp.asarray(label))
    l1, p1 = plain.apply(v, jnp.asarray(wave), jnp.asarray(label))
    l2, p2 = shard.apply(v, jnp.asarray(wave), jnp.asarray(label))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(float(p1), float(p2), rtol=1e-6)


def test_tp_state_specs_target_only_loss_weight():
    model = _make(ShardedAAmSoftmax(nOut=N_OUT, nClasses=N_CLASSES))
    tx = build_optimizer("adam", learning_rate=1e-2)
    wave, label = _batch()
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label))
    specs = tp_state_specs(state, "model", 2)
    flat, _ = jax.tree_util.tree_flatten_with_path(specs)
    sharded_paths = [jax.tree_util.keystr(p) for p, s in flat
                     if s == P("model", None)]
    assert sharded_paths, "loss weight not found"
    assert all("weight" in p and "loss" in p for p in sharded_paths)
    # params + adam mu + nu
    assert len(sharded_paths) == 3, sharded_paths


def test_dp_tp_step_matches_single_device():
    """(data=4, model=2) sharded step == single-device full-batch step.

    Plain SGD so parameter updates are proportional to gradients (adam's
    first-step sign normalization turns ~0-gradient fp noise into ±lr)."""
    wave, label = _batch()
    tx = build_optimizer("sgd", learning_rate=0.1, momentum=0.0)

    single = _make(build_loss("AAmSoftmax", nOut=N_OUT, nClasses=N_CLASSES))
    state_s = create_train_state(single, tx, jax.random.PRNGKey(0),
                                 jnp.asarray(wave), jnp.asarray(label))
    step_s = jax.jit(make_train_step(single, tx))
    new_s, metrics_s = step_s(state_s, jnp.asarray(wave), jnp.asarray(label),
                              jax.random.PRNGKey(1), jnp.float32(1e-2))

    sharded = _make(ShardedAAmSoftmax(nOut=N_OUT, nClasses=N_CLASSES))
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    state_t = create_train_state(sharded, tx, jax.random.PRNGKey(0),
                                 jnp.asarray(wave), jnp.asarray(label))
    # identical init by construction (same param paths/seed)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_t.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state_t = shard_state_tp(state_t, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)
    step_t = make_dp_tp_train_step(sharded, tx, mesh, state_t, donate=False)
    new_t, metrics_t = step_t(state_t, batch["wave"], batch["label"],
                              jax.random.PRNGKey(1), jnp.float32(1e-2))

    np.testing.assert_allclose(float(metrics_t["loss"]),
                               float(metrics_s["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics_t["prec1"]),
                               float(metrics_s["prec1"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_s.params),
                    jax.tree_util.tree_leaves(new_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_dp_tp_second_step_stays_finite():
    wave, label = _batch()
    tx = build_optimizer("adam", learning_rate=1e-2)
    sharded = _make(ShardedAAmSoftmax(nOut=N_OUT, nClasses=N_CLASSES))
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    state = create_train_state(sharded, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label))
    state = shard_state_tp(state, mesh)
    batch = shard_batch({"wave": wave, "label": label}, mesh)
    step = make_dp_tp_train_step(sharded, tx, mesh, state, donate=False)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch["wave"], batch["label"],
                              jax.random.PRNGKey(i), jnp.float32(1e-2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_trainer_model_parallel_flag(tmp_path):
    """Trainer with distributed + model_parallel: 2 trains over the 4×2
    mesh through the standard config path (AAmSoftmax auto-mapped to its
    class-sharded twin by the builder)."""
    from speakerverification_tpu.data import write_wav
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.losses.sharded import ShardedAAmSoftmax
    from speakerverification_tpu.training.trainer import Trainer

    rng = np.random.default_rng(0)
    for s in range(16):
        for u in range(4):
            write_wav(tmp_path / "d" / f"spk{s:02d}" / f"u{u}.wav",
                      rng.normal(0, 0.1, 9000).astype(np.float32), 8000)
    generate_metadata(tmp_path / "d", tmp_path / "m", num_val_utts=0)

    hparams = {
        "distributed": True,
        "model_parallel": 2,
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
    assert isinstance(trainer.model.loss, ShardedAAmSoftmax)
    assert trainer.mesh is not None
    assert dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)) \
        == {"data": 4, "model": 2}
    result = trainer.fit()
    assert np.isfinite(result["min_loss"])
    # classifier weight stayed sharded over the model axis during training
    w = trainer.state.params["loss"]["weight"]
    assert w.shape == (16, 16)
    assert w.sharding.spec[0] == "model"


def test_dp_tp_rejects_non_divisible_classes():
    """nClasses not divisible by model_parallel must fail loudly — the
    silent fallback used to halve every update via grad_scale."""
    import pytest

    wave, label = _batch()
    tx = build_optimizer("adam", learning_rate=1e-2)
    sharded = _make(ShardedAAmSoftmax(nOut=N_OUT, nClasses=15))
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    state = create_train_state(sharded, tx, jax.random.PRNGKey(0),
                               jnp.asarray(wave), jnp.asarray(label % 15))
    with pytest.raises(ValueError, match="divisible"):
        make_dp_tp_train_step(sharded, tx, mesh, state, donate=False)


def test_trainer_model_parallel_requires_distributed(tmp_path):
    import pytest

    from speakerverification_tpu.training.trainer import Trainer

    hparams = {"model_parallel": 2, "seed": 0,
               "save_folder": str(tmp_path / "save"),
               "train_annotation": str(tmp_path / "none.csv")}
    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(hparams)
