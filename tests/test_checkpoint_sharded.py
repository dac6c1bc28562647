"""Orbax sharded checkpointing (training/checkpoint_sharded.py):
per-shard writes without host gather, async saves, manager retention,
and backend-agnostic restore dispatch.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speakerverification_tpu.training.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    load_params_only,
)
from speakerverification_tpu.training.checkpoint_sharded import (
    async_save_sharded,
    is_sharded_checkpoint,
    restore_sharded,
    save_sharded,
    wait,
)
from speakerverification_tpu.training.state import TrainState


def _mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _tp_state(mesh, tx=None, seed=0):
    """A tiny TrainState with one leaf sharded P('model', None) — the
    shape of a tensor-parallel classifier head (parallel/tp.py)."""
    rng = np.random.default_rng(seed)
    w = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (8, 6)).astype(np.float32)),
        NamedSharding(mesh, P("model", None)))
    dense = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (4, 4)).astype(np.float32)),
        NamedSharding(mesh, P()))
    params = {"loss": {"weight": w}, "backbone": {"kernel": dense}}
    tx = tx or optax.adam(1e-3)
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params)), tx


def test_sharded_roundtrip_preserves_sharding(tmp_path):
    mesh = _mesh2d()
    state, _ = _tp_state(mesh)
    p = save_sharded(tmp_path / "ck", state, meta={"loss": 0.5})
    assert is_sharded_checkpoint(p)
    assert json.loads((tmp_path / "ck.json").read_text())["loss"] == 0.5

    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    back = restore_sharded(p, zero)
    np.testing.assert_array_equal(
        np.asarray(back.params["loss"]["weight"]),
        np.asarray(state.params["loss"]["weight"]))
    assert (back.params["loss"]["weight"].sharding.spec
            == P("model", None))
    # dispatching loader takes the same path
    back2 = load_checkpoint(p, zero)
    np.testing.assert_array_equal(
        np.asarray(back2.params["backbone"]["kernel"]),
        np.asarray(state.params["backbone"]["kernel"]))


def test_async_save_then_wait(tmp_path):
    mesh = _mesh2d()
    state, _ = _tp_state(mesh, seed=1)
    p = async_save_sharded(tmp_path / "ck_async", state, meta={"loss": 1.0})
    wait(p)
    assert is_sharded_checkpoint(p)
    back = restore_sharded(p, jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_array_equal(
        np.asarray(back.params["loss"]["weight"]),
        np.asarray(state.params["loss"]["weight"]))


def test_params_only_across_optimizers(tmp_path):
    """A sharded checkpoint written under adam restores weights into an
    AdaBelief state — the optimizer trees never have to match."""
    from speakerverification_tpu.optim import build_optimizer

    mesh = _mesh2d()
    state, _ = _tp_state(mesh, seed=2)
    p = save_sharded(tmp_path / "ck", state)

    tx2 = build_optimizer("AdaBelief", 1e-3)
    fresh, _ = _tp_state(mesh, tx=tx2, seed=3)
    merged = load_params_only(p, fresh)
    np.testing.assert_array_equal(
        np.asarray(merged.params["loss"]["weight"]),
        np.asarray(state.params["loss"]["weight"]))
    # optimizer state untouched (still AdaBelief's)
    assert jax.tree_util.tree_structure(merged.opt_state) \
        == jax.tree_util.tree_structure(fresh.opt_state)


def test_manager_sharded_retention(tmp_path):
    mesh = _mesh2d()
    mgr = CheckpointManager(tmp_path, top_k=2, backend="sharded")

    s1, tx = _tp_state(mesh, seed=4)
    mgr.save_epoch(s1, epoch=1, loss=2.0, lr=0.1)
    s2 = s1.replace(step=s1.step + 1)
    mgr.save_epoch(s2, epoch=2, loss=1.0, lr=0.1)   # better: rotates
    mgr.save_epoch(s2, epoch=3, loss=1.5, lr=0.1)   # worse: last only

    for name in ("best_state", "best_state_top1", "best_state_top2",
                 "last_state"):
        assert is_sharded_checkpoint(tmp_path / name), name
    assert mgr.latest() == tmp_path / "last_state"
    # best carries epoch-2 meta; manager reseeds best-loss from it
    assert json.loads((tmp_path / "best_state.json").read_text())["loss"] == 1.0
    mgr2 = CheckpointManager(tmp_path, top_k=2, backend="sharded")
    assert mgr2._best_loss == 1.0

    back = load_checkpoint(mgr.latest(),
                           jax.tree_util.tree_map(jnp.zeros_like, s2))
    assert int(back.step) == int(s2.step)


def test_select_weights_finds_sharded_dir(tmp_path):
    from speakerverification_tpu.inference import _select_weights

    mesh = _mesh2d()
    state, _ = _tp_state(mesh, seed=5)
    save_sharded(tmp_path / "best_state", state)
    assert _select_weights({}, tmp_path) == tmp_path / "best_state"
    # per-epoch dirs found when best/last are absent
    (tmp_path / "best_state").rename(tmp_path / "model_state_000003")
    assert _select_weights({}, tmp_path) == tmp_path / "model_state_000003"


@pytest.mark.slow
def test_trainer_sharded_checkpoints_end_to_end(tmp_path):
    """Trainer with sharded_checkpoints: true trains, writes orbax dirs,
    and resumes from them."""
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    SR = 8000
    rng = np.random.default_rng(11)
    data = tmp_path / "data"
    for spk in range(4):
        for utt in range(3):
            t = np.arange(int(1.2 * SR)) / SR
            sig = 0.3 * np.sin(2 * np.pi * (150 + 70 * spk) * t) \
                + rng.normal(0, 0.02, len(t))
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      sig.astype(np.float32), SR)
    generate_metadata(data, tmp_path / "meta", num_val_utts=0)

    hparams = {
        "seed": 5, "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "meta" / "train.csv"),
        "number_of_epochs": 1, "batch_size": 4, "lr": 0.005,
        "nClasses": 4, "sharded_checkpoints": True,
        "dataloader_options": {"batch_size": 4, "num_workers": 1,
                               "nPerSpeaker": 1, "max_seg_per_spk": 100},
        "audio_spec": {"sample_rate": SR, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 24, "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "feature_type": "melspectrogram",
                  "nOut": 16, "channels": [16, 16, 16, 16, 48],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1], "attention_channels": 4,
                  "res2net_scale": 4, "se_channels": 4},
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "optimizer": {"name": "adam", "weight_decay": 0.0},
        "callbacks": {"name": "steplr"},
        "test_interval": -1, "save_model_last": True,
        "ckpt_interval_minutes": -1,
    }
    tr = Trainer(hparams)
    tr.fit()
    run = tmp_path / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
    assert is_sharded_checkpoint(run / "last_state")
    assert is_sharded_checkpoint(run / "best_state")

    # resume continues from the sharded last_state (resume happens in
    # _init_state on the first batch, so check after fit)
    hparams["number_of_epochs"] = 2
    tr2 = Trainer(hparams)
    tr2.fit()
    assert tr2.init_epoch == 2
    assert tr2.ckpt.resume_meta()["epoch"] == 2


def test_overwrite_is_atomic_and_tmp_free(tmp_path):
    """Re-saving over an existing checkpoint must write to a tmp
    sibling and swap — the previous copy survives until the new one is
    durable, and nothing hidden is left behind."""
    mesh = _mesh2d()
    s1, _ = _tp_state(mesh, seed=6)
    s2 = s1.replace(step=s1.step + 5)
    p = save_sharded(tmp_path / "ck", s1)
    p = save_sharded(tmp_path / "ck", s2)
    back = restore_sharded(p, jax.tree_util.tree_map(jnp.zeros_like, s2))
    assert int(back.step) == 5
    assert not list(tmp_path.glob(".*tmp*"))


def test_backend_toggle_resumes_newest(tmp_path):
    """A run that toggles sharded_checkpoints must keep resuming from
    the newest checkpoint regardless of its format."""
    import os

    mesh = _mesh2d()
    state, _ = _tp_state(mesh, seed=7)
    m_msg = CheckpointManager(tmp_path, backend="msgpack")
    m_msg.save_epoch(state, epoch=1, loss=2.0, lr=0.1)
    # toggled ON: the msgpack last_state is still the newest
    m_sh = CheckpointManager(tmp_path, backend="sharded")
    assert m_sh.latest() == tmp_path / "last_state.msgpack"
    assert m_sh._best_loss == 2.0          # seeded across formats
    # a newer sharded save wins; backdate the msgpack file to be sure
    os.utime(tmp_path / "last_state.msgpack", (1, 1))
    m_sh.save_epoch(state, epoch=2, loss=1.5, lr=0.1)
    assert m_sh.latest() == tmp_path / "last_state"
    # toggled back OFF: the sharded one is newest now
    m_back = CheckpointManager(tmp_path, backend="msgpack")
    assert m_back.latest() == tmp_path / "last_state"

    from speakerverification_tpu.inference import _select_weights
    assert _select_weights({}, tmp_path) == tmp_path / "best_state"


def test_preempt_snapshot_cleared_by_per_epoch_save(tmp_path):
    """In per-epoch mode a preemption snapshot (last_state) must be
    superseded by the next completed epoch, or latest() would resume
    from it forever."""
    mesh = _mesh2d()
    state, _ = _tp_state(mesh, seed=8)
    mgr = CheckpointManager(tmp_path, save_per_epoch=True,
                            backend="msgpack")
    mgr.save_epoch(state, epoch=1, loss=2.0, lr=0.1)
    mgr.save_interrupt(state, epoch_unfinished=2, lr=0.1,
                       best_loss=float("inf"))
    assert mgr.latest() == tmp_path / "last_state.msgpack"
    meta = json.loads((tmp_path / "model_state_log.json").read_text())
    assert meta["preempted"] and meta["epoch"] == 1
    assert "loss" not in meta              # inf kept out: strict JSON
    json.loads((tmp_path / "model_state_log.json").read_text(),
               parse_constant=lambda c: (_ for _ in ()).throw(
                   ValueError(f"non-strict JSON constant {c}")))
    # epoch 2 completes after resume: snapshot cleared
    mgr.save_epoch(state, epoch=2, loss=1.8, lr=0.1)
    assert not (tmp_path / "last_state.msgpack").exists()
    assert mgr.latest() == tmp_path / "model_state_000002.msgpack"


def test_load_ema_params_from_sharded(tmp_path):
    """EMA extraction (use_ema serving) from an orbax sharded checkpoint:
    the EMA tree is located by key in the stored opt_state, no matter
    which optimizer wrote it; a no-EMA sharded checkpoint returns None."""
    from speakerverification_tpu.optim import build_optimizer, get_ema_params
    from speakerverification_tpu.training.checkpoint import load_ema_params

    mesh = _mesh2d()
    tx = build_optimizer("sgd", learning_rate=0.1, ema_decay=0.5)
    state, _ = _tp_state(mesh, tx=tx, seed=4)
    # one update so the EMA differs from the raw params
    g = jax.tree_util.tree_map(jnp.ones_like, state.params)
    from speakerverification_tpu.optim import set_learning_rate
    opt_state = set_learning_rate(state.opt_state, jnp.float32(0.1))
    updates, opt_state = tx.update(g, opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    state = state.replace(params=new_params, opt_state=opt_state)

    p = save_sharded(tmp_path / "ck_ema", state)
    template, _ = _tp_state(mesh, tx=tx, seed=5)
    out = load_ema_params(p, template)
    assert out is not None
    expect = get_ema_params(state.opt_state)
    np.testing.assert_allclose(
        np.asarray(out.params["loss"]["weight"]),
        np.asarray(expect["loss"]["weight"]), rtol=1e-6)
    assert not np.allclose(np.asarray(out.params["loss"]["weight"]),
                           np.asarray(new_params["loss"]["weight"]))

    state0, _ = _tp_state(mesh, seed=6)          # plain adam, no EMA
    p0 = save_sharded(tmp_path / "ck_noema", state0)
    assert load_ema_params(p0, template) is None


def test_sharded_restore_reshards_to_new_mesh(tmp_path):
    """Elastic resume: a checkpoint written under a 4x2 data x model mesh
    restores into a 2x2 template (different device count and shard
    widths) — orbax reshards to the template's shardings, so a job can
    resume on a different slice size."""
    mesh_big = _mesh2d()                               # 4 x 2 over 8 devs
    state, tx = _tp_state(mesh_big, seed=9)
    p = save_sharded(tmp_path / "ck_elastic", state)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh_small = Mesh(devs, ("data", "model"))
    template, _ = _tp_state(mesh_small, tx=tx, seed=10)
    zero = jax.tree_util.tree_map(jnp.zeros_like, template)
    back = restore_sharded(p, zero)

    np.testing.assert_array_equal(
        np.asarray(back.params["loss"]["weight"]),
        np.asarray(state.params["loss"]["weight"]))
    # the restored leaf lives on the NEW mesh with the template's spec
    assert back.params["loss"]["weight"].sharding.mesh.shape == {
        "data": 2, "model": 2}
    assert back.params["loss"]["weight"].sharding.spec == P("model", None)
