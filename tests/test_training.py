"""Train step, specaugment, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import build_loss
from speakerverification_tpu.models import build_model
from speakerverification_tpu.ops.specaugment import SpecAugmentConfig, spec_augment
from speakerverification_tpu.optim import build_optimizer
from speakerverification_tpu.training import (
    create_train_state,
    make_eval_embed_fn,
    make_train_step,
)
from speakerverification_tpu.training.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)

SMALL = dict(channels=(32, 32, 32, 32, 96), kernel_sizes=(5, 3, 3, 3, 1),
             dilations=(1, 2, 3, 4, 1), attention_channels=8,
             res2net_scale=4, se_channels=8)


@pytest.fixture(scope="module")
def setup():
    model = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=16, **SMALL),
        loss=build_loss("AAmSoftmax", nOut=16, nClasses=4, margin=0.2, scale=30),
    )
    tx = build_optimizer("adam", learning_rate=1e-3)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(0, 0.1, (4, 2, 8000)).astype(np.float32))
    label = jnp.asarray([0, 1, 2, 3])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), wave, label)
    return model, tx, state, wave, label


def test_train_step_reduces_loss(setup):
    model, tx, state, wave, label = setup
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for i in range(8):
        state, metrics = step(state, wave, label,
                              jax.random.PRNGKey(i), jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


@pytest.mark.slow
def test_train_step_with_specaugment_compiles():
    """SpecAugment traces into the train step (random masks per step)."""
    model = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=16, **SMALL),
        loss=build_loss("AAmSoftmax", nOut=16, nClasses=4),
        spec_augment=SpecAugmentConfig(time_warp=False),
    )
    tx = build_optimizer("adam", learning_rate=1e-3)
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.normal(0, 0.1, (2, 2, 8000)).astype(np.float32))
    label = jnp.asarray([0, 1])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), wave, label)
    step = jax.jit(make_train_step(model, tx))
    state, m = step(state, wave, label, jax.random.PRNGKey(0), jnp.float32(1e-3))
    assert np.isfinite(float(m["loss"]))


def test_eval_embed(setup):
    model, tx, state, wave, label = setup
    embed = make_eval_embed_fn(model, normalize=True)
    out = embed(state.params, state.batch_stats, wave[:, 0, :])
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, rtol=1e-5)


def test_specaugment_masks():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5.0, 1.0, (2, 100, 80)).astype(np.float32))
    cfg = SpecAugmentConfig(time_warp=False, freq_mask_width=(5, 10),
                            time_mask_width=(5, 10))
    y = spec_augment(jax.random.PRNGKey(0), x, cfg)
    assert y.shape == x.shape
    # some values must be zeroed
    assert float(jnp.mean((y == 0).astype(jnp.float32))) > 0.01
    # deterministic per key
    y2 = spec_augment(jax.random.PRNGKey(0), x, cfg)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # different keys differ
    y3 = spec_augment(jax.random.PRNGKey(1), x, cfg)
    assert not np.array_equal(np.asarray(y), np.asarray(y3))


def test_specaugment_time_warp_shape():
    x = jnp.ones((2, 100, 80))
    cfg = SpecAugmentConfig(time_warp=True, freq_mask=False, time_mask=False)
    y = spec_augment(jax.random.PRNGKey(0), x, cfg)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_checkpoint_roundtrip(tmp_path, setup):
    model, tx, state, wave, label = setup
    p = save_checkpoint(tmp_path / "state.msgpack", state, {"epoch": 3})
    restored = load_checkpoint(p, state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params)


def test_restore_into_tolerates_mismatch():
    params = {"a": {"w": jnp.zeros((3, 3))}, "b": jnp.zeros(2)}
    saved = {"a": {"w": jnp.ones((3, 3))}, "b": jnp.ones(5)}   # b mismatched
    merged, skipped = restore_into(params, saved)
    np.testing.assert_array_equal(np.asarray(merged["a"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["b"]), 0.0)
    assert any("b" in s for s in skipped)


def test_restore_into_skips_are_leaf_granular():
    """A missing SUBTREE must be reported leaf-by-leaf: the
    wrong-architecture guard in load_params_only compares len(skipped)
    to the model's leaf count (review finding r3)."""
    params = {"blk": {"w": jnp.zeros((2,)), "b": jnp.zeros((2,)),
                      "inner": {"k": jnp.zeros((2,))}},
              "top": jnp.zeros((2,))}
    merged, skipped = restore_into(params, {"nothing": jnp.ones(1)})
    assert len(skipped) == 4                      # every leaf, not 2 keys
    merged, skipped = restore_into(params, "not-a-dict")
    assert len(skipped) == 4


def test_load_params_only_raises_on_wrong_architecture(tmp_path, setup):
    """initial_model_infer pointed at a checkpoint that matches NOTHING
    must raise, not silently serve random init (review finding r3;
    MIGRATION.md documents the raise)."""
    import flax.serialization as fser

    from speakerverification_tpu.training.checkpoint import load_params_only

    model, tx, state, wave, label = setup
    bogus = {"params": {"backbone": {"SomethingElse_0":
                                     {"kernel": np.zeros((3, 3))}}}}
    p = tmp_path / "wrong.msgpack"
    p.write_bytes(fser.msgpack_serialize(bogus))
    with pytest.raises(ValueError, match="wrong architecture"):
        load_params_only(p, state)

    # a coincidentally matching LOSS head must not green-light a
    # wrong-architecture backbone (review finding r3): the guard is
    # per present top-level subtree, not all-leaves-missed
    loss_tree = jax.device_get(state.params)["loss"]
    half = {"params": {"backbone": {"Nope_0": {"kernel": np.zeros((2, 2))}},
                       "loss": loss_tree}}
    p2 = tmp_path / "half.msgpack"
    p2.write_bytes(fser.msgpack_serialize(half))
    with pytest.raises(ValueError, match="backbone.*wrong architecture"):
        load_params_only(p2, state)

    # while a PARTIAL artifact that simply omits subtrees still loads
    # (converter artifacts carry no loss head)
    backbone_tree = jax.device_get(state.params)["backbone"]
    part = {"params": {"backbone": backbone_tree}}
    p3 = tmp_path / "partial.msgpack"
    p3.write_bytes(fser.msgpack_serialize(part))
    loaded = load_params_only(p3, state)
    assert loaded is not None

    # and the FINE-TUNE case stays tolerant: leaf names line up but the
    # head's shape differs (new nClasses) → kept at init with a note,
    # NOT a wrong-architecture raise (review finding r3)
    loss_tree2 = {k: np.zeros((7,) + np.shape(v)[1:], np.float32)
                  for k, v in jax.device_get(state.params)["loss"].items()}
    ft = {"params": {"backbone": backbone_tree, "loss": loss_tree2}}
    p4 = tmp_path / "finetune.msgpack"
    p4.write_bytes(fser.msgpack_serialize(ft))
    loaded = load_params_only(p4, state)
    np.testing.assert_array_equal(          # head untouched (shape skip)
        np.asarray(loaded.params["loss"]["weight"]),
        np.asarray(state.params["loss"]["weight"]))

    # matching names but EVERY shape mismatched (a different channels
    # config) must raise, not silently serve 100% random init
    allwrong = jax.tree_util.tree_map(
        lambda a: np.zeros(np.shape(a) + (2,), np.float32),
        jax.device_get(state.params))
    p5 = tmp_path / "allwrong.msgpack"
    p5.write_bytes(fser.msgpack_serialize({"params": allwrong}))
    with pytest.raises(ValueError, match="no param leaf restored"):
        load_params_only(p5, state)


def test_checkpoint_manager_policy(tmp_path, setup):
    model, tx, state, wave, label = setup
    mgr = CheckpointManager(tmp_path, top_k=3)
    r1 = mgr.save_epoch(state, epoch=0, loss=1.0, lr=1e-3)
    assert r1["best"]
    r2 = mgr.save_epoch(state, epoch=1, loss=0.5, lr=1e-3)
    assert r2["best"]
    r3 = mgr.save_epoch(state, epoch=2, loss=0.9, lr=1e-3)   # worse
    assert not r3["best"]
    assert (tmp_path / "best_state.msgpack").exists()
    assert (tmp_path / "best_state_top1.msgpack").exists()
    assert (tmp_path / "best_state_top2.msgpack").exists()
    assert (tmp_path / "last_state.msgpack").exists()
    assert mgr.latest().name == "last_state.msgpack"
    assert mgr.resume_meta()["epoch"] == 2


def test_checkpoint_manager_best_survives_restart(tmp_path, setup):
    """A fresh manager on an existing run dir must not let a worse first
    epoch clobber best_state (ADVICE r1: _best_loss reset on resume)."""
    model, tx, state, wave, label = setup
    mgr = CheckpointManager(tmp_path, top_k=3)
    assert mgr.save_epoch(state, epoch=0, loss=0.3, lr=1e-3)["best"]

    mgr2 = CheckpointManager(tmp_path, top_k=3)          # simulated restart
    assert not mgr2.save_epoch(state, epoch=1, loss=0.9, lr=1e-3)["best"]
    import json
    meta = json.loads((tmp_path / "best_state.msgpack.json").read_text())
    assert meta["loss"] == 0.3
    assert mgr2.save_epoch(state, epoch=2, loss=0.1, lr=1e-3)["best"]


def test_preemption_checkpoint_and_resume(tmp_path):
    """A SIGTERM-style preemption mid-run writes last_state with the
    epoch marked unfinished and fit() returns cleanly; the next run
    resumes and re-trains the interrupted epoch."""
    import json

    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    SR = 8000
    rng = np.random.default_rng(13)
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
        "number_of_epochs": 4, "batch_size": 4, "lr": 0.005,
        "nClasses": 4,
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

    class Preempted(Trainer):
        def train_epoch(self, epoch):
            if epoch == 2:
                self._preempt = True     # what the SIGTERM handler sets
            return super().train_epoch(epoch)

    tr = Preempted(hparams)
    tr.fit()
    run = tmp_path / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
    meta = json.loads((run / "model_state_log.json").read_text())
    assert meta["preempted"] is True
    assert meta["epoch"] == 1            # epoch 2 marked unfinished
    assert (run / "last_state.msgpack").exists()

    tr2 = Trainer(hparams)               # fresh run resumes
    tr2.fit()
    assert tr2.init_epoch == 2           # re-ran the interrupted epoch
    meta2 = json.loads((run / "model_state_log.json").read_text())
    assert meta2["epoch"] == 4 and "preempted" not in meta2


def test_average_checkpoints(tmp_path):
    """Uniform model-soup averaging across saved checkpoints."""
    import optax

    from speakerverification_tpu.training.checkpoint import (
        average_checkpoints,
        save_checkpoint,
    )
    from speakerverification_tpu.training.state import TrainState

    def mk(w, v):
        params = {"w": jnp.full((3,), w)}
        tx = optax.adam(1e-3)
        return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                          batch_stats={"bn": {"mean": jnp.full((2,), v),
                                              "n": jnp.array(7, jnp.int32)}},
                          opt_state=tx.init(params))

    save_checkpoint(tmp_path / "a.msgpack", mk(1.0, 10.0))
    save_checkpoint(tmp_path / "b.msgpack", mk(3.0, 30.0))
    out = average_checkpoints([tmp_path / "a.msgpack",
                               tmp_path / "b.msgpack"], mk(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out.params["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(out.batch_stats["bn"]["mean"]), 20.0)
    assert int(out.batch_stats["bn"]["n"]) == 7     # non-float: kept
    with pytest.raises(ValueError):
        average_checkpoints([], mk(0.0, 0.0))


@pytest.mark.slow
def test_trainer_gradient_accumulation(tmp_path):
    """accumulate_steps + optimizer.ema_decay through the Trainer: the
    batch splits into microbatches inside the jitted step, training
    completes with a finite loss (DP-equivalence of the math is pinned
    separately in test_parallel.py::test_grad_accumulation_matches_dp),
    the EMA weight track rides the checkpoint, and use_ema serves it."""
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    SR = 8000
    rng = np.random.default_rng(21)
    data = tmp_path / "data"
    for spk in range(4):
        for utt in range(3):
            t = np.arange(int(1.2 * SR)) / SR
            sig = 0.3 * np.sin(2 * np.pi * (160 + 60 * spk) * t) \
                + rng.normal(0, 0.02, len(t))
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      sig.astype(np.float32), SR)
    generate_metadata(data, tmp_path / "meta", num_val_utts=0)

    hparams = {
        "seed": 5, "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "meta" / "train.csv"),
        "number_of_epochs": 1, "batch_size": 4, "lr": 0.005,
        "nClasses": 4, "accumulate_steps": 2,
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
        "optimizer": {"name": "adam", "weight_decay": 0.0,
                      "ema_decay": 0.9},
        "callbacks": {"name": "steplr"},
        "test_interval": -1, "save_model_last": True,
        "ckpt_interval_minutes": -1,
    }
    tr = Trainer(hparams)
    assert tr.accum_steps == 2
    out = tr.fit()
    assert np.isfinite(out["min_loss"])

    # the EMA track rode the checkpoint; use_ema serves it and the
    # served weights differ from the raw ones (EMA lags the raw params)
    from speakerverification_tpu.inference import InferenceEngine
    eng_ema = InferenceEngine({**hparams, "use_ema": True})
    eng_raw = InferenceEngine(hparams)
    leaves_e = jax.tree_util.tree_leaves(eng_ema.state.params)
    leaves_r = jax.tree_util.tree_leaves(eng_raw.state.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_e, leaves_r))
    # and the no-EMA fallback path: a raw-optimizer run served with
    # use_ema warns and falls back (covered in test_optim round-trip)
