"""Build framework objects from the reference YAML schema.

The glue between configs (yaml/configuration.yaml schema) and the
TPU-native components — the role the reference's dynamic imports play in
``SpeakerEncoder.__init__`` / ``ModelHandling.__init__``
(src/model.py:36-219), done here through explicit registries.
"""

from __future__ import annotations

from typing import Mapping

import optax

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import build_loss
from speakerverification_tpu.models import build_model
from speakerverification_tpu.ops.frontend import FrontendConfig
from speakerverification_tpu.ops.specaugment import SpecAugmentConfig
from speakerverification_tpu.optim import build_optimizer, build_scheduler

__all__ = ["frontend_from_hparams", "encoder_from_hparams",
           "optimizer_from_hparams", "scheduler_from_hparams",
           "compute_dtype_from_hparams"]


def compute_dtype_from_hparams(hparams: Mapping):
    """bf16 compute dtype when ``mixedprec`` / ``precision: bf16`` is set
    (replaces the reference's --mixedprec CUDA AMP, src/main.py:66), else
    None. Single source of truth: the encoder's post-frontend cast and
    the train/eval steps' param cast must agree."""
    if hparams.get("mixedprec") or str(
            hparams.get("precision", "")).lower() in ("bf16", "bfloat16"):
        import jax.numpy as jnp
        return jnp.bfloat16
    return None


def frontend_from_hparams(hparams: Mapping,
                          feature_type: str = "melspectrogram",
                          ) -> FrontendConfig:
    """Delegates to the canonical ``FrontendConfig.from_hparams`` —
    feature-type-keyed fmin/fmax defaults (the reference's two
    factories differ, feature.py:37 vs :71-72) live in ONE place."""
    return FrontendConfig.from_hparams(dict(hparams), feature_type)


def encoder_from_hparams(hparams: Mapping,
                         with_loss: bool = True,
                         num_devices: int | None = None) -> SpeakerEncoder:
    """Build the full SpeakerEncoder from a reference-style config.

    ``num_devices`` — how many devices the train step will actually run
    over (the Trainer passes this). The in-step ``all_gather`` of metric
    embeddings is only emitted when a ``data`` mesh axis will really be
    bound; with ``distributed: true`` on a single-device host the step
    falls back to plain jit and an unconditional gather would crash with
    an unbound axis name.
    """
    model_cfg = dict(hparams.get("model", {}))
    name = model_cfg.pop("name", "ECAPA_TDNN")
    n_out = int(model_cfg.pop("nOut", 192))
    feature_type = model_cfg.pop("feature_type",
                                 hparams.get("features", "melspectrogram"))
    if feature_type == "raw" and name == "ECAPA_TDNN":
        # ECAPA always consumes mel features; 'raw' in the reference config
        # refers to hybrid raw-waveform models.
        feature_type = "melspectrogram"

    # audio/frontend parameters reach EVERY model build: hybrids and raw
    # models size their in-model featurizers and sinc banks from these
    # (models/hybrids.py::_frontend_cfg), and without the passthrough a
    # 16 kHz audio_spec would silently build 8 kHz-default frontends
    # (the reference hands its MainModels the full config kwargs,
    # src/model.py:70-73 — same reach). Model-level keys win.
    for k in ("audio_spec", "sample_rate", "n_fft", "win_length",
              "hop_length", "fmin", "fmax", "n_mfcc"):
        if k in hparams and k not in model_cfg:
            model_cfg[k] = hparams[k]

    if isinstance(name, (list, tuple)):
        # list-valued model.name: the reference dispatches this to a
        # models/Mixed_model.py that does not exist (src/model.py:76-80
        # — dead path). Here it is a working multi-encoder composition
        # (models/mixed.py); the encoder passes the waveform through
        # and the MixedModel computes each branch's frontend in-model
        # (from the same frontend_from_hparams config as everyone else,
        # so top-level n_fft/win/hop/fmin/fmax overrides apply).
        from speakerverification_tpu.models.mixed import build_mixed_model
        backbone = build_mixed_model(name, nOut=n_out,
                                     feature_type=feature_type,
                                     frontend=frontend_from_hparams(
                                         hparams, feature_type),
                                     n_mels=int(hparams.get("n_mels", 80)),
                                     **model_cfg)
        feature_type = "raw"
    else:
        backbone = build_model(name, nOut=n_out,
                               feature_type=feature_type,
                               n_mels=int(hparams.get("n_mels", 80)),
                               **model_cfg)

    loss = None
    if with_loss:
        crit = dict(hparams.get("criterion", {}))
        crit_name = crit.pop("name", "AAmSoftmax")
        if int(hparams.get("model_parallel", 1) or 1) > 1:
            # class-sharded classifier over the 2-D data×model mesh
            # (parallel/tp.py); the plain margin head maps onto its
            # sharded twin, other heads must opt in explicitly
            if crit_name == "AAmSoftmax":
                crit_name = "ShardedAAmSoftmax"
            elif crit_name != "ShardedAAmSoftmax":
                raise ValueError(
                    f"model_parallel > 1 requires a class-sharded loss "
                    f"head (ShardedAAmSoftmax), got {crit_name}")
        loss = build_loss(crit_name, nOut=n_out,
                          nClasses=int(hparams.get("nClasses", 2)), **crit)

    spec_aug = None
    aug_opts = hparams.get("augment_options", {}) or {}
    if hparams.get("augment") and "spec_domain" in (
            aug_opts.get("augment_chain", []) or []):
        spec_aug = SpecAugmentConfig()

    # Raw-passthrough backbones with in-model feature branches
    # (MixedModel, the Raw*_ECAPA / *_tita hybrids) never see the
    # encoder's post-frontend SpecAugment or compute-dtype cast — thread
    # both into the module so their feature branches are masked and
    # their conv branches run at the configured dtype (parity: the
    # reference hybrids' internal ECAPA gets the SpecAugment hook via
    # **kwargs, src/models/Raw3_ECAPA.py:21-24, and its featurizer runs
    # under autocast(False), :44-46).
    compute_dtype = compute_dtype_from_hparams(hparams)

    def _threadable(m) -> bool:
        return hasattr(m, "spec_augment") and hasattr(m, "frontend")

    fe_backend = str(hparams.get("frontend_backend", "auto"))
    if fe_backend not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"frontend_backend must be 'auto', 'xla' or 'pallas', got "
            f"{fe_backend!r}")
    if _threadable(backbone):
        kw = dict(spec_augment=spec_aug, compute_dtype=compute_dtype,
                  frontend_backend=fe_backend)
        if hasattr(backbone, "branches"):
            # a MixedModel may nest hybrids that featurize in-model —
            # they need the same treatment (their branch of the wave
            # arrives uncast, models/mixed.py)
            kw["branches"] = tuple(
                b.clone(spec_augment=spec_aug, compute_dtype=compute_dtype,
                        frontend_backend=fe_backend)
                if _threadable(b) else b for b in backbone.branches)
        backbone = backbone.clone(**kw)

    # Under --distributed, metric-learning losses can see the global batch
    # via an in-step all_gather (improvement over the reference's per-rank
    # DDP metric losses, SURVEY.md §7.7). On by default when distributed;
    # disable with gather_metric_embeddings: false for strict DDP parity.
    if num_devices is None:
        import jax
        num_devices = len(jax.devices())
    gather_axis = None
    if hparams.get("distributed") and num_devices > 1 and hparams.get(
            "gather_metric_embeddings", True):
        gather_axis = "data"

    return SpeakerEncoder(backbone=backbone, loss=loss,
                          feature_type=feature_type,
                          frontend=frontend_from_hparams(hparams,
                                                         feature_type),
                          spec_augment=spec_aug,
                          frontend_backend=fe_backend,
                          compute_dtype=compute_dtype,
                          gather_axis=gather_axis)


def optimizer_from_hparams(hparams: Mapping) -> optax.GradientTransformation:
    opt = dict(hparams.get("optimizer", {}))
    name = opt.pop("name", "adam")
    return build_optimizer(name,
                           learning_rate=float(hparams.get("lr", 1e-3)),
                           weight_decay=float(opt.pop("weight_decay", 0.0)),
                           **opt)


def scheduler_from_hparams(hparams: Mapping, steps_per_epoch: int):
    """(schedule, unit). T_max defaults to steps-per-epoch, matching
    the reference (src/trainer.py:70-71 max_iter_size → T_max)."""
    cb = dict(hparams.get("callbacks", {}) or {})
    name = cb.pop("name", "steplr")
    opt = hparams.get("optimizer", {}) or {}
    if name == "reduceOnPlateau":
        from speakerverification_tpu.optim import ReduceOnPlateau
        pl = ReduceOnPlateau(lr=float(hparams.get("lr", 1e-3)),
                             patience=int(cb.get("step_size", 5)),
                             min_lr=float(cb.get("base_lr", 1e-6)),
                             factor=0.95)
        return pl, "plateau"
    kwargs = dict(
        T_max=int(hparams.get("T_max", steps_per_epoch) or steps_per_epoch),
        lr_decay=float(opt.get("lr_decay", 0.95)),
        step_size=int(cb.get("step_size", hparams.get("step_size", 10) or 10)),
        eta_min=float(cb.get("base_lr", hparams.get("base_lr", 1e-6) or 1e-6)),
        base_lr=float(cb.get("base_lr", hparams.get("base_lr", 1e-8) or 1e-8)),
        max_lr=float(cb.get("max_lr", hparams.get("max_lr",
                                                  hparams.get("lr", 1e-3)))),
    )
    return build_scheduler(name, lr=float(hparams.get("lr", 1e-3)), **kwargs)
