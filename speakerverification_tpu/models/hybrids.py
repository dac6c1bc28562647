"""Two-branch hybrid encoders: raw-waveform branch ∥ mel-ECAPA branch.

Parity targets: the ``Raw*_ECAPA`` family —
* ``Raw3_ECAPA``       (src/models/Raw3_ECAPA.py:9-60) — the reference's
  DEFAULT model (yaml/configuration.yaml:76): RawNet3(nOut−192) on raw
  audio ∥ ECAPA-192 (channels 512.../1536, GELU, input_norm) on in-model
  mel features, embeddings concatenated.
* ``Raw_ECAPA`` / ``Raw_ECAPA_sinc_asp`` / ``Raw_ECAPA_conv_asp`` /
  ``Raw_ECAPA_sinc_gru`` (src/models/Raw_ECAPA*.py) — same pattern over
  RawNet2_custom variants (sinc/conv front × asp/gru aggregation).

Note: the hybrid's ECAPA branch consumes *linear-power* mel (the
reference's config sets ``features: raw`` so ECAPA's log-compression
branch is skipped, src/models/ECAPA_TDNN.py:472-476) — ``log_input`` is
therefore False here, with instance-norm enabled where the reference
enables it.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN
from speakerverification_tpu.models.rawnet2_custom import RawNet2Custom
from speakerverification_tpu.models.rawnet3 import RawNet3
from speakerverification_tpu.ops.frontend import FrontendConfig, make_frontend
from speakerverification_tpu.ops.specaugment import (
    SpecAugmentConfig,
    spec_augment,
)
from speakerverification_tpu.registry import MODELS

__all__ = ["RawECAPAHybrid", "hybrid_featurize", "hybrid_cast"]


def hybrid_featurize(module: nn.Module, x: jax.Array, kind: str,
                     frontend: FrontendConfig,
                     spec_cfg: Optional[SpecAugmentConfig],
                     compute_dtype, train: bool,
                     backend: str = "auto") -> jax.Array:
    """In-model featurization for hybrid/mixed backbones: frontend
    pinned to fp32 (parity with the reference's autocast(False) block,
    src/models/Raw3_ECAPA.py:44-46), SpecAugment applied when the
    builder threaded a config (the reference hybrids' internal ECAPA
    gets the hook via **kwargs, Raw3_ECAPA.py:21-24 →
    ECAPA_TDNN.py:404,471), features cast to the compute dtype so the
    branch convs run on the MXU in bf16. On TPU the mel path uses the
    same VMEM-fused Pallas kernel the encoder-level frontend dispatches
    to (ops/pallas_frontend.py, exact-match tested)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if kind == "melspectrogram" and backend == "pallas":
        from speakerverification_tpu.ops.pallas_frontend import (
            make_pallas_mel_frontend,
        )
        fe = make_pallas_mel_frontend(frontend)
    else:
        fe = make_frontend(frontend, kind)
    f = fe(x.astype(jnp.float32))
    if train and spec_cfg is not None:
        f = spec_augment(module.make_rng("specaug"), f, spec_cfg)
    return f if compute_dtype is None else f.astype(compute_dtype)


def hybrid_cast(x: jax.Array, compute_dtype) -> jax.Array:
    """Cast the raw-wave branch input to the compute dtype (the encoder
    hands in-model-frontend backbones the UNCAST fp32 wave so their
    featurizers don't lose precision; the wave branches still want
    bf16)."""
    return x if compute_dtype is None else x.astype(compute_dtype)


class RawECAPAHybrid(nn.Module):
    raw_branch: nn.Module
    ecapa: nn.Module
    frontend: FrontendConfig = FrontendConfig()
    # threaded by the builder (encoder_from_hparams) — see
    # hybrid_featurize
    spec_augment: Optional[SpecAugmentConfig] = None
    compute_dtype: Optional[object] = None
    frontend_backend: str = "auto"   # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → concat embeddings [B, nOut]."""
        mel = hybrid_featurize(self, x, "melspectrogram", self.frontend,
                               self.spec_augment, self.compute_dtype,
                               train, self.frontend_backend)
        out1 = self.ecapa(mel, train=train)
        out2 = self.raw_branch(hybrid_cast(x, self.compute_dtype),
                               train=train)
        return jnp.concatenate([out1, out2], axis=-1)


def _frontend_cfg(kwargs) -> FrontendConfig:
    # the hybrids' in-model branch is always 'melspectrogram'
    # (src/models/Raw3_ECAPA.py:33); the canonical helper keys the
    # fmin/fmax defaults on that (feature.py:71-72 — NOT the mfcc
    # factory's 10/4000). Explicit config keys win.
    return FrontendConfig.from_hparams(dict(kwargs), "melspectrogram")


def _hybrid_ecapa(n_mels: int, input_norm: bool,
                  remat: bool = False) -> ECAPA_TDNN:
    return ECAPA_TDNN(lin_neurons=192,
                      channels=(512, 512, 512, 512, 1536),
                      feature_type="melspectrogram",
                      log_input=False, input_norm=input_norm,
                      remat=remat)


@MODELS.register("Raw3_ECAPA")
def build_raw3_ecapa(nOut: int = 512, **kwargs) -> RawECAPAHybrid:
    """MainModel parity (src/models/Raw3_ECAPA.py:58-60). ``C`` reaches
    the RawNet3 branch like the reference's ``**kwargs`` do
    (Raw3_ECAPA.py:25-30 → RawNet3.MainModel(..., **kwargs))."""
    cfg = _frontend_cfg(kwargs)
    raw = RawNet3(nOut=nOut - 192, C=int(kwargs.get("C", 1024)),
                  model_scale=8, context=True, summed=True,
                  out_bn=False, log_sinc=True, norm_sinc="mean",
                  encoder_type="ASP", sinc_stride=10,
                  # carried for parity only — RawNet3 pins its sinc
                  # grid to 16 kHz like the reference (rawnet3.py)
                  sample_rate=cfg.sample_rate)
    return RawECAPAHybrid(raw_branch=raw,
                          ecapa=_hybrid_ecapa(cfg.n_mels, input_norm=True,
                                              remat=bool(
                                                  kwargs.get("remat"))),
                          frontend=cfg)


def _rawnet2_hybrid(nOut, front, agg, kwargs, input_norm) -> RawECAPAHybrid:
    cfg = _frontend_cfg(kwargs)
    raw = RawNet2Custom(nOut=nOut - 192, front_proc=front, aggregate=agg,
                        att_dim=128, sample_rate=cfg.sample_rate)
    return RawECAPAHybrid(raw_branch=raw,
                          ecapa=_hybrid_ecapa(cfg.n_mels,
                                              input_norm=input_norm,
                                              remat=bool(
                                                  kwargs.get("remat"))),
                          frontend=cfg)


@MODELS.register("Raw_ECAPA")
def build_raw_ecapa(nOut: int = 512, **kwargs) -> RawECAPAHybrid:
    """Parity: src/models/Raw_ECAPA.py:20-28 (sinc front, ASP
    aggregation, ECAPA branch WITH instance norm)."""
    return _rawnet2_hybrid(nOut, "sinc", "asp", kwargs, input_norm=True)


@MODELS.register("Raw_ECAPA_sinc_asp")
def build_raw_ecapa_sinc_asp(nOut: int = 512, **kwargs) -> RawECAPAHybrid:
    """Parity: src/models/Raw_ECAPA_sinc_asp.py:19-57 (instance norm
    OFF — the one knob this variant flips vs Raw_ECAPA)."""
    return _rawnet2_hybrid(nOut, "sinc", "asp", kwargs, input_norm=False)


@MODELS.register("Raw_ECAPA_conv_asp")
def build_raw_ecapa_conv_asp(nOut: int = 512, **kwargs) -> RawECAPAHybrid:
    """Parity: src/models/Raw_ECAPA_conv_asp.py:22-28 (instance norm
    ON, strided-conv front)."""
    return _rawnet2_hybrid(nOut, "conv", "asp", kwargs, input_norm=True)


@MODELS.register("Raw_ECAPA_sinc_gru")
def build_raw_ecapa_sinc_gru(nOut: int = 512, **kwargs) -> RawECAPAHybrid:
    """Parity: src/models/Raw_ECAPA_sinc_gru.py:22-28 (instance norm
    OFF, GRU aggregation)."""
    return _rawnet2_hybrid(nOut, "sinc", "gru", kwargs, input_norm=False)


class RawECAPAHype(nn.Module):
    """ECAPA-192 ∥ RawNet2(512, sinc/gru) with a channel-attention head on
    the concatenated embedding (parity: src/models/Raw_ECAPA_hype.py:6-90;
    the 'ASP' there runs over a single time step with channel-softmax)."""
    raw_branch: nn.Module
    ecapa: nn.Module
    nOut: int = 512
    att_size: int = 128
    frontend: FrontendConfig = FrontendConfig()
    spec_augment: Optional[SpecAugmentConfig] = None
    compute_dtype: Optional[object] = None
    frontend_backend: str = "auto"   # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mel = hybrid_featurize(self, x, "melspectrogram", self.frontend,
                               self.spec_augment, self.compute_dtype,
                               train, self.frontend_backend)
        out = jnp.concatenate([self.ecapa(mel, train=train),
                               self.raw_branch(
                                   hybrid_cast(x, self.compute_dtype),
                                   train=train)], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = jax.nn.leaky_relu(out, 0.3)

        h = jax.nn.silu(nn.Dense(self.att_size)(out))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        w = jax.nn.softmax(nn.Dense(out.shape[-1])(h), axis=-1)
        m = out * w
        s = jnp.sqrt(jnp.clip((out ** 2) * w - m ** 2, 1e-9))
        pooled = jnp.concatenate([m, s], axis=-1)
        pooled = nn.BatchNorm(use_running_average=not train,
                              momentum=0.9)(pooled)
        return nn.Dense(self.nOut)(pooled)


@MODELS.register("Raw_ECAPA_hype")
def build_raw_ecapa_hype(nOut: int = 512, **kwargs) -> RawECAPAHype:
    """MainModel parity (src/models/Raw_ECAPA_hype.py:90)."""
    cfg = _frontend_cfg(kwargs)
    return RawECAPAHype(
        raw_branch=RawNet2Custom(nOut=512, front_proc="sinc",
                                 aggregate="gru", att_dim=128,
                                 sample_rate=cfg.sample_rate),
        ecapa=_hybrid_ecapa(cfg.n_mels, input_norm=True,
                            remat=bool(kwargs.get("remat"))),
        nOut=nOut, frontend=cfg)
