"""SpeakerEncoder: frontend + backbone + loss head composition.

TPU-native equivalent of the reference's ``SpeakerEncoder``
(src/model.py:36-135): an optional on-device feature extractor
(mel-spectrogram / MFCC, or ``raw`` passthrough) feeding a backbone
encoder; called with labels it groups embeddings per speaker
(``nPerSpeaker``) and applies the loss head, returning ``(loss, prec1)``;
without labels it returns embeddings.

Unlike the reference, the frontend here is a pure GEMM pipeline traced
into the same XLA program as the backbone, so feature extraction fuses
with the first conv instead of running as a separate CUDA module.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.ops.frontend import FrontendConfig, make_frontend
from speakerverification_tpu.ops.specaugment import SpecAugmentConfig, spec_augment

__all__ = ["SpeakerEncoder"]


class SpeakerEncoder(nn.Module):
    backbone: nn.Module
    loss: Optional[nn.Module] = None
    feature_type: str = "melspectrogram"
    frontend: FrontendConfig = FrontendConfig()
    # SpecAugment inside the train step when the config's augment_chain
    # includes 'spec_domain' (reference: src/models/ECAPA_TDNN.py:471-473).
    spec_augment: Optional[SpecAugmentConfig] = None
    # 'xla' | 'pallas' | 'auto' — 'pallas' fuses the mel GEMM pipeline in
    # VMEM (ops/pallas_frontend.py, TPU only); 'auto' picks pallas on TPU.
    frontend_backend: str = "auto"
    # bf16 mixed precision: the frontend always computes in fp32 (parity
    # with the reference pinning feature extraction outside autocast,
    # src/models/ECAPA_TDNN.py:469-478 autocast(enabled=False)); features
    # are cast to compute_dtype before the backbone so the conv/matmul
    # FLOPs run on the MXU in bf16. Pair with casting params to the same
    # dtype in the train/eval step (training/train_step.py).
    compute_dtype: Optional[Any] = None
    # Mesh axis to all_gather embeddings over before the loss head. Under
    # shard_map DP, metric-learning losses (AngularProto/GE2E/proto) then
    # see the FULL global batch — an improvement over the reference, whose
    # DDP computes these per-rank only (SURVEY.md §7.7).
    gather_axis: Optional[str] = None

    def _frontend_fn(self):
        backend = self.frontend_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if backend == "pallas" and self.feature_type == "melspectrogram":
            from speakerverification_tpu.ops.pallas_frontend import (
                make_pallas_mel_frontend,
            )
            return make_pallas_mel_frontend(self.frontend)
        return make_frontend(self.frontend, self.feature_type)

    def _embed(self, wave: jax.Array, train: bool) -> jax.Array:
        if self.feature_type == "raw" and hasattr(self.backbone, "frontend"):
            # hybrid/mixed backbones featurize in-model: hand them the
            # UNCAST fp32 wave — their featurizers pin fp32 and they
            # cast each branch to the compute dtype themselves
            # (models/hybrids.py::hybrid_featurize / hybrid_cast)
            return self.backbone(wave.astype(jnp.float32), train=train)
        feats = self._frontend_fn()(wave.astype(jnp.float32))
        if train and self.spec_augment is not None and feats.ndim == 3:
            feats = spec_augment(self.make_rng("specaug"), feats,
                                 self.spec_augment)
        if self.compute_dtype is not None:
            feats = feats.astype(self.compute_dtype)
        return self.backbone(feats, train=train)

    @nn.compact
    def __call__(self, wave: jax.Array, label: Optional[jax.Array] = None,
                 train: bool = False) -> Any:
        """``wave``: [B, T] or [B, nPerSpeaker, T] raw audio at sample rate.

        Returns embeddings ``[B(, nPerSpeaker), D]`` when ``label`` is None,
        else ``(loss, prec1)`` (parity: src/model.py:104-135).
        """
        grouped = wave.ndim == 3
        n_per = wave.shape[1] if grouped else 1
        flat = wave.reshape(-1, wave.shape[-1])

        emb = self._embed(flat, train)

        if label is None:
            if grouped:
                emb = emb.reshape(-1, n_per, emb.shape[-1])
            return emb

        assert self.loss is not None, "SpeakerEncoder built without a loss head"
        emb = emb.reshape(-1, n_per, emb.shape[-1])
        label = jnp.asarray(label)
        if self.gather_axis is not None and not self.is_initializing():
            # only meaningful inside shard_map (init runs outside the mesh;
            # parameter shapes don't depend on the gathered batch size)
            emb = jax.lax.all_gather(emb, self.gather_axis, tiled=True)
            label = jax.lax.all_gather(label, self.gather_axis, tiled=True)
        return self.loss(emb, label)
