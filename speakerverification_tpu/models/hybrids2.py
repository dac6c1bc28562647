"""More hybrid encoders: Tita_ECAPA, Raw_tita, Res_ECAPA.

Parity targets:
* ``Tita_ECAPA`` — src/models/Tita_ECAPA.py:10-58: ECAPA-192
  (512-channel, GELU, input_norm) ∥ TitaNet-M(nOut−192), both branches
  consuming the in-model mel features, embeddings concatenated.
* ``Raw_tita``   — src/models/Raw_tita.py:10-55: TitaNet-M(192) on mel
  ∥ RawNet2_custom(nOut−192, sinc/ASP) on raw audio.
* ``Res_ECAPA``  — src/models/Res_ECAPA.py:11-260: SE-ResNet trunk
  (filters [32,64], layers [2,2], freq-downsampling stride-(2,1) convs
  at both ends) whose [C, F/4] output flattens into an ECAPA core
  (ReLU, channels 512.../1536).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN
from speakerverification_tpu.models.hybrids import (
    RawECAPAHybrid,
    _frontend_cfg,
    hybrid_cast,
    hybrid_featurize,
)
from speakerverification_tpu.models.rawnet2_custom import RawNet2Custom
from speakerverification_tpu.models.resnetse import SELayer, _bn
from speakerverification_tpu.models.titanet import (TitaNet, _SIZES,
    find_n_mega_blocks)
from speakerverification_tpu.ops.frontend import FrontendConfig
from speakerverification_tpu.ops.specaugment import SpecAugmentConfig
from speakerverification_tpu.registry import MODELS

__all__ = ["TitaECAPA", "ResECAPA"]


class TitaECAPA(nn.Module):
    """Two mel branches: ECAPA ∥ TitaNet (parity: Tita_ECAPA.py)."""
    ecapa: nn.Module
    titanet: nn.Module
    frontend: FrontendConfig = FrontendConfig()
    spec_augment: Optional[SpecAugmentConfig] = None
    compute_dtype: Optional[object] = None
    frontend_backend: str = "auto"   # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mel = hybrid_featurize(self, x, "melspectrogram", self.frontend,
                               self.spec_augment, self.compute_dtype,
                               train, self.frontend_backend)
        out1 = self.ecapa(mel, train=train)
        out2 = self.titanet(mel, train=train)
        return jnp.concatenate([out1, out2], axis=-1)


@MODELS.register("Tita_ECAPA")
def build_tita_ecapa(nOut: int = 512, **kwargs) -> TitaECAPA:
    cfg = _frontend_cfg(kwargs)
    hidden, kernel = _SIZES["m"]
    return TitaECAPA(
        ecapa=ECAPA_TDNN(lin_neurons=192, channels=(512, 512, 512, 512, 1536),
                         log_input=False, input_norm=True,
                         remat=bool(kwargs.get("remat"))),
        # the reference resolves n_mega_blocks=None by a param-count
        # search that depends on the branch embedding size (nOut-192)
        titanet=TitaNet(nOut=nOut - 192, hidden_size=hidden,
                        mega_block_kernel=kernel,
                        n_mega_blocks=find_n_mega_blocks(
                            nOut - 192, cfg.n_mels, "m")),
        frontend=cfg)


class RawTita(nn.Module):
    """TitaNet on mel ∥ RawNet2_custom on raw (parity: Raw_tita.py)."""
    titanet: nn.Module
    raw_branch: nn.Module
    frontend: FrontendConfig = FrontendConfig()
    spec_augment: Optional[SpecAugmentConfig] = None
    compute_dtype: Optional[object] = None
    frontend_backend: str = "auto"   # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mel = hybrid_featurize(self, x, "melspectrogram", self.frontend,
                               self.spec_augment, self.compute_dtype,
                               train, self.frontend_backend)
        out1 = self.titanet(mel, train=train)
        out2 = self.raw_branch(hybrid_cast(x, self.compute_dtype),
                               train=train)
        return jnp.concatenate([out1, out2], axis=-1)


@MODELS.register("Raw_tita")
def build_raw_tita(nOut: int = 512, **kwargs) -> RawTita:
    cfg = _frontend_cfg(kwargs)
    hidden, kernel = _SIZES["m"]
    return RawTita(
        titanet=TitaNet(nOut=192, hidden_size=hidden,
                        mega_block_kernel=kernel,
                        n_mega_blocks=find_n_mega_blocks(
                            192, cfg.n_mels, "m")),
        raw_branch=RawNet2Custom(nOut=nOut - 192, front_proc="sinc",
                                 aggregate="asp", att_dim=128,
                                 sample_rate=cfg.sample_rate),
        frontend=cfg)


class RootSEBasicBlock(nn.Module):
    """Res_ECAPA's trunk block is the ROOT ResNetBlocks.py SEBasicBlock
    (:173-208), which differs from the blocks-file variant the ResNetSE
    models use: the FIRST conv runs conv→relu→bn (relu before the norm),
    and the SE is that file's SELayer — biased Linears with a FIXED
    16-neuron squeeze (:292-307)."""
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (3, 3), self.stride,
                      padding=((1, 1), (1, 1)), use_bias=False)(x)
        out = jax.nn.relu(out)
        out = _bn(train)(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = _bn(train)(out)
        out = SELayer(internal=16, use_bias=True)(out)
        if self.stride != (1, 1) or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), self.stride,
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


class ResECAPA(nn.Module):
    """SE-ResNet trunk feeding an ECAPA core (parity: Res_ECAPA.py)."""
    nOut: int = 128
    num_filters: Sequence[int] = (32, 64)
    num_layers: Sequence[int] = (2, 2)
    ecapa_channels: Sequence[int] = (512, 512, 512, 512, 1536)
    feature_type: str = "melspectrogram"

    @nn.compact
    def __call__(self, x: jax.Array, lengths=None, train: bool = False,
                 ) -> jax.Array:
        """``x``: features [B, T, n_mels] → embeddings [B, nOut]."""
        if self.feature_type == "melspectrogram":
            x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
            x = x - jnp.mean(x, axis=1, keepdims=True)
        w = self.param("inorm_scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("inorm_bias", nn.initializers.zeros, (x.shape[-1],))
        x = (x - x.mean(axis=1, keepdims=True)) / jnp.sqrt(
            x.var(axis=1, keepdims=True) + 1e-5) * w + b

        # stride-(2,1) convs use torch-p1 explicit padding — 'SAME' pads
        # (0,1) at stride 2 and shifts the downsampled frequency axis
        img = jnp.transpose(x, (0, 2, 1))[..., None]        # [B, mels, T, 1]
        h = nn.Conv(self.num_filters[0], (3, 3), (2, 1),
                    padding=((1, 1), (1, 1)))(img)
        h = jax.nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)

        for i, (planes, n_blocks) in enumerate(zip(self.num_filters,
                                                   self.num_layers)):
            for _ in range(n_blocks):
                h = RootSEBasicBlock(planes, (1, 1))(h, train=train)

        h = nn.Conv(self.num_filters[-1], (3, 3), (2, 1),
                    padding=((1, 1), (1, 1)))(h)
        h = jax.nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)

        # flatten [B, F/4, T, C] -> [B, T, C * F/4] for the TDNN core
        B, F, T, C = h.shape
        feats = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, C * F)

        core = ECAPA_TDNN(lin_neurons=self.nOut,
                          channels=tuple(self.ecapa_channels),
                          activation=jax.nn.relu, log_input=False)
        return core(feats, lengths, train=train)


@MODELS.register("Res_ECAPA")
def build_res_ecapa(nOut: int = 128, **kwargs) -> ResECAPA:
    """MainModel parity (src/models/Res_ECAPA.py:238-260)."""
    feature_type = kwargs.get("feature_type",
                              kwargs.get("features", "melspectrogram"))
    return ResECAPA(nOut=nOut, feature_type=feature_type)
