"""RawNet3 raw-waveform speaker encoder (Flax, channels-last).

Parity target: src/models/RawNet3.py:10-163 — ParamSincFB frontend
(|·| + optional log + mean/mean_std normalization), three Bottle2neck
layers (dilations 2/3/4, maxpools 5/3/-), summed skip topology, MFA
concat → 1×1 conv to a 1536-dim context, global-context ASP/ECA
attention pooling, BN → linear to the embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.rawnet_blocks import Bottle2neckRaw, max_pool1d
from speakerverification_tpu.ops.frontend import pre_emphasis
from speakerverification_tpu.ops.sinc import SincConv
from speakerverification_tpu.registry import MODELS

__all__ = ["RawNet3"]


class RawNet3(nn.Module):
    nOut: int = 512
    C: int = 1024
    model_scale: int = 8
    context: bool = True
    summed: bool = True
    out_bn: bool = False
    log_sinc: bool = True
    norm_sinc: str = "mean"          # 'mean' | 'mean_std' | 'none'
    encoder_type: str = "ASP"        # 'ASP' | 'ECA'
    sinc_stride: int = 10
    # Accepted for config/API parity but INTENTIONALLY UNUSED: the
    # reference never threads its configured rate into ParamSincFB, so
    # the sinc grid is pinned to asteroid's 16 kHz default regardless
    # (see the comment at the SincConv call below).
    sample_rate: int = 16000
    context_dim: int = 1536

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → embeddings [B, nOut]."""
        # preprocess: pre-emphasis + per-utterance instance norm
        # (parity: RawNet3.py:32-34, InstanceNorm1d(1, eps=1e-4, affine)).
        # Pinned fp32: torch AMP autocasts InstanceNorm1d to fp32, and a
        # bf16 mean/var over 16k samples loses real precision.
        wave_dtype = x.dtype
        x = pre_emphasis(x.astype(jnp.float32))
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        w = self.param("inorm_scale", nn.initializers.ones, (1,))
        b = self.param("inorm_bias", nn.initializers.zeros, (1,))
        x = ((x - mean) / jnp.sqrt(var + 1e-4) * w.astype(jnp.float32)
             + b.astype(jnp.float32))
        x = x.astype(wave_dtype)

        # sinc filterbank frontend (|·|, log, mean-norm over time). The
        # conv runs in the wave's dtype (bf16 under mixedprec — torch
        # AMP also halves this conv, Raw3_ECAPA.py:50); log + the norm
        # reductions run fp32, exactly the ops torch autocast promotes
        # to fp32, then the features drop back to the compute dtype.
        in_dtype = x.dtype
        # sample_rate is PINNED to asteroid's 16 kHz default: the
        # reference never threads its configured rate into ParamSincFB
        # (RawNet3.py:35-41 passes only n_filters/kernel/stride), so in
        # the 8 kHz default config its sinc grid and mel-spaced cutoff
        # init are still parameterized at 16 kHz. Mirroring that quirk
        # is required for checkpoint portability and trained parity on
        # the default Raw3_ECAPA path (test_e2e_parity.py; found by its
        # first-step loss gate, round 5). self.sample_rate stays a
        # config field for API compatibility but no stage consumes it.
        x = SincConv(self.C // 4, kernel_size=251, stride=self.sinc_stride,
                     sample_rate=16000)(x)                  # [B, F, C/4]
        x = jnp.abs(x).astype(jnp.float32)
        if self.log_sinc:
            x = jnp.log(x + 1e-6)
        if self.norm_sinc == "mean":
            x = x - jnp.mean(x, axis=1, keepdims=True)
        elif self.norm_sinc == "mean_std":
            m = jnp.mean(x, axis=1, keepdims=True)
            # torch.std defaults to the unbiased estimator (RawNet3.py:95)
            s = jnp.maximum(jnp.std(x, axis=1, keepdims=True, ddof=1), 1e-3)
            x = (x - m) / s
        x = x.astype(in_dtype)

        x1 = Bottle2neckRaw(self.C, 3, 2, self.model_scale, pool=5)(
            x, train=train)
        x2 = Bottle2neckRaw(self.C, 3, 3, self.model_scale, pool=3)(
            x1, train=train)
        if self.summed:
            x3 = Bottle2neckRaw(self.C, 3, 4, self.model_scale)(
                max_pool1d(x1, 3) + x2, train=train)
        else:
            x3 = Bottle2neckRaw(self.C, 3, 4, self.model_scale)(
                x2, train=train)

        # multi-layer aggregation (truncate to common length before concat;
        # the torch maxpools already make lengths agree for 2 s crops)
        L = min(max_pool1d(x1, 3).shape[1], x2.shape[1], x3.shape[1])
        agg = jnp.concatenate([max_pool1d(x1, 3)[:, :L], x2[:, :L],
                               x3[:, :L]], axis=-1)
        x = jax.nn.relu(nn.Conv(self.context_dim, (1,))(agg))  # [B, L, 1536]

        if self.context:
            t = x.shape[1]
            mu = jnp.mean(x, axis=1, keepdims=True)
            # torch.var defaults to the unbiased estimator (RawNet3.py:117)
            sg = jnp.sqrt(jnp.clip(jnp.var(x, axis=1, keepdims=True, ddof=1),
                                   1e-4, 1e4))
            glob = jnp.concatenate(
                [x, jnp.broadcast_to(mu, x.shape),
                 jnp.broadcast_to(sg, x.shape)], axis=-1)
        else:
            glob = x

        # attention head (parity: RawNet3.py:66-72)
        attn = nn.Conv(128, (1,))(glob)
        attn = jax.nn.relu(attn)
        attn = nn.BatchNorm(use_running_average=not train, momentum=0.9)(attn)
        out_ch = self.context_dim if self.encoder_type == "ECA" else 1
        attn = nn.Conv(out_ch, (1,))(attn)
        w = jax.nn.softmax(attn, axis=1)                     # [B, L, out_ch]

        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=1) - mu ** 2,
                               1e-4, 1e4))
        x = jnp.concatenate([mu, sg], axis=-1)               # [B, 3072]

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.Dense(self.nOut)(x)
        if self.out_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return x


@MODELS.register("RawNet3")
def build_rawnet3(nOut: int = 512, model_scale: int = 8, context: bool = True,
                  summed: bool = True, out_bn: bool = False,
                  log_sinc: bool = True, norm_sinc: str = "mean",
                  encoder_type: str = "ASP", sinc_stride: int = 10,
                  C: int = 1024, **kwargs) -> RawNet3:
    """MainModel parity (src/models/RawNet3.py:148-163)."""
    sr = int(kwargs.get("sample_rate",
                        (kwargs.get("audio_spec") or {}).get("sample_rate",
                                                             16000)))
    return RawNet3(nOut=nOut, C=C, model_scale=model_scale, context=context,
                   summed=summed, out_bn=out_bn, log_sinc=log_sinc,
                   norm_sinc=norm_sinc, encoder_type=encoder_type,
                   sinc_stride=sinc_stride, sample_rate=sr)
