"""Multi-encoder composition for list-valued ``model.name`` configs.

The reference's engine dispatches a list-valued ``model['name']`` to
``models/Mixed_model.py`` (src/model.py:76-80) — a file that DOES NOT
EXIST in the reference repo, so its configured multi-encoder path dies
on import (the hybrid capability actually shipped as the hand-written
``Raw*_ECAPA`` files). This module implements the evident intent as a
WORKING feature: N registered backbones side by side on one input
waveform, embeddings concatenated to ``nOut``.

Config surface (all under ``model:``):

* ``name: [RawNet3, ECAPA_TDNN]`` — any registered names.
* ``nOuts: [320, 192]`` (optional) — per-branch embedding widths;
  must sum to ``nOut``. Default: even split, remainder to the first
  branch (the ``Raw3_ECAPA`` convention of a fixed-width mel branch is
  expressible as ``nOuts: [nOut-192, 192]``).
* ``feature_types: [raw, melspectrogram]`` (optional) — per-branch
  input kind. Default: ``raw`` for the wave-consuming families
  (``_WAVE_INPUT`` below), otherwise the config's shared feature type.
* ``branch_options: [{...}, {...}]`` (optional) — per-branch kwargs
  overlaid on the shared ``model:`` kwargs.

Each distinct non-raw feature kind is computed ONCE per forward and
shared across branches (a single GEMM-native frontend dispatch —
cheaper than the reference hybrids' one-frontend-per-branch pattern).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.ops.frontend import FrontendConfig, make_frontend
from speakerverification_tpu.registry import MODELS

__all__ = ["MixedModel", "build_mixed_model"]

# Registered names whose modules consume the raw waveform [B, T]
# directly (everything else consumes frontend features [B, frames, F]).
_WAVE_INPUT = frozenset({
    "RawNet2", "RawNet_baseline", "RawNet2_custom", "RawNet3", "RawNeXt",
    "Raw3_ECAPA", "Raw_ECAPA", "Raw_ECAPA_conv_asp", "Raw_ECAPA_sinc_asp",
    "Raw_ECAPA_sinc_gru", "Raw_ECAPA_hype", "Raw_tita", "Tita_ECAPA",
})


class MixedModel(nn.Module):
    branches: Tuple[nn.Module, ...]
    input_kinds: Tuple[str, ...]          # 'raw' | 'melspectrogram' | 'mfcc'
    frontend: FrontendConfig = FrontendConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → concat embeddings [B, nOut]."""
        feats = {}
        outs = []
        for mod, kind in zip(self.branches, self.input_kinds):
            if kind == "raw":
                inp = x
            else:
                if kind not in feats:
                    feats[kind] = make_frontend(self.frontend, kind)(x)
                inp = feats[kind]
            outs.append(mod(inp, train=train))
        return jnp.concatenate(outs, axis=-1)


def build_mixed_model(names: Sequence[str], nOut: int, **kwargs) -> MixedModel:
    """Build the multi-encoder model the reference configured but never
    shipped (src/model.py:76-80 → missing models/Mixed_model.py)."""
    names = list(names)
    if len(names) < 2:
        raise ValueError(
            f"a list-valued model name needs >= 2 entries, got {names!r}")

    n_outs = kwargs.pop("nOuts", None)
    if n_outs is None:
        base = nOut // len(names)
        n_outs = [base] * len(names)
        n_outs[0] += nOut - base * len(names)
    n_outs = [int(n) for n in n_outs]
    if len(n_outs) != len(names) or sum(n_outs) != int(nOut):
        raise ValueError(
            f"nOuts {n_outs} must have one entry per model name and sum "
            f"to nOut={nOut}")

    shared_ft = kwargs.pop("feature_type",
                           kwargs.pop("features", "melspectrogram"))
    feature_types = kwargs.pop("feature_types", None)
    if feature_types is None:
        feature_types = ["raw" if n in _WAVE_INPUT else shared_ft
                         for n in names]
    feature_types = [str(f) for f in feature_types]
    if len(feature_types) != len(names):
        raise ValueError(
            f"feature_types {feature_types} must have one entry per name")

    branch_options = kwargs.pop("branch_options", None) or [{}] * len(names)
    if len(branch_options) != len(names):
        raise ValueError("branch_options must have one entry per name")

    from speakerverification_tpu.models import build_model

    branches = []
    for name, n_o, ft, opts in zip(names, n_outs, feature_types,
                                   branch_options):
        if name not in MODELS:
            raise KeyError(
                f"unknown model {name!r} in mixed config; registered: "
                f"{MODELS.names()}")
        branches.append(build_model(name, nOut=n_o, feature_type=ft,
                                    **{**kwargs, **dict(opts)}))

    spec = dict(kwargs.get("audio_spec") or {})
    sr = int(kwargs.get("sample_rate", spec.get("sample_rate", 8000)))
    cfg = FrontendConfig(
        sample_rate=sr,
        n_fft=int(kwargs.get("n_fft", 512)),
        win_length=int(kwargs.get("win_length",
                                  round(spec.get("win_len", 0.025) * sr))),
        hop_length=int(kwargs.get("hop_length",
                                  round(spec.get("hop_len", 0.01) * sr))),
        n_mels=int(kwargs.get("n_mels", 80)),
        n_mfcc=int(kwargs.get("n_mfcc", kwargs.get("n_mels", 80))),
        fmin=float(kwargs.get("fmin", 10.0)),
        fmax=kwargs.get("fmax", min(4000.0, sr / 2)),
    )
    return MixedModel(branches=tuple(branches),
                      input_kinds=tuple(feature_types), frontend=cfg)
