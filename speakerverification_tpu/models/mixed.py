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
Exception: a HYBRID nested as a branch (Tita_ECAPA, Raw3_ECAPA, …)
receives the raw wave and runs its own in-model featurize — its
frontend semantics (fp32 pinning, per-branch SpecAugment draw) belong
to that module, so its mel is not shared with sibling branches.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.ops.frontend import FrontendConfig
from speakerverification_tpu.ops.specaugment import SpecAugmentConfig
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
    # per-kind overrides (kind → config pairs; tuple keeps the module
    # hashable). The reference's two feature factories default fmin/fmax
    # DIFFERENTLY (feature.py — mfcc: 10/4000 at :37; melspectrogram:
    # 0/None at :71-72), so an mfcc branch must not inherit a mel-keyed
    # shared config's band edges. build_mixed_model fills this.
    frontends: Tuple[Tuple[str, FrontendConfig], ...] = ()
    # threaded by the builder when the config's augment_chain includes
    # 'spec_domain' — the reference's hybrids spec-augment their
    # in-model feature branch too (ECAPA_TDNN.py:404,471 hook built
    # with the full config kwargs at Raw3_ECAPA.py:21-24)
    spec_augment: Optional[SpecAugmentConfig] = None
    compute_dtype: Optional[object] = None
    frontend_backend: str = "auto"   # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → concat embeddings [B, nOut]."""
        from speakerverification_tpu.models.hybrids import (
            hybrid_cast,
            hybrid_featurize,
        )
        cfg_by_kind = dict(self.frontends)
        feats = {}
        outs = []
        for mod, kind in zip(self.branches, self.input_kinds):
            if kind == "raw":
                # nested hybrids (Tita_ECAPA, Raw3_ECAPA, …) own an
                # in-model frontend that must see the UNCAST wave —
                # they cast per-branch themselves (same contract the
                # encoder honors for this module)
                inp = x if hasattr(mod, "frontend") else \
                    hybrid_cast(x, self.compute_dtype)
            else:
                if kind not in feats:
                    # frontend pinned fp32, SpecAugment when threaded,
                    # features to the compute dtype (hybrids.py)
                    feats[kind] = hybrid_featurize(
                        self, x, kind, cfg_by_kind.get(kind, self.frontend),
                        self.spec_augment, self.compute_dtype, train,
                        self.frontend_backend)
                inp = feats[kind]
            outs.append(mod(inp, train=train))
        return jnp.concatenate(outs, axis=-1)


def build_mixed_model(names: Sequence[str], nOut: int,
                      frontend: Optional[FrontendConfig] = None,
                      **kwargs) -> MixedModel:
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
    if shared_ft == "raw":
        # 'features: raw' in reference configs marks hybrid raw-wave
        # MODELS, not a feature kind the mel-consuming branches could
        # eat (same coercion the builder applies to a lone ECAPA_TDNN)
        shared_ft = "melspectrogram"
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

    # Per-kind frontend configs: each non-raw branch kind gets the
    # reference factory defaults FOR THAT KIND (explicit config keys
    # still win inside frontend_from_hparams) — a shared config keyed
    # on one kind must not leak its fmin/fmax defaults into another's
    # band edges. A caller-passed ``frontend`` wins for the shared kind.
    from speakerverification_tpu.builder import frontend_from_hparams
    fe_pairs = []
    for kind in dict.fromkeys(feature_types):       # ordered, unique
        if kind == "raw":
            continue
        if frontend is not None and kind == shared_ft:
            cfg = frontend
        else:
            cfg = frontend_from_hparams(kwargs, kind)
        fe_pairs.append((kind, cfg))
    if frontend is None:
        frontend = fe_pairs[0][1] if fe_pairs else FrontendConfig()
    return MixedModel(branches=tuple(branches),
                      input_kinds=tuple(feature_types), frontend=frontend,
                      frontends=tuple(fe_pairs))
