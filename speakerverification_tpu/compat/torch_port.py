"""Port reference (torch) checkpoints into this framework's parameters.

The reference ships ``.pt`` state dicts (src/model.py:710-746). This
module maps the reference ECAPA-TDNN's state-dict layout
(src/models/ECAPA_TDNN.py:339-502; SpeechBrain-style ``.conv.conv`` /
``.norm.norm`` wrappers) onto our Flax tree, enabling (a) serving
reference-trained models on TPU and (b) bit-level forward parity checks
(tests/test_torch_parity.py) — the mechanism behind BASELINE.md's
"EER within 0.1 % with ported weights".

Conventions: torch conv1d weights are ``[out, in, k]`` → flax ``[k, in,
out]``; BN ``weight/bias`` → ``scale/bias`` params and
``running_mean/var`` → ``batch_stats``; the final 1×1 conv fc maps to
``Dense`` with kernel ``weight[:, :, 0].T``.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np

__all__ = ["ecapa_from_torch_state_dict", "load_reference_checkpoint"]


def load_reference_checkpoint(path, n_blocks: int = 4,
                              res2net_scale: int = 8) -> Tuple[dict, dict]:
    """Load a reference ``.pt`` training checkpoint into our ECAPA trees.

    Reference checkpoints store the whole ``SpeakerEncoder`` state dict
    with ``module.`` (DDP) and ``__S__.`` (backbone) / ``__L__.`` (loss)
    prefixes (src/model.py:24-33,104; loadParameters tolerates prefixes,
    :718-746). The backbone entries are extracted and mapped; loss-head
    entries are ignored (retrain or map separately).
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    backbone = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k.startswith("__S__."):
            k = k.removeprefix("__S__.")
        if k.startswith("__L__.") or k.startswith("compute_features"):
            continue
        backbone[k] = v
    return ecapa_from_torch_state_dict(backbone, n_blocks, res2net_scale)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _conv(params, stats, torch_prefix, flax_prefix, sd) -> None:
    w = np.asarray(sd[f"{torch_prefix}.weight"])
    _set(params, f"{flax_prefix}/Conv_0/kernel", w.transpose(2, 1, 0))
    if f"{torch_prefix}.bias" in sd:
        _set(params, f"{flax_prefix}/Conv_0/bias",
             np.asarray(sd[f"{torch_prefix}.bias"]))


def _bn(params, stats, torch_prefix, flax_prefix, sd) -> None:
    _set(params, f"{flax_prefix}/BatchNorm_0/scale",
         np.asarray(sd[f"{torch_prefix}.weight"]))
    _set(params, f"{flax_prefix}/BatchNorm_0/bias",
         np.asarray(sd[f"{torch_prefix}.bias"]))
    _set(stats, f"{flax_prefix}/BatchNorm_0/mean",
         np.asarray(sd[f"{torch_prefix}.running_mean"]))
    _set(stats, f"{flax_prefix}/BatchNorm_0/var",
         np.asarray(sd[f"{torch_prefix}.running_var"]))


def _tdnn(params, stats, tp, fp, sd) -> None:
    _conv(params, stats, f"{tp}.conv.conv", f"{fp}/Conv1d_0", sd)
    _bn(params, stats, f"{tp}.norm.norm", f"{fp}/BatchNorm1d_0", sd)


def ecapa_from_torch_state_dict(sd: Mapping, n_blocks: int = 4,
                                res2net_scale: int = 8,
                                ) -> Tuple[dict, dict]:
    """Reference ECAPA state dict → (params, batch_stats) trees.

    ``n_blocks`` = len(channels) - 1 (initial TDNN + SE-Res2 blocks).
    """
    params: dict = {}
    stats: dict = {}

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}

    # initial TDNN (blocks.0)
    _tdnn(params, stats, "blocks.0", "TDNNBlock_0", sd)

    # SE-Res2Net blocks (blocks.1..n-1)
    for i in range(1, n_blocks):
        tp = f"blocks.{i}"
        fp = f"SERes2NetBlock_{i - 1}"
        if f"{tp}.shortcut.conv.weight" in sd:
            _conv(params, stats, f"{tp}.shortcut.conv", f"{fp}/Conv1d_0", sd)
        _tdnn(params, stats, f"{tp}.tdnn1", f"{fp}/TDNNBlock_0", sd)
        for j in range(res2net_scale - 1):
            _tdnn(params, stats, f"{tp}.res2net_block.blocks.{j}",
                  f"{fp}/Res2NetBlock_0/TDNNBlock_{j}", sd)
        _tdnn(params, stats, f"{tp}.tdnn2", f"{fp}/TDNNBlock_1", sd)
        _conv(params, stats, f"{tp}.se_block.conv1.conv",
              f"{fp}/SEBlock_0/Conv1d_0", sd)
        _conv(params, stats, f"{tp}.se_block.conv2.conv",
              f"{fp}/SEBlock_0/Conv1d_1", sd)

    # MFA, ASP, asp_bn, fc
    _tdnn(params, stats, "mfa", "TDNNBlock_1", sd)
    _tdnn(params, stats, "asp.tdnn", "AttentiveStatisticsPooling_0/TDNNBlock_0",
          sd)
    _conv(params, stats, "asp.conv.conv",
          "AttentiveStatisticsPooling_0/Conv1d_0", sd)
    _bn(params, stats, "asp_bn.norm", "BatchNorm1d_0", sd)

    fc_w = np.asarray(sd["fc.conv.weight"])            # [out, in, 1]
    _set(params, "Dense_0/kernel", fc_w[:, :, 0].T)
    if "fc.conv.bias" in sd:
        _set(params, "Dense_0/bias", np.asarray(sd["fc.conv.bias"]))

    # instance norm (input_norm=True models)
    if "instance_norm.weight" in sd:
        _set(params, "input_norm_scale", np.asarray(sd["instance_norm.weight"]))
        _set(params, "input_norm_bias", np.asarray(sd["instance_norm.bias"]))

    return params, stats
