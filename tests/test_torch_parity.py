"""Forward-parity vs the reference torch ECAPA-TDNN with ported weights.

Builds the reference model (torch CPU, unavailable deps stubbed), ports
its randomly-initialized state dict into our Flax ECAPA via
compat/torch_port.py, and compares eval-mode outputs on identical
features — the mechanism behind BASELINE.md's parity target.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.compat.torch_port import ecapa_from_torch_state_dict
from speakerverification_tpu.models import build_model


@pytest.fixture(scope="module")
def reference_ecapa():
    for name in ("torchaudio", "nnAudio", "nnAudio.features"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import torch
    from models import ECAPA_TDNN as RefE

    torch.manual_seed(0)
    kwargs = dict(n_mels=80, augment=False,
                  augment_options={"augment_chain": []}, features="raw")
    net = RefE.MainModel(nOut=64, channels=[64, 64, 64, 64, 192],
                         attention_channels=16, res2net_scale=4,
                         se_channels=16, **kwargs)
    net.eval()
    return net


def test_forward_parity_with_ported_weights(reference_ecapa):
    import torch

    net = reference_ecapa
    params, stats = ecapa_from_torch_state_dict(net.state_dict(),
                                                n_blocks=4, res2net_scale=4)

    ours = build_model("ECAPA_TDNN", nOut=64, channels=(64, 64, 64, 64, 192),
                       attention_channels=16, res2net_scale=4, se_channels=16,
                       log_input=False)
    # template init to validate tree structure, then overwrite
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 50, 80)))

    def tree_paths(t):
        return {"/".join(k.key for k in p)
                for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}

    missing = tree_paths(template["params"]) - tree_paths(params)
    extra = tree_paths(params) - tree_paths(template["params"])
    assert not missing, f"unmapped params: {sorted(missing)[:5]}"
    assert not extra, f"superfluous params: {sorted(extra)[:5]}"

    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (3, 80, 120)).astype(np.float32)  # [B, mel, T]

    with torch.no_grad():
        ref_out = net(torch.from_numpy(feats)).numpy()

    ours_out = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats.transpose(0, 2, 1))))      # [B, T, mel]

    assert ours_out.shape == ref_out.shape
    denom = np.abs(ref_out).max()
    max_rel = np.abs(ours_out - ref_out).max() / denom
    assert max_rel < 2e-3, f"max relative diff {max_rel}"
    # cosine similarity of embeddings must be ~1
    cos = np.sum(ours_out * ref_out, -1) / (
        np.linalg.norm(ours_out, axis=-1) * np.linalg.norm(ref_out, axis=-1))
    assert np.all(cos > 0.99999), cos
