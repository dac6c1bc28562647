"""Live-torch parity for the TDFbanks learnable time-domain frontend.

The reference vendors the Facebook TDFbanks implementation
(src/models/FeatureExtraction/TDFbanks/{tdfbanks,melfilters,utils}.py —
pure torch+numpy, importable). Two assertions:

1. INIT parity: our ``_gabor_init`` reproduces ``initialize()``'s
   complex Gabor kernels exactly (mel-triangle prototypes with rounded
   DFT-bin edges → argmax center + half-magnitude width → renormalized
   Gabor wavelets).
2. FORWARD parity with ported weights, covering the squared-modulus
   pooling (avg_pool(x²)·2 — no sqrt), the reference's (n−1)-shifted
   hanning lowpass, preemphasis conv edge semantics (trailing −α·x[T−1]
   sample), log compression, and instance-norm mvn.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speakerverification_tpu.models.tdfbanks import (  # noqa: E402
    TDFbanks,
    _gabor_init,
)


@pytest.fixture(scope="module")
def ref_tdfbanks():
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from models.FeatureExtraction.TDFbanks import tdfbanks as m

    return m


def _ref_net(m, nfilters=40, sr=16000, preemp=False, mvn=False):
    net = m.TDFbanks(mode="learnfbanks", nfilters=nfilters, samplerate=sr,
                     wlen=25, wstride=10, preemp=preemp, mvn=mvn)
    net.initialize(min_freq=0, max_freq=sr // 2, nfft=512)
    net.eval()
    return net


def test_gabor_init_parity(ref_tdfbanks):
    """Our init == the reference's initialize() kernels, element-wise."""
    net = _ref_net(ref_tdfbanks)
    ref_w = net.complex_conv.weight.detach().numpy()      # [2n, 1, k]
    got = _gabor_init(40, 16000, ref_w.shape[-1])         # [k, 1, 2n]
    np.testing.assert_allclose(got.transpose(2, 1, 0), ref_w,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("preemp,mvn", [(False, False), (False, True),
                                        (True, True)])
def test_tdfbanks_forward_parity(ref_tdfbanks, preemp, mvn):
    net = _ref_net(ref_tdfbanks, preemp=preemp, mvn=mvn)
    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.2, (1, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(wave)).numpy()         # [1, n, frames]

    ours = TDFbanks(nfilters=40, sample_rate=16000, preemp=preemp, mvn=mvn)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(wave))
    # port the (possibly trained) complex conv weights
    params = {"gabor_kernel": jnp.asarray(
        net.complex_conv.weight.detach().numpy().transpose(2, 1, 0))}
    assert variables["params"]["gabor_kernel"].shape \
        == params["gabor_kernel"].shape
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(wave)))
    out = out.transpose(0, 2, 1)                          # [1, n, frames]
    assert out.shape == ref.shape, (out.shape, ref.shape)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 2e-3


def test_tdfbanks_trained_weights_port(ref_tdfbanks):
    """Parity must hold for weights that have drifted from init (the
    port path a user of a trained reference checkpoint takes)."""
    net = _ref_net(ref_tdfbanks)
    with torch.no_grad():                                  # perturb ≈ training
        net.complex_conv.weight += 0.01 * torch.randn_like(
            net.complex_conv.weight)
    rng = np.random.default_rng(1)
    wave = rng.normal(0, 0.2, (1, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(wave)).numpy()

    ours = TDFbanks(nfilters=40, sample_rate=16000)
    params = {"gabor_kernel": jnp.asarray(
        net.complex_conv.weight.detach().numpy().transpose(2, 1, 0))}
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(wave)))
    out = out.transpose(0, 2, 1)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-3
