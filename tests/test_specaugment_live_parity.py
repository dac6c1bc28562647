"""Live-torch parity for SpecAugment's masking math.

The reference's SpecAugment (src/models/OnStreamAugment/specaugment.py
— pure torch once the unused torchaudio import is stubbed) draws
(mask_len, mask_pos) with ``torch.randint``; our ``_mask_along_axis``
draws the same pairs with ``jax.random.randint``. Here BOTH samplers
are monkeypatched to return identical preset draws, making the mask
construction a pure function compared exactly: interval unions per
example, time (dim=2) and frequency (dim=1) axes, zero fill and the
mean fill (which the reference recomputes per mask stage — our
``fill=None`` path).

The time-warp stage is compared the same way: both (c, w) draws are
injected, and our static-shape 4-tap Keys-cubic gather must match the
reference's two-segment ``F.interpolate(mode="bicubic",
align_corners=True)`` resize exactly (the freq axis is resized to its
own length, so torch's bicubic reduces to 1-D cubic along time).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speakerverification_tpu.ops import specaugment as SA  # noqa: E402


@pytest.fixture(scope="module")
def ref_specaugment():
    from test_torch_parity import _install_asteroid_stub

    _install_asteroid_stub()                 # provides the torchaudio stub
    path = "/root/reference/src/models/OnStreamAugment"
    if path not in sys.path:
        sys.path.insert(0, path)
    import specaugment as m

    return m


class _TorchQueue:
    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, low, high, size, **kw):
        return torch.from_numpy(self.draws.pop(0).reshape(size))


class _JaxQueue:
    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, key, shape, minval, maxval, dtype=jnp.int32):
        return jnp.asarray(self.draws.pop(0).reshape(shape), dtype)


@pytest.mark.parametrize("dim,replace_with_zero", [(1, True), (2, True),
                                                   (1, False), (2, False)])
def test_mask_along_axis_parity(ref_specaugment, monkeypatch, dim,
                                replace_with_zero):
    B, T, F = 4, 50, 24
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (B, T, F)).astype(np.float32)
    n_mask = 2
    lens = rng.integers(0, 12, (B, n_mask)).astype(np.int64)
    poss = rng.integers(0, 20, (B, n_mask)).astype(np.int64)

    aug = ref_specaugment.SpecAugment(
        time_warp=False, freq_mask=dim == 1, n_freq_mask=n_mask,
        time_mask=dim == 2, n_time_mask=n_mask,
        freq_mask_width=(0, 12), time_mask_width=(0, 12),
        replace_with_zero=replace_with_zero)
    monkeypatch.setattr(torch, "randint", _TorchQueue([lens, poss]))
    # reference layout: (Batch, Time, Freq); dim=1 masks Time? No —
    # forward() calls mask_along_axis(x, dim=1) for FREQ on [B, T, F]
    # after its own view: batch, fea, time = x.shape reads [B, T, F] as
    # fea=T, time=F — i.e. dim=2 masks the LAST axis (F), dim=1 the
    # middle (T). We mirror that literal behavior.
    ref = aug(torch.from_numpy(feats.copy())).numpy()
    monkeypatch.undo()

    monkeypatch.setattr(SA.jax.random, "randint", _JaxQueue([lens, poss]))
    axis = 1 if dim == 1 else 2
    fill = (jnp.zeros((), jnp.float32) if replace_with_zero else None)
    got = np.asarray(SA._mask_along_axis(
        jax.random.PRNGKey(0), jnp.asarray(feats), feats.shape[axis],
        n_mask, (0, 12), axis=axis, fill=fill))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("c,w_raw", [(20, 14), (20, 25), (20, 19),
                                     (5, 0), (44, 44)])
def test_time_warp_parity(ref_specaugment, monkeypatch, c, w_raw):
    """Injected (c, w) draws: compress, stretch, identity (w==c), and
    both edge pivots. w = w_raw + 1 per the reference's +1."""
    B, T, F = 3, 50, 24
    window = 5
    rng = np.random.default_rng(7)
    feats = rng.normal(0, 1, (B, T, F)).astype(np.float32)
    draws = [np.array([c], dtype=np.int64), np.array([w_raw], dtype=np.int64)]

    aug = ref_specaugment.SpecAugment(
        time_warp=True, time_warp_window=window,
        freq_mask=False, time_mask=False)
    monkeypatch.setattr(torch, "randint", _TorchQueue([d.copy() for d in draws]))
    ref = aug(torch.from_numpy(feats.copy())).numpy()
    monkeypatch.undo()

    monkeypatch.setattr(SA.jax.random, "randint", _JaxQueue(draws))
    got = np.asarray(SA._time_warp(jax.random.PRNGKey(0),
                                   jnp.asarray(feats), window))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_time_warp_random_draw_sweep(ref_specaugment, monkeypatch):
    """20 random (c, w) pairs through both implementations."""
    B, T, F = 2, 61, 16
    window = 5
    rng = np.random.default_rng(11)
    feats = rng.normal(0, 1, (B, T, F)).astype(np.float32)
    aug = ref_specaugment.SpecAugment(
        time_warp=True, time_warp_window=window,
        freq_mask=False, time_mask=False)
    for _ in range(20):
        c = int(rng.integers(window, T - window))
        w_raw = int(rng.integers(c - window, c + window))
        draws = [np.array([c], dtype=np.int64),
                 np.array([w_raw], dtype=np.int64)]
        monkeypatch.setattr(torch, "randint",
                            _TorchQueue([d.copy() for d in draws]))
        ref = aug(torch.from_numpy(feats.copy())).numpy()
        monkeypatch.undo()
        monkeypatch.setattr(SA.jax.random, "randint", _JaxQueue(draws))
        got = np.asarray(SA._time_warp(jax.random.PRNGKey(0),
                                       jnp.asarray(feats), window))
        monkeypatch.undo()
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6,
                                   err_msg=f"c={c} w={w_raw + 1}")


def test_mean_fill_recomputed_per_stage(ref_specaugment, monkeypatch):
    """Two mask stages with replace_with_zero=False: the second stage's
    fill must reflect the first stage's output (reference semantics)."""
    B, T, F = 2, 40, 16
    rng = np.random.default_rng(3)
    feats = (rng.normal(0, 1, (B, T, F)) + 2.0).astype(np.float32)
    n_mask = 1
    draws = [rng.integers(4, 10, (B, n_mask)).astype(np.int64),
             rng.integers(0, 20, (B, n_mask)).astype(np.int64),
             rng.integers(4, 10, (B, n_mask)).astype(np.int64),
             rng.integers(0, 6, (B, n_mask)).astype(np.int64)]

    aug = ref_specaugment.SpecAugment(
        time_warp=False, freq_mask=True, n_freq_mask=n_mask,
        time_mask=True, n_time_mask=n_mask,
        freq_mask_width=(0, 12), time_mask_width=(0, 12),
        replace_with_zero=False)
    monkeypatch.setattr(torch, "randint", _TorchQueue([d.copy() for d in draws]))
    ref = aug(torch.from_numpy(feats.copy())).numpy()
    monkeypatch.undo()

    monkeypatch.setattr(SA.jax.random, "randint", _JaxQueue(draws))
    cfg = SA.SpecAugmentConfig(time_warp=False, n_freq_mask=n_mask,
                               n_time_mask=n_mask, freq_mask_width=(0, 12),
                               time_mask_width=(0, 12),
                               replace_with_zero=False)
    got = np.asarray(SA.spec_augment(jax.random.PRNGKey(0),
                                     jnp.asarray(feats), cfg))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_warp_overshoot_nans_reference_log_not_ours(ref_specaugment,
                                                    monkeypatch):
    """ASSERTED DIVERGENCE (bug-fix direction): the bicubic time warp
    overshoots LINEAR-power mel negative; the reference's subsequent
    ``(x + 1e-6).log()`` (src/models/ECAPA_TDNN.py:473-475 — its own
    comment admits the NaN hazard) then poisons the whole run. Our
    in-model logs clamp at 0 and stay finite, bit-identical whenever
    the input is non-negative."""
    B, T, F = 1, 50, 8
    # sharp power spike next to near-silence → strong cubic overshoot
    feats = np.full((B, T, F), 1e-7, dtype=np.float32)
    feats[:, 20, :] = 1.0
    feats[:, 22, :] = 1.0
    draws = [np.array([20], dtype=np.int64), np.array([15], dtype=np.int64)]

    aug = ref_specaugment.SpecAugment(
        time_warp=True, time_warp_window=5,
        freq_mask=False, time_mask=False)
    monkeypatch.setattr(torch, "randint",
                        _TorchQueue([d.copy() for d in draws]))
    warped = aug(torch.from_numpy(feats.copy()))
    monkeypatch.undo()
    assert float(warped.min()) < -1e-6, "input no longer overshoots"
    ref_log = (warped + 1e-6).log().numpy()        # the reference's line
    assert np.isnan(ref_log).any(), "reference log should NaN here"

    monkeypatch.setattr(SA.jax.random, "randint", _JaxQueue(draws))
    got = np.asarray(SA._time_warp(jax.random.PRNGKey(0),
                                   jnp.asarray(feats), 5))
    monkeypatch.undo()
    ours_log = np.log(np.maximum(got, 0.0) + 1e-6)  # our in-model line
    assert np.isfinite(ours_log).all()
