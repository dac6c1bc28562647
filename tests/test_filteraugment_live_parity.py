"""Live-torch parity for the FilterAugment suite.

The reference (src/models/OnStreamAugment/FilterAugment.py — pure
torch + stdlib random) is driven on identical inputs with every random
draw injected into BOTH frameworks (torch.randint / torch.rand /
torch.randn / random.gauss on one side, jax.random.randint / uniform /
normal queues on the other), making each op a pure function compared
exactly: frame_shift, time_mask, freq_mask (per-example), add_noise
(per-example SNR, unbiased std), filt_aug linear + step (integer band
boundaries, min-bandwidth while-loop, linspace fills),
filt_aug_prototype (duplicate boundaries), and mixup (already covered
in test_signal_live_parity.py via the explicit injection API).

Layout: the reference operates on DCASE ``[B, F, T]``; ours on
``[B, T, F]`` — inputs/outputs are transposed at the test boundary.
Our traced ops draw padded static-max-shape vectors; queues feed the
real draws in the leading slots (trailing slots are masked out by the
implementations).
"""

from __future__ import annotations

import random as pyrandom
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speakerverification_tpu.ops import filteraugment as FA  # noqa: E402


@pytest.fixture(scope="module")
def ref_fa():
    path = "/root/reference/src/models/OnStreamAugment"
    if path not in sys.path:
        sys.path.insert(0, path)
    import FilterAugment as m

    return m


class _TorchIntQueue:
    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, low=0, high=None, size=None, **kw):
        if high is None:                      # positional (low, high, size)
            low, high, size = 0, low, high
        d = self.draws.pop(0)
        assert np.all((d >= int(low)) & (d < int(high))), (d, low, high)
        return torch.from_numpy(np.asarray(d).reshape(size))


class _TorchFloatQueue:
    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, *size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        return torch.from_numpy(self.draws.pop(0).reshape(size).astype(np.float32))


class _JaxIntQueue:
    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, key, shape, minval, maxval, dtype=jnp.int32):
        return jnp.asarray(self.draws.pop(0).reshape(shape), dtype)


class _JaxFloatQueue:
    """Returns preset FINAL values (minval/maxval scaling pre-applied)."""

    def __init__(self, draws):
        self.draws = list(draws)

    def __call__(self, key, shape=(), dtype=jnp.float32, **kw):
        return jnp.asarray(self.draws.pop(0).reshape(shape), dtype)


def _pad(a, n, fill=0):
    a = np.asarray(a)
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def _feats(B=3, T=40, F=32, seed=0):
    return np.random.default_rng(seed).normal(0, 1, (B, T, F)).astype(np.float32)


def test_frame_shift_parity(ref_fa, monkeypatch):
    x = _feats()
    B = x.shape[0]
    gauss = np.array([37.8, -12.2, 0.4])

    g_iter = iter(gauss.tolist())
    monkeypatch.setattr(pyrandom, "gauss", lambda mu, sigma: next(g_iter))
    ref = ref_fa.frame_shift(torch.from_numpy(x.transpose(0, 2, 1).copy()))
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    monkeypatch.setattr(FA.jax.random, "normal",
                        _JaxFloatQueue([gauss / 90.0]))
    got = np.asarray(FA.frame_shift(jax.random.PRNGKey(0), jnp.asarray(x)))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_time_mask_parity(ref_fa, monkeypatch):
    x = _feats(T=60)
    width, start = np.array([4]), np.array([17])

    monkeypatch.setattr(torch, "randint", _TorchIntQueue([width, start]))
    ref = ref_fa.time_mask(torch.from_numpy(x.transpose(0, 2, 1).copy()))
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    monkeypatch.setattr(FA.jax.random, "randint",
                        _JaxIntQueue([width, start]))
    got = np.asarray(FA.time_mask(jax.random.PRNGKey(0), jnp.asarray(x)))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_freq_mask_parity(ref_fa, monkeypatch):
    x = _feats(F=64)                                   # max_mask = 4
    B = x.shape[0]
    widths = np.array([1, 3, 2])
    lows = np.array([5, 60, 0])

    monkeypatch.setattr(torch, "randint", _TorchIntQueue(
        [widths] + [lows[i: i + 1] for i in range(B)]))
    ref = ref_fa.freq_mask(torch.from_numpy(x.transpose(0, 2, 1).copy()))
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    monkeypatch.setattr(FA.jax.random, "randint",
                        _JaxIntQueue([widths, lows]))
    got = np.asarray(FA.freq_mask(jax.random.PRNGKey(0), jnp.asarray(x)))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.parametrize("snrs", [(15.0, 30.0), 12.0])
def test_add_noise_parity(ref_fa, monkeypatch, snrs):
    x = _feats()
    B = x.shape[0]
    rng = np.random.default_rng(5)
    u = rng.random(B)
    noise = rng.normal(0, 1, x.shape).astype(np.float32)

    fq = [u.astype(np.float32)] if isinstance(snrs, tuple) else []
    monkeypatch.setattr(torch, "rand", _TorchFloatQueue([d.copy() for d in fq]))
    monkeypatch.setattr(torch, "randn", _TorchFloatQueue(
        [noise.transpose(0, 2, 1).copy()]))
    ref = ref_fa.add_noise(torch.from_numpy(x.transpose(0, 2, 1).copy()),
                           snrs=snrs)
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    # our add_noise scales a raw U[0,1) draw itself — inject u, not snr
    monkeypatch.setattr(FA.jax.random, "uniform", _JaxFloatQueue(
        [u] if isinstance(snrs, tuple) else []))
    monkeypatch.setattr(FA.jax.random, "normal", _JaxFloatQueue([noise]))
    got = np.asarray(FA.add_noise(jax.random.PRNGKey(0), jnp.asarray(x),
                                  snrs=snrs))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("filter_type,F,n,min_bw_in", [
    ("linear", 32, 4, 6),
    ("linear", 16, 4, 6),          # exercises the min_bw while-loop
    ("step", 32, 3, 4),
    ("linear", 32, 5, 6),          # n == n_band[1] - 1 (max bands)
])
def test_filt_aug_parity(ref_fa, monkeypatch, filter_type, F, n, min_bw_in):
    B, T = 3, 20
    x = _feats(B=B, T=T, F=F, seed=2)
    n_band = (3, 6)
    db = (-6.0, 6.0)
    rng = np.random.default_rng(9)

    # replicate the reference's min_bw loop to bound the boundary draws
    bw = min_bw_in
    while F - n * bw + 1 < 0:
        bw -= 1
    raw = rng.integers(0, F - n * bw + 1, (n - 1,))
    g_cols = n + 1 if filter_type == "linear" else n
    u = rng.random((B, g_cols))

    monkeypatch.setattr(torch, "randint",
                        _TorchIntQueue([np.array([n]), raw]))
    monkeypatch.setattr(torch, "rand", _TorchFloatQueue(
        [u.astype(np.float32).copy()]))
    ref = ref_fa.filt_aug(torch.from_numpy(x.transpose(0, 2, 1).copy()),
                          db_range=list(db), n_band=list(n_band),
                          min_bw=min_bw_in, filter_type=filter_type)
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    n_max = n_band[1] - 1
    g_db = u * (db[1] - db[0]) + db[0]
    g_pad = np.zeros((B, n_max + (1 if filter_type == "linear" else 0)))
    g_pad[:, :g_cols] = g_db
    monkeypatch.setattr(FA.jax.random, "randint", _JaxIntQueue(
        [np.array(n), _pad(raw, n_max - 1)]))
    monkeypatch.setattr(FA.jax.random, "uniform", _JaxFloatQueue([g_pad]))
    got = np.asarray(FA.filt_aug(jax.random.PRNGKey(0), jnp.asarray(x),
                                 db_range=db, n_band=n_band,
                                 min_bw=min_bw_in, filter_type=filter_type))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("bounds", [[7, 20], [11, 11]])  # incl. duplicate
def test_filt_aug_prototype_parity(ref_fa, monkeypatch, bounds):
    B, T, F = 3, 20, 32
    x = _feats(B=B, T=T, F=F, seed=3)
    n = len(bounds) + 1
    n_bands = (2, 5)
    db = (-7.5, 6.0)
    rng = np.random.default_rng(13)
    raw = np.asarray(bounds)
    u = rng.random((B, n))

    monkeypatch.setattr(torch, "randint",
                        _TorchIntQueue([np.array([n]), raw]))
    monkeypatch.setattr(torch, "rand", _TorchFloatQueue(
        [u.astype(np.float32).copy()]))
    ref = ref_fa.filt_aug_prototype(
        torch.from_numpy(x.transpose(0, 2, 1).copy()),
        db_range=db, n_bands=n_bands)
    ref = ref.numpy().transpose(0, 2, 1)
    monkeypatch.undo()

    n_max = n_bands[1] - 1
    g_pad = np.zeros((B, n_max))
    g_pad[:, :n] = u * (db[1] - db[0]) + db[0]
    monkeypatch.setattr(FA.jax.random, "randint", _JaxIntQueue(
        [np.array(n), _pad(raw, n_max - 1, fill=1)]))
    monkeypatch.setattr(FA.jax.random, "uniform", _JaxFloatQueue([g_pad]))
    got = np.asarray(FA.filt_aug_prototype(
        jax.random.PRNGKey(0), jnp.asarray(x), db_range=db, n_bands=n_bands))
    monkeypatch.undo()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_feature_transformation_shapes():
    """Dispatcher smoke: two independent views, duplicated view,
    passthrough (reference FilterAugment.py:83-116 control flow)."""
    x = jnp.asarray(_feats())
    k = jax.random.PRNGKey(0)
    two = FA.feature_transformation(k, x, 2, (True, True, True))
    assert len(two) == 2 and not np.allclose(np.asarray(two[0]),
                                             np.asarray(two[1]))
    one = FA.feature_transformation(k, x, 1, (False, True, False))
    assert np.allclose(np.asarray(one[0]), np.asarray(one[1]))
    none = FA.feature_transformation(k, x, 0, (True, True, True))
    assert np.allclose(np.asarray(none[0]), np.asarray(x))
