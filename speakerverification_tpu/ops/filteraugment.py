"""FilterAugment suite: on-device feature-domain augmentations.

Parity target: src/models/OnStreamAugment/FilterAugment.py:11-224
(frame_shift / mixup / time_mask / feature_transformation /
filt_aug_prototype / filt_aug / freq_mask / add_noise from the
FilterAugSED lineage). Exact draw-for-draw ports — every random
quantity the reference draws (per-example shifts, per-example mask
widths/positions, band counts, integer band boundaries, per-band dB
gains, per-example SNRs, the noise tensor) is drawn with the same
distribution and consumed by the same math, proven by injected-draw
live tests (tests/test_filteraugment_live_parity.py).

Layout: the reference operates on DCASE-style ``[B, F, T]``
mel-spectrograms (time last); this module uses the frontend's
``[B, T, F]`` (channels-last) with the same semantic axes — "time"
ops act on axis 1, "frequency" ops on axis 2.

All ops are RNG-keyed pure functions with static shapes so they trace
into the train step; band counts and boundaries ride as traced scalars
over a static ``n_band`` maximum.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["frame_shift", "mixup", "time_mask", "filt_aug",
           "filt_aug_prototype", "freq_mask", "add_noise",
           "feature_transformation"]


def frame_shift(rng: jax.Array, x: jax.Array, sigma: float = 90.0) -> jax.Array:
    """Per-example circular time shift, shift = int(gauss(0, sigma))
    (parity: FilterAugment.py:11-29 — ``torch.roll`` along time; int()
    truncates toward zero, as does the int32 cast here)."""
    B, T, F = x.shape
    shifts = (jax.random.normal(rng, (B,)) * sigma).astype(jnp.int32)
    idx = (jnp.arange(T)[None, :] - shifts[:, None]) % T
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def mixup(rng: jax.Array, x: jax.Array, label=None, alpha: float = 0.2,
          beta: float = 0.2, mixup_label_type: str = "soft",
          permutation=None, c=None):
    """Beta-mix features with a random batch permutation
    (parity: FilterAugment.py:32-61). ``permutation`` and ``c`` may be
    supplied explicitly — the reference API supports the same injection,
    and it makes mixup reproducible across frameworks."""
    k_perm, k_c = jax.random.split(rng)
    perm = (jax.random.permutation(k_perm, x.shape[0])
            if permutation is None else jnp.asarray(permutation))
    if c is None:
        c = jax.random.beta(k_c, alpha, beta)
        if mixup_label_type == "hard":
            c = c * 0.4 + 0.3
    mixed = c * x + (1 - c) * x[perm]
    if label is None:
        return mixed
    if mixup_label_type == "soft":
        mixed_label = jnp.clip(c * label + (1 - c) * label[perm], 0, 1)
    else:
        mixed_label = jnp.clip(label + label[perm], 0, 1)
    return mixed, mixed_label


def time_mask(rng: jax.Array, x: jax.Array,
              mask_ratios: Tuple[int, int] = (10, 20)) -> jax.Array:
    """Zero ONE time interval, shared across the batch: width ∈
    [T/ratios[1], T/ratios[0]), start ∈ [0, T−width)
    (parity: FilterAugment.py:64-80)."""
    B, T, F = x.shape
    k_w, k_p = jax.random.split(rng)
    lo, hi = T // mask_ratios[1], T // mask_ratios[0]
    width = jax.random.randint(k_w, (), lo, max(hi, lo + 1))
    start = jax.random.randint(k_p, (), 0, jnp.maximum(T - width, 1))
    t = jnp.arange(T)
    mask = (t >= start) & (t < start + width)
    return jnp.where(mask[None, :, None], 0.0, x)


def _band_gain_filter(x: jax.Array, n: jax.Array, interior_db_sorted,
                      gains, linear_db) -> jax.Array:
    """Multiply ``x`` by a per-example piecewise band filter.

    ``interior_db_sorted``: [n_max−1] absolute interior boundaries
    (entries at positions ≥ n−1 must already be pinned to F so trailing
    bands are empty). ``gains``: [B, G] per-band values — dB when
    ``linear_db`` (interpolated between consecutive entries inside each
    band, torch.linspace endpoint semantics, then 10**(·/20)), already
    amplitude otherwise (step fill).
    """
    B, T, F = x.shape
    bounds = jnp.concatenate([jnp.zeros((1,), interior_db_sorted.dtype),
                              interior_db_sorted,
                              jnp.full((1,), F, interior_db_sorted.dtype)])
    f = jnp.arange(F)
    # band owning bin f = number of interior boundaries ≤ f (the LAST
    # band starting at or before f — matches the reference's sequential
    # in-place fills where a later band overwrites a shared boundary)
    band_idx = jnp.sum(f[:, None] >= interior_db_sorted[None, :], axis=-1)
    g0 = gains[:, band_idx]                                    # [B, F]
    if linear_db:
        g1 = gains[:, jnp.minimum(band_idx + 1, gains.shape[1] - 1)]
        lo = bounds[band_idx].astype(jnp.float32)
        hi = bounds[band_idx + 1].astype(jnp.float32)
        k = f.astype(jnp.float32) - lo
        m1 = jnp.maximum(hi - lo - 1.0, 1.0)        # linspace(m)==a at m==1
        amp = 10.0 ** ((g0 + (g1 - g0) * k[None, :] / m1[None, :]) / 20.0)
    else:
        amp = g0
    amp = jnp.where(n > 1, amp, jnp.ones_like(amp))
    return x * amp[:, None, :]


def _filt_aug_branch(rng: jax.Array, x: jax.Array,
                     db_range: Tuple[float, float],
                     n_band: Tuple[int, int], min_bw: int,
                     filter_type: str) -> jax.Array:
    B, T, F = x.shape
    k_n, k_bound, k_gain = jax.random.split(rng, 3)
    n_max = max(n_band[1] - 1, 2)                  # randint is [low, high)
    n = jax.random.randint(k_n, (), n_band[0], n_band[1])
    # reference: while F - n*min_bw + 1 < 0: min_bw -= 1
    bw = jnp.minimum(min_bw, (F + 1) // jnp.maximum(n, 1))
    raw = jax.random.randint(k_bound, (n_max - 1,), 0,
                             jnp.maximum(F - n * bw + 1, 1))
    # only the first n−1 draws are real: park the rest at F before the
    # sort so they land last, then pin positions ≥ n−1 to F (empty bands)
    slot = jnp.arange(n_max - 1)
    raw = jnp.where(slot < n - 1, raw, F)
    interior = jnp.sort(raw) + jnp.where(slot < n - 1, (slot + 1) * bw, 0)
    interior = jnp.minimum(interior, F)
    if filter_type == "step":
        g_db = jax.random.uniform(k_gain, (B, n_max),
                                  minval=db_range[0], maxval=db_range[1])
        gains = 10.0 ** (g_db / 20.0)
        return _band_gain_filter(x, n, interior, gains, linear_db=False)
    g_db = jax.random.uniform(k_gain, (B, n_max + 1),
                              minval=db_range[0], maxval=db_range[1])
    return _band_gain_filter(x, n, interior, g_db, linear_db=True)


def filt_aug(rng: jax.Array, x: jax.Array,
             db_range: Sequence[float] = (-6.0, 6.0),
             n_band: Sequence[int] = (3, 6), min_bw: int = 6,
             filter_type: Union[str, float] = "linear") -> jax.Array:
    """Updated (ICASSP 2022) FilterAugment
    (parity: FilterAugment.py:142-192): split the mel axis into
    n ∈ [n_band[0], n_band[1]) bands at sorted integer boundaries with
    minimum bandwidth, draw per-example per-band dB gains, fill stepwise
    or with torch.linspace endpoint interpolation, apply 10**(dB/20).

    A float ``filter_type`` is the reference's mixed mode: with that
    probability use the step parameterisation (n_band=[2,5], min_bw=4),
    else linear ([3,6], 6). Under tracing both branches are evaluated
    from independent subkeys and selected — same distribution, not the
    same draw stream as the reference's host-side branch.
    """
    if isinstance(filter_type, str):
        return _filt_aug_branch(rng, x, tuple(db_range), tuple(n_band),
                                min_bw, filter_type)
    k_choice, k_step, k_lin = jax.random.split(rng, 3)
    take_step = jax.random.uniform(k_choice, ()) < filter_type
    step = _filt_aug_branch(k_step, x, tuple(db_range), (2, 5), 4, "step")
    lin = _filt_aug_branch(k_lin, x, tuple(db_range), (3, 6), 6, "linear")
    return jnp.where(take_step, step, lin)


def filt_aug_prototype(rng: jax.Array, x: jax.Array,
                       db_range: Sequence[float] = (-7.5, 6.0),
                       n_bands: Sequence[int] = (2, 5)) -> jax.Array:
    """Prototype (DCASE 2021) FilterAugment
    (parity: FilterAugment.py:119-139): n ∈ [n_bands[0], n_bands[1])
    bands at sorted boundaries drawn from [1, F−1), per-example per-band
    step gains 10**(U(db_range)/20). Duplicate boundaries yield empty
    bands, later bands winning shared boundaries, as in the reference's
    sequential fills."""
    B, T, F = x.shape
    k_n, k_bound, k_gain = jax.random.split(rng, 3)
    n_max = max(n_bands[1] - 1, 2)
    n = jax.random.randint(k_n, (), n_bands[0], n_bands[1])
    raw = jax.random.randint(k_bound, (n_max - 1,), 1, max(F - 1, 2))
    slot = jnp.arange(n_max - 1)
    interior = jnp.sort(jnp.where(slot < n - 1, raw, F))
    interior = jnp.minimum(interior, F)
    g_db = jax.random.uniform(k_gain, (B, n_max),
                              minval=db_range[0], maxval=db_range[1])
    gains = 10.0 ** (g_db / 20.0)
    return _band_gain_filter(x, n, interior, gains, linear_db=False)


def freq_mask(rng: jax.Array, x: jax.Array,
              mask_ratio: int = 16) -> jax.Array:
    """Zero one frequency band PER EXAMPLE: width_i ∈ [1, F/ratio)
    (1 when F/ratio == 1), start_i ∈ [0, F−width_i)
    (parity: FilterAugment.py:195-209)."""
    B, T, F = x.shape
    k_w, k_p = jax.random.split(rng)
    max_mask = int(F / mask_ratio)
    if max_mask <= 1:
        widths = jnp.ones((B,), jnp.int32)
    else:
        widths = jax.random.randint(k_w, (B,), 1, max_mask)
    starts = jax.random.randint(k_p, (B,), 0, jnp.maximum(F - widths, 1))
    f = jnp.arange(F)[None, :]
    mask = (f >= starts[:, None]) & (f < (starts + widths)[:, None])
    return jnp.where(mask[:, None, :], 0.0, x)


def add_noise(rng: jax.Array, x: jax.Array,
              snrs: Union[Sequence[float], float] = (15.0, 30.0),
              dims: Tuple[int, int] = (1, 2)) -> jax.Array:
    """Additive white noise at a per-example feature-domain SNR:
    snr_i = (snrs[0]−snrs[1])·U[0,1) + snrs[1], noise std =
    unbiased-std(x, dims)/10**(snr/20)
    (parity: FilterAugment.py:212-224 — torch.std is Bessel-corrected)."""
    k_snr, k_noise = jax.random.split(rng)
    if isinstance(snrs, (list, tuple)):
        u = jax.random.uniform(k_snr, (x.shape[0],) + (1,) * (x.ndim - 1))
        snr = (snrs[0] - snrs[1]) * u + snrs[1]
    else:
        snr = jnp.asarray(snrs, x.dtype)
    amp = 10.0 ** (snr / 20.0)
    sigma = jnp.std(x, axis=dims, keepdims=True, ddof=1) / amp
    return x + jax.random.normal(k_noise, x.shape, x.dtype) * sigma


def feature_transformation(rng: jax.Array, x: jax.Array, n_transform: int,
                           choice: Sequence[bool],
                           filtaug_choice: str = "updated",
                           filter_db_range: Sequence[float] = (-6.0, 6.0),
                           filter_bands: Sequence[int] = (3, 6),
                           filter_minimum_bandwidth: int = 6,
                           filter_type: Union[str, float] = "linear",
                           freq_mask_ratio: int = 16,
                           noise_snrs: Sequence[float] = (15.0, 30.0)):
    """Reference dispatcher (FilterAugment.py:83-116): apply the
    (filt_aug?, freq_mask?, add_noise?) ``choice`` pipeline
    ``n_transform`` times with independent draws (2 → two independently
    augmented views; 1 → one view duplicated; else passthrough pair)."""
    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        y = x
        if choice[0]:
            if filtaug_choice == "prototype":
                y = filt_aug_prototype(k1, y, db_range=filter_db_range,
                                       n_bands=filter_bands)
            else:
                y = filt_aug(k1, y, db_range=filter_db_range,
                             n_band=filter_bands,
                             min_bw=filter_minimum_bandwidth,
                             filter_type=filter_type)
        if choice[1]:
            y = freq_mask(k2, y, mask_ratio=freq_mask_ratio)
        if choice[2]:
            y = add_noise(k3, y, snrs=noise_snrs)
        return y

    if n_transform == 2:
        ka, kb = jax.random.split(rng)
        return [one(ka), one(kb)]
    if n_transform == 1:
        y = one(rng)
        return [y, y]
    return [x, x]
