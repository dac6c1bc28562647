"""FilterAugment suite: on-device feature-domain augmentations.

Parity target: src/models/OnStreamAugment/FilterAugment.py:11-209
(frame_shift / mixup / time_mask / filt_aug / freq_mask / add_noise from
the FilterAugSED lineage). All ops are RNG-keyed pure functions on
``[B, T, F]`` features (channels-last), static shapes throughout so they
trace into the train step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["frame_shift", "mixup", "time_mask", "filt_aug", "freq_mask",
           "add_noise"]


def frame_shift(rng: jax.Array, x: jax.Array, sigma: float = 90.0) -> jax.Array:
    """Per-example circular time shift ~ N(0, sigma) frames
    (parity: FilterAugment.py:11-29)."""
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
    """Zero one time interval of width T/ratio ∈ [T/20, T/10)
    (parity: FilterAugment.py:64-80; one mask shared across the batch)."""
    B, T, F = x.shape
    k_w, k_p = jax.random.split(rng)
    lo, hi = max(T // mask_ratios[1], 1), max(T // mask_ratios[0], 2)
    width = jax.random.randint(k_w, (), lo, hi)
    start = jax.random.randint(k_p, (), 0, jnp.maximum(T - width, 1))
    t = jnp.arange(T)
    mask = (t >= start) & (t < start + width)
    return jnp.where(mask[None, :, None], 0.0, x)


def filt_aug(rng: jax.Array, x: jax.Array,
             db_range: Tuple[float, float] = (-6.0, 6.0),
             n_band: Tuple[int, int] = (3, 6), min_bw: int = 6,
             filter_type: str = "linear") -> jax.Array:
    """Random piecewise filter over frequency: split mels into bands,
    draw per-band gains in dB, interpolate across band boundaries
    (parity: FilterAugment.py filt_aug 'updated')."""
    B, T, F = x.shape
    k_n, k_bound, k_gain = jax.random.split(rng, 3)
    n_max = n_band[1]
    n = jax.random.randint(k_n, (), n_band[0], n_band[1] + 1)

    # random band boundaries (static max count; unused bands collapse)
    offs = jax.random.uniform(k_bound, (B, n_max - 1))
    bounds = jnp.sort(offs * (F - min_bw), axis=-1) + min_bw / 2
    gains_db = jax.random.uniform(k_gain, (B, n_max + 1),
                                  minval=db_range[0], maxval=db_range[1])

    freq = jnp.arange(F, dtype=jnp.float32)[None, :]          # [1, F]
    # piecewise-linear interpolation between band gains at boundaries
    band_idx = jnp.sum(freq[:, :, None] >= bounds[:, None, :], axis=-1)  # [B, F]
    g0 = jnp.take_along_axis(gains_db, band_idx, axis=1)
    if filter_type == "linear":
        g1 = jnp.take_along_axis(gains_db, jnp.minimum(band_idx + 1, n_max),
                                 axis=1)
        lower = jnp.concatenate([jnp.zeros((B, 1)), bounds], axis=1)
        upper = jnp.concatenate([bounds, jnp.full((B, 1), float(F))], axis=1)
        lo = jnp.take_along_axis(lower, band_idx, axis=1)
        hi = jnp.take_along_axis(upper, band_idx, axis=1)
        frac = jnp.clip((freq - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        gains = g0 * (1 - frac) + g1 * frac
    else:                                       # 'step'
        gains = g0
    amp = 10.0 ** (gains / 20.0)                              # [B, F]
    return x * amp[:, None, :]


def freq_mask(rng: jax.Array, x: jax.Array,
              mask_ratio: Tuple[int, int] = (10, 20)) -> jax.Array:
    """Zero one frequency band of width F/ratio (parity: freq_mask)."""
    B, T, F = x.shape
    k_w, k_p = jax.random.split(rng)
    lo, hi = max(F // mask_ratio[1], 1), max(F // mask_ratio[0], 2)
    width = jax.random.randint(k_w, (), lo, hi)
    start = jax.random.randint(k_p, (), 0, jnp.maximum(F - width, 1))
    f = jnp.arange(F)
    mask = (f >= start) & (f < start + width)
    return jnp.where(mask[None, None, :], 0.0, x)


def add_noise(rng: jax.Array, x: jax.Array,
              snrs: Tuple[float, float] = (30.0, 40.0)) -> jax.Array:
    """Additive white noise at a random feature-domain SNR (parity:
    add_noise)."""
    k_snr, k_noise = jax.random.split(rng)
    snr = jax.random.uniform(k_snr, (), minval=snrs[0], maxval=snrs[1])
    sig_pow = jnp.mean(x ** 2, axis=(1, 2), keepdims=True)
    noise_pow = sig_pow / (10.0 ** (snr / 10.0))
    noise = jax.random.normal(k_noise, x.shape) * jnp.sqrt(noise_pow)
    return x + noise
