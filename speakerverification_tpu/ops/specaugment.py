"""On-device SpecAugment: time warp + frequency/time masking.

TPU-native rebuild of the reference's SpecAugment
(src/models/OnStreamAugment/specaugment.py:8-80, arXiv:1904.08779).
Everything is expressed with static shapes and vectorized masks so it
traces into the training step:

* masking builds boolean interval masks from uniform random (pos, len)
  pairs — identical math to the reference's ``mask_along_axis``;
* time warp is an EXACT port of the reference's two-segment bicubic
  ``F.interpolate(align_corners=True)`` (specaugment.py:88-120): since
  the freq axis is resized to its own length, torch's bicubic reduces
  to 1-D Keys cubic convolution (a = −0.75) along time, which we
  evaluate as a static-shape 4-tap gather with traced segment bounds
  (pivot ``c`` and target ``w`` are traced scalars, per-segment index
  clamping mirrors torch's ``upsample_get_value_bounded``).

Input layout is ``[B, T, F]`` (channels-last), the frontend's output.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["SpecAugmentConfig", "spec_augment"]


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    time_warp: bool = True
    time_warp_window: int = 5
    freq_mask: bool = True
    freq_mask_width: Tuple[int, int] = (0, 20)
    n_freq_mask: int = 2
    time_mask: bool = True
    time_mask_width: Tuple[int, int] = (0, 20)
    n_time_mask: int = 2
    replace_with_zero: bool = True


def _mask_along_axis(rng: jax.Array, x: jax.Array, axis_len: int,
                     n_mask: int, width: Tuple[int, int], axis: int,
                     fill: jax.Array | None) -> jax.Array:
    """Randomly zero ``n_mask`` intervals of width ∈ [w0, w1) along ``axis``.

    Math parity with src/models/OnStreamAugment/specaugment.py:131-180:
    per-example mask lengths then positions in [0, D - max_len);
    ``fill=None`` replaces with the mean of the CURRENT tensor (the
    reference recomputes ``x.mean()`` at each mask stage, so a second
    mask's fill reflects the first mask's effect).
    """
    if fill is None:
        fill = jnp.mean(x)
    B = x.shape[0]
    k_len, k_pos = jax.random.split(rng)
    w0, w1 = width
    w1 = max(w1, w0 + 1)
    mask_len = jax.random.randint(k_len, (B, n_mask, 1), w0, w1)
    max_len = jnp.max(mask_len)
    mask_pos = jax.random.randint(k_pos, (B, n_mask, 1), 0,
                                  jnp.maximum(1, axis_len - max_len))
    arange = jnp.arange(axis_len)[None, None, :]
    mask = (mask_pos <= arange) & (arange < mask_pos + mask_len)
    mask = jnp.any(mask, axis=1)                      # [B, axis_len]
    shape = [B, 1, 1]
    shape[axis] = axis_len
    mask = mask.reshape(shape)
    return jnp.where(mask, fill, x)


_CUBIC_A = -0.75


def _cubic_coeffs(t: jax.Array):
    """torch's get_cubic_upsample_coefficients (UpSample.h), A = −0.75.

    Returns the 4 Keys-kernel tap weights for samples at
    floor−1 … floor+2 given the fractional offset ``t`` ∈ [0, 1).
    """
    a = _CUBIC_A

    def c1(x):                                   # |x| ≤ 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def c2(x):                                   # 1 < |x| ≤ 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return c2(t + 1.0), c1(t), c1(1.0 - t), c2(2.0 - t)


def _time_warp(rng: jax.Array, x: jax.Array, window: int) -> jax.Array:
    """Exact reference time warp (specaugment.py:88-120).

    Pivot ``c`` ∈ [window, T−window) moves to ``w`` ∈ [c−window+1,
    c+window]; segment [0, c) is cubic-resampled to length ``w`` and
    [c, T) to ``T−w`` with torch ``align_corners=True`` coordinates
    (source = i·(in−1)/(out−1), 0 when out == 1) and per-segment edge
    clamping. Evaluated as one static-shape 4-tap gather over traced
    (c, w) — jit-friendly, no dynamic shapes.
    """
    B, T, F = x.shape
    if T - window <= window:
        return x
    k_c, k_w = jax.random.split(rng)
    c = jax.random.randint(k_c, (), window, T - window)
    w = jax.random.randint(k_w, (), c - window, c + window) + 1

    xf = x.astype(jnp.float32)
    cf, wf, Tf = (c.astype(jnp.float32), w.astype(jnp.float32),
                  jnp.float32(T))
    t_out = jnp.arange(T, dtype=jnp.float32)
    left = t_out < wf
    loc_out = jnp.where(left, t_out, t_out - wf)  # segment-local output idx
    out_len = jnp.where(left, wf, Tf - wf)
    in_len = jnp.where(left, cf, Tf - cf)
    seg0 = jnp.where(left, 0.0, cf)               # segment start (absolute)
    scale = jnp.where(out_len > 1.0,
                      (in_len - 1.0) / jnp.maximum(out_len - 1.0, 1.0), 0.0)
    src = loc_out * scale
    i0 = jnp.floor(src)
    w_m1, w_0, w_p1, w_p2 = _cubic_coeffs(src - i0)
    out = jnp.zeros_like(xf)
    for k, wt in zip((-1.0, 0.0, 1.0, 2.0), (w_m1, w_0, w_p1, w_p2)):
        idx = (jnp.clip(i0 + k, 0.0, in_len - 1.0) + seg0).astype(jnp.int32)
        out = out + wt[None, :, None] * xf[:, idx, :]
    return out.astype(x.dtype)


def spec_augment(rng: jax.Array, x: jax.Array,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> jax.Array:
    """Apply SpecAugment to ``[B, T, F]`` features under a PRNG key."""
    k_warp, k_freq, k_time = jax.random.split(rng, 3)
    # replace_with_zero=False recomputes the mean inside each mask stage
    # (fill=None), matching the reference's per-call x.mean()
    fill = jnp.zeros((), x.dtype) if cfg.replace_with_zero else None
    # Stage order mirrors the reference literally: axis 1 (T) is masked
    # first, then axis 2 (F). NOTE the reference's mask_along_axis reads
    # [B, T, F] as ``batch, fea, time`` (specaugment.py:139), so its
    # "freq" stage (dim=1) actually masks TIME and its "time" stage
    # (dim=2) masks FREQ — invisible there because every reference call
    # site uses the symmetric default config. We keep the paper-correct
    # param→axis mapping (freq params mask F) but the reference's axis
    # ORDER, so at symmetric configs behavior matches draw-for-draw
    # (incl. the per-stage mean fill; tests/test_specaugment_live_parity.py).
    if cfg.time_warp:
        x = _time_warp(k_warp, x, cfg.time_warp_window)
    if cfg.time_mask:
        x = _mask_along_axis(k_time, x, x.shape[1], cfg.n_time_mask,
                             cfg.time_mask_width, axis=1, fill=fill)
    if cfg.freq_mask:
        x = _mask_along_axis(k_freq, x, x.shape[2], cfg.n_freq_mask,
                             cfg.freq_mask_width, axis=2, fill=fill)
    return x
