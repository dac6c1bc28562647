"""Extra feature-stack ops: deltas, context window, ISTFT.

Parity target: the SpeechBrain feature copy
(src/models/FeatureExtraction/features_speechbrain.py:44-847): ``Deltas``
(moving-regression derivative over time), ``ContextWindow`` (frame
splicing of ±context frames), and ``ISTFT`` (inverse STFT via
overlap-add with squared-window normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from speakerverification_tpu.ops.frontend import FrontendConfig, dft_matrices
from speakerverification_tpu.ops.signal import overlap_and_add

__all__ = ["deltas", "context_window", "istft"]


def deltas(x: jax.Array, window_length: int = 5) -> jax.Array:
    """Time derivative via linear regression over ±n frames
    (features_speechbrain ``Deltas``). ``x``: [B, T, F]."""
    n = (window_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3.0
    kernel = jnp.arange(-n, n + 1, dtype=x.dtype) / denom     # [-n..n]/denom
    xt = jnp.moveaxis(x, 1, -1)                               # [B, F, T]
    pad = jnp.pad(xt, ((0, 0), (0, 0), (n, n)), mode="edge")

    def conv_row(row):
        return jnp.convolve(row, kernel[::-1], mode="valid")

    out = jax.vmap(jax.vmap(conv_row))(pad)
    return jnp.moveaxis(out, -1, 1)


def context_window(x: jax.Array, left_frames: int = 5,
                   right_frames: int = 5) -> jax.Array:
    """Frame splicing: concat ±context frames per step
    (features_speechbrain ``ContextWindow``). [B, T, F] → [B, T, F*(l+r+1)]."""
    B, T, F = x.shape
    pads = []
    for offset in range(-left_frames, right_frames + 1):
        idx = jnp.clip(jnp.arange(T) + offset, 0, T - 1)
        pads.append(x[:, idx, :])
    return jnp.concatenate(pads, axis=-1)


def istft(real: jax.Array, imag: jax.Array,
          cfg: FrontendConfig = FrontendConfig(),
          length: int | None = None) -> jax.Array:
    """Inverse STFT by synthesis-window overlap-add
    (features_speechbrain ``ISTFT``). Inputs ``[B, frames, bins]``."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    K = n_fft // 2 + 1
    # inverse real DFT basis (unwindowed)
    n = np.arange(n_fft)[:, None]
    k = np.arange(K)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    weight = np.ones(K)
    weight[1:-1 if n_fft % 2 == 0 else None] = 2.0
    inv_cos = jnp.asarray((np.cos(angle) * weight / n_fft).astype(np.float32))
    inv_sin = jnp.asarray((np.sin(angle) * weight / n_fft).astype(np.float32))

    # NOTE: the frontend's "imag" is frames @ sin-basis = −Im(rFFT), so the
    # synthesis combines with a plus sign.
    frames = (jnp.einsum("bfk,nk->bfn", real, inv_cos)
              + jnp.einsum("bfk,nk->bfn", imag, inv_sin))    # [B, F, n_fft]

    # synthesis window = analysis window; normalize by sum of squares
    cos_b, _ = dft_matrices(n_fft, cfg.win_length, cfg.window)
    window = jnp.asarray((cos_b[:, 0]).astype(np.float32))   # w * cos(0) = w
    sig = overlap_and_add(frames * window[None, None, :], hop)
    wsq = overlap_and_add(
        jnp.broadcast_to((window ** 2)[None, None, :],
                         frames.shape), hop)
    sig = sig / jnp.clip(wsq, 1e-8)
    pad = n_fft // 2
    sig = sig[..., pad:]
    if length is not None:
        sig = sig[..., :length]
    return sig
