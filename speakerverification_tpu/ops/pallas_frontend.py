"""Fused Pallas TPU kernel for the mel frontend's GEMM pipeline.

The XLA-path frontend (ops/frontend.py) materializes three large HBM
intermediates per batch: the overlapping frames, the complex DFT
projection (2·K_pad wide) and the power spectrum. For a batch of 128
2-second 16 kHz utterances those are ≈53 MB, ≈79 MB and ≈39 MB. This
kernel fuses

    proj  = frames @ [C ∥ S]     (MXU, n_fft × 2·K_pad)
    power = proj_C² + proj_S²    (VPU, stays in VMEM)
    mel   = power @ M            (MXU, K_pad × M_pad)

into one pass over 128-frame blocks, eliminating the proj/power HBM
round-trips (~70 % of the frontend's memory traffic). Frame extraction
remains an XLA gather: frames start at multiples of ``hop`` (80/160),
which Mosaic's (8, 128) tiling cannot slice on, so an in-kernel
overlapped gather would need per-row DMAs the hardware can't align
(measured: Mosaic rejects both dim-0 and dim-1 unaligned slices).

All matmul dimensions are padded to lane multiples; padded DFT bins have
zero basis columns and zero mel rows, so results are exact. Numerics
match ops/frontend.py (see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speakerverification_tpu.ops.frontend import (
    FrontendConfig,
    dft_matrices,
    frame_indices,
    mel_filterbank,
    pre_emphasis,
)

__all__ = ["make_pallas_mel_frontend"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _kernel_constants(cfg: FrontendConfig):
    cos_b, sin_b = dft_matrices(cfg.n_fft, cfg.win_length, cfg.window)
    K = cfg.n_fft // 2 + 1
    K_pad = _round_up(K, 128)
    M_pad = _round_up(cfg.n_mels, 128)

    cs = np.zeros((cfg.n_fft, 2 * K_pad), np.float32)
    cs[:, :K] = cos_b
    cs[:, K_pad:K_pad + K] = sin_b

    fb = mel_filterbank(K, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax,
                        cfg.mel_scale, cfg.mel_norm)
    mel = np.zeros((K_pad, M_pad), np.float32)
    mel[:K, :cfg.n_mels] = fb
    return cs, mel, K_pad, M_pad


def _mel_kernel(frames_ref, cs_ref, mel_ref, out_ref, *, k_pad: int):
    proj = jnp.dot(frames_ref[:, :], cs_ref[:, :],
                   preferred_element_type=jnp.float32)   # [FB, 2*K_pad]
    re = proj[:, :k_pad]
    im = proj[:, k_pad:]
    power = re * re + im * im                             # stays in VMEM
    out_ref[:, :] = jnp.dot(power, mel_ref[:, :],
                            preferred_element_type=jnp.float32)


def make_pallas_mel_frontend(cfg: FrontendConfig = FrontendConfig(),
                             frames_per_block: int = 256,
                             interpret: bool = False):
    """Build ``wave [B, T] -> mel [B, n_frames, n_mels]`` (fused kernel).

    ``n_frames = 1 + T // hop`` (torch center-padding parity). Set
    ``interpret=True`` to run on CPU for testing.
    """
    cs_np, mel_np, K_pad, M_pad = _kernel_constants(cfg)
    hop, n_fft = cfg.hop_length, cfg.n_fft
    assert frames_per_block % 8 == 0

    def frontend(wave: jax.Array) -> jax.Array:
        B, T = wave.shape
        if cfg.pre_emphasis is not None:
            wave = pre_emphasis(wave, cfg.pre_emphasis)
        pad = n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")

        n_frames = 1 + T // hop
        idx = jnp.asarray(frame_indices(wave.shape[1], n_fft, hop))
        frames = jnp.take(wave, idx, axis=-1)            # [B, F, n_fft]
        frames = frames.reshape(B * n_frames, n_fft)

        rows = frames.shape[0]
        rows_pad = _round_up(rows, frames_per_block)
        if rows_pad != rows:
            frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

        kernel = functools.partial(_mel_kernel, k_pad=K_pad)
        out = pl.pallas_call(
            kernel,
            grid=(rows_pad // frames_per_block,),
            in_specs=[
                pl.BlockSpec((frames_per_block, n_fft), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((frames_per_block, M_pad),
                                   lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, M_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows_pad * n_fft * 2 * K_pad
                + 2 * rows_pad * K_pad * M_pad,
                bytes_accessed=rows_pad * (n_fft + M_pad) * 4,
                transcendentals=0),
            interpret=interpret,
        )(frames, jnp.asarray(cs_np), jnp.asarray(mel_np))

        return out[:rows].reshape(B, n_frames, M_pad)[:, :, :cfg.n_mels]

    return frontend
