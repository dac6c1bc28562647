"""Fused int8 quantize → MXU dot → dequantize Pallas TPU kernel.

Why this exists: the XLA lowering of static-scale int8 (quant.py)
materializes every stage in HBM — the fp32 upcast of the activations,
the int8 copy, the int32 dot output, and the dequantized result. On the
bench chip that traffic costs more than the int8 MXU gain: ECAPA
extraction measured 5.5k utt/s quantized vs 9.3k bf16, even though the
bare int8 GEMM at the hot layer shape beats bf16 by 1.62x (83.8 vs
51.7 T/s at M=102912, K=N=1024). This kernel keeps the whole chain in
VMEM per (BM, BN) tile:

    xq  = clip(round(x * inv_sx))      (VPU, int8, never leaves VMEM)
    acc = xq @ wq                      (MXU int8, int32 accumulate)
    out = acc * (s_x * s_w) + bias     (VPU epilogue, writes bf16/fp32)

so HBM sees exactly one read of x (bf16), one read of wq (int8 — half
the bytes of the bf16 weights), and one write of out. Weights are
quantized per-output-channel OUTSIDE the kernel (an O(K*N) XLA pass,
noise next to the GEMM).

Used by quant.py when ``QuantConfig.backend`` resolves to 'pallas'
(requires a static ``act_scale`` from calibration — the dynamic max
reduce would reintroduce the serialization this kernel removes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quant_matmul"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _qmm_kernel(x_ref, wq_ref, scale_ref, bias_ref, out_ref, *,
                inv_sx: float):
    xq = jnp.clip(jnp.round(x_ref[:, :].astype(jnp.float32) * inv_sx),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:, :], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
    out_ref[:, :] = out.astype(out_ref.dtype)


def quant_matmul(x2d: jax.Array, w2d: jax.Array, bias, act_scale: float,
                 block_m: int = 512, interpret: bool = False) -> jax.Array:
    """``[M, K] @ [K, N]`` with in-kernel int8 quantization.

    ``x2d`` float (bf16/fp32); ``w2d`` float ``[K, N]`` — quantized here
    per output channel; ``bias`` ``[N]`` or None; ``act_scale`` a Python
    float (max-abs from calibration). Returns ``x2d.dtype`` ``[M, N]``.
    """
    M, K = x2d.shape
    K2, N = w2d.shape
    assert K == K2, (x2d.shape, w2d.shape)

    wf = w2d.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(wf / s_w[None, :]), -127, 127).astype(jnp.int8)
    s_x = max(act_scale / 127.0, 1e-12)
    scale = (s_w * jnp.float32(s_x))[None, :]            # [1, N]
    b = (jnp.zeros((1, N), jnp.float32) if bias is None
         else bias.astype(jnp.float32)[None, :])

    # pad every dim to hardware tiles; padded K rows of x/wq are zero so
    # the int32 accumulation is exact, padded M/N are sliced off below
    M_pad = _round_up(M, block_m)
    K_pad = _round_up(K, 128)
    N_pad = _round_up(N, 128)
    if (M_pad, K_pad) != (M, K):
        x2d = jnp.pad(x2d, ((0, M_pad - M), (0, K_pad - K)))
    if (K_pad, N_pad) != (K, N):
        wq = jnp.pad(wq, ((0, K_pad - K), (0, N_pad - N)))
    if N_pad != N:
        scale = jnp.pad(scale, ((0, 0), (0, N_pad - N)))
        b = jnp.pad(b, ((0, 0), (0, N_pad - N)))

    kernel = functools.partial(_qmm_kernel, inv_sx=1.0 / s_x)
    out = pl.pallas_call(
        kernel,
        grid=(M_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, K_pad), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, N_pad), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, N_pad), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * K_pad * N_pad,
            bytes_accessed=M_pad * K_pad * 2 + K_pad * N_pad
            + M_pad * N_pad * 2,
            transcendentals=0),
        interpret=interpret,
    )(x2d, wq, scale, b)
    return out[:M, :N]
