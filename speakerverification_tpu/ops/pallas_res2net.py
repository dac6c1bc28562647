"""Fused Pallas TPU kernel for the Res2Net multi-scale cascade.

ECAPA-TDNN's hot non-GEMM path is the Res2Net hierarchy inside each
SE-Res2Net block (reference: src/models/ECAPA_TDNN.py:72-127): seven
sequential 128-channel k=3 dilated convolutions, each followed by ReLU
and (eval-mode) BatchNorm. XLA dispatches each small conv separately —
measured 6-8 TF/s on a v5e chip versus ~87 TF/s for the wide 1×1 convs —
so the cascade costs ~5 % of the model's FLOPs but ~25 % of its eval
wall time.

This kernel runs the WHOLE cascade for one batch tile inside VMEM:

    for each scale group i = 1..scale-1:
        inp  = chunk_i + y_{i-1}                (VPU add, in VMEM)
        h    = Σ_k shift(inp, (k-1)·d) @ W_k    (MXU, 3 taps, f32 accum)
        y_i  = relu(h + b) · s_bn + t_bn        (VPU; BN folded to affine)

eliminating 13 HBM round-trips of the [B, T, 128] intermediates per
block (the input is read once and the concatenated output written once)
and formulating each conv as MXU-shaped [B·T, 128]×[128, 128] matmuls.

The convolution reproduces Conv1d's 'same' REFLECT padding exactly
(models/layers.py; reference src/models/layers/cnn.py:62,157): the tap
at t−d reads x[d−t] for t<d and the tap at t+d reads x[2(T−1)−t−d] for
t≥T−d. Edge rows are materialized with static single-row slices
(dilation ≤ 4 in every ECAPA config).

Eval-mode only: BatchNorm folds to a per-channel affine with running
statistics, which is what embedding extraction / scoring uses. Training
keeps the XLA path (autodiff + batch-stat updates).

MEASURED RESULT (TPU v5e bench chip, batch 256×2 s): the fused kernel is
AT PAR with XLA's conv lowering (≈3.4-4.2 ms vs ≈3.3 ms per cascade,
in-program timing), NOT faster — so it is an opt-in backend
(``Res2NetBlock(backend='pallas')``), with the XLA path as default.
Why: isolated-shape probes show this chip executes EVERY dependent
matmul instruction with ~60 µs of fixed overhead regardless of operand
size ([1664,128]×[128,128] and [6656,128]×[128,128] both land at
~3 TF/s; 8192×4096×4096 reaches ~100 TF/s because one instruction
carries 68 GFLOP). The cascade is 21 inherently sequential small
matmuls, so both backends sit at the same instruction-overhead floor,
and eliminating the HBM round-trips (which this kernel does) moves
nothing — the op was never bandwidth-bound. An im2col K=384 variant
(one matmul per group instead of three) hangs both the XLA and Mosaic
compilers on this toolchain (>9 min, killed) and was abandoned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_res2net_cascade"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cascade_kernel(x_ref, w_ref, cb_ref, s_ref, b_ref, out_ref, *,
                    groups: int, hidden: int, dilation: int):
    d = dilation
    bt, t_len, _ = x_ref.shape

    def mm(a, w):
        # [Bt, T, H] @ [H, H] as one MXU matmul over Bt·T rows
        flat = a.reshape(bt * t_len, hidden)
        out = jax.lax.dot_general(
            flat, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.reshape(bt, t_len, hidden)

    out_ref[:, :, :hidden] = x_ref[:, :, :hidden]     # group 0 passthrough
    y = None
    for i in range(1, groups):
        c = x_ref[:, :, i * hidden:(i + 1) * hidden]
        inp = c if i == 1 else c + y

        h = mm(inp, w_ref[i - 1, 1])                  # center tap
        # left tap x[t-d], reflect head rows x[d], x[d-1], ..., x[1]
        head = jnp.concatenate(
            [inp[:, j:j + 1, :] for j in range(d, 0, -1)], axis=1)
        h = h + mm(jnp.concatenate([head, inp[:, :t_len - d, :]], axis=1),
                   w_ref[i - 1, 0])
        # right tap x[t+d], reflect tail rows x[T-2], ..., x[T-1-d]
        tail = jnp.concatenate(
            [inp[:, t_len - 2 - j:t_len - 1 - j, :] for j in range(d)], axis=1)
        h = h + mm(jnp.concatenate([inp[:, d:, :], tail], axis=1),
                   w_ref[i - 1, 2])

        h = h + cb_ref[i - 1:i][:, None, :]           # conv bias, f32
        h = jnp.maximum(h, 0.0)                       # ReLU (parity: inner
        #                                 TDNNBlocks always use ReLU)
        y = (h * s_ref[i - 1:i][:, None, :]
             + b_ref[i - 1:i][:, None, :]).astype(x_ref.dtype)
        out_ref[:, :, i * hidden:(i + 1) * hidden] = y


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "block_b", "interpret"))
def fused_res2net_cascade(x: jax.Array, weights: jax.Array,
                          conv_bias: jax.Array, bn_scale: jax.Array,
                          bn_bias: jax.Array, *, dilation: int,
                          block_b: int = 4,
                          interpret: bool = False) -> jax.Array:
    """Run the Res2Net cascade fused in VMEM.

    Args:
      x: ``[B, T, groups*hidden]`` input (group 0 passes through).
      weights: ``[groups-1, 3, hidden, hidden]`` conv kernels
        (flax ``nn.Conv`` layout ``[k, in, out]``).
      conv_bias: ``[groups-1, hidden]``.
      bn_scale / bn_bias: ``[groups-1, hidden]`` — eval BatchNorm folded
        to ``y = h * bn_scale + bn_bias`` (callers fold running stats).
      dilation: conv dilation (kernel size is fixed at 3).
      block_b: batch rows per grid step.
      interpret: run in interpreter mode (CPU tests).

    Returns ``[B, T, groups*hidden]``.
    """
    B, T, C = x.shape
    g1, k, hidden, _ = weights.shape
    groups = g1 + 1
    assert k == 3 and C == groups * hidden
    assert T > 2 * dilation, "crop too short for the reflect halo"

    block_b = min(block_b, B)
    b_pad = _round_up(B, block_b)
    if b_pad != B:
        x = jnp.pad(x, ((0, b_pad - B), (0, 0), (0, 0)))

    kernel = functools.partial(_cascade_kernel, groups=groups,
                               hidden=hidden, dilation=dilation)
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, T, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * T * hidden * hidden * 3 * g1,
            bytes_accessed=2 * b_pad * T * C * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, weights.astype(x.dtype), conv_bias.astype(f32),
      bn_scale.astype(f32), bn_bias.astype(f32))
    return out[:B]
