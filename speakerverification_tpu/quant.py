"""Post-training int8 quantized inference — the TPU MXU int8 serving path.

The reference's serving story is ONNX export of the eval-mode model
(src/model.py:748-792); its precision story is CUDA AMP fp16. TPUs have a
third tier the reference cannot reach: the MXU multiplies int8 operands
with int32 accumulation at roughly twice the bf16 rate (nominal; on the
tunneled v5-lite chip used for benching, a chained 8192x4096x4096 GEMM
measures ~104 T/s int8 vs ~79-88 T/s bf16). This module makes any model
in the zoo servable through that path with zero model changes:

* **Dynamic symmetric quantization** — activations per-tensor, weights
  per-output-channel, both computed inside the jitted program (no
  calibration pass, no checkpoint conversion). The scale reduces are
  O(M*K + K*N) against the GEMM's O(M*K*N) — noise at these shapes.
* **flax method interception** (``nn.intercept_methods``) swaps every
  large ``nn.Conv``/``nn.Dense`` GEMM for quantize -> int8 dot ->
  dequantize at trace time. Small layers (below ``QuantConfig`` floors)
  keep their float path: on this chip a matmul pays a ~60 us fixed cost
  regardless of size, so quantizing the Res2Net 128-channel cascade or
  SE bottlenecks only adds rounding error without speed.
* **1-D convs become im2col GEMMs** — k dilated time-shifts concatenated
  on the channel axis, matching ``nn.Conv``'s [k, Cin, Cout] kernel
  flattening exactly (asserted by an exact-arithmetic parity test).

Use ``make_int8_embed_fn`` as a drop-in for
``training.train_step.make_eval_embed_fn`` when extracting embeddings
for scoring; verification is cosine-based on L2-normalized embeddings,
which is robust to the ~1e-3 relative error int8 introduces
(tests/test_quant.py pins cosine similarity against the fp32 path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantConfig", "int8_apply", "make_int8_embed_fn"]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Which GEMMs go int8.

    A layer is quantized only when its contraction dim ``K`` (= kernel
    taps x in-channels for convs) and output dim ``N`` both clear the
    floors — below them the GEMM is dispatch-bound, not MXU-bound, and
    quantization costs accuracy for no time (see module docstring).
    """
    min_k: int = 512
    min_n: int = 128
    quant_conv: bool = True
    quant_dense: bool = True


def _int8_gemm(x2d: jax.Array, w2d: jax.Array) -> jax.Array:
    """``[M, K] @ [K, N]`` via dynamic-symmetric int8 with int32 accum.

    Activations: one per-tensor scale (max-abs / 127). Weights: one scale
    per output channel. Returns fp32 ``[M, N]`` (no bias).
    """
    xf = x2d.astype(jnp.float32)
    wf = w2d.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf / s_w[None, :]), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_x * s_w)[None, :]


def _normalize(v) -> tuple:
    if isinstance(v, int):
        return (v,)
    return tuple(v)


def _conv1d_as_int8_gemm(mod: nn.Conv, x: jax.Array,
                         kernel: jax.Array,
                         bias: Optional[jax.Array]) -> jax.Array:
    """Replicate a stride-1 1-D ``nn.Conv`` as im2col + int8 GEMM.

    ``kernel`` is flax layout ``[k, Cin, Cout]``; the k dilated
    time-shifts are concatenated channel-major so the flattened kernel
    index ``i * Cin + c`` lines up with ``kernel.reshape(k*Cin, Cout)``.
    """
    (k,) = _normalize(mod.kernel_size)
    (d,) = _normalize(mod.kernel_dilation)
    total = d * (k - 1)
    if mod.padding == "SAME" and total > 0:
        lo = total // 2
        x = jnp.pad(x, ((0, 0), (lo, total - lo), (0, 0)))
    b, t, cin = x.shape
    t_out = t - total
    if k == 1:
        cols = x
    else:
        cols = jnp.concatenate([x[:, i * d:i * d + t_out, :]
                                for i in range(k)], axis=-1)
    y = _int8_gemm(cols.reshape(b * t_out, k * cin),
                   kernel.reshape(k * cin, kernel.shape[-1]))
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y.reshape(b, t_out, -1).astype(x.dtype)


def _make_interceptor(config: QuantConfig) -> Callable:
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod.is_initializing():
            return next_fun(*args, **kwargs)

        if (config.quant_dense and type(mod) is nn.Dense
                and args and getattr(args[0], "ndim", 0) >= 2):
            p = mod.variables.get("params", {})
            kernel = p.get("kernel")
            if (kernel is not None and kernel.shape[0] >= config.min_k
                    and kernel.shape[1] >= config.min_n):
                x = args[0]
                lead = x.shape[:-1]
                y = _int8_gemm(x.reshape(-1, x.shape[-1]).astype(jnp.float32),
                               kernel)
                bias = p.get("bias")
                if bias is not None and mod.use_bias:
                    y = y + bias.astype(jnp.float32)[None, :]
                return y.reshape(*lead, -1).astype(x.dtype)

        if (config.quant_conv and type(mod) is nn.Conv
                and args and getattr(args[0], "ndim", 0) == 3):
            p = mod.variables.get("params", {})
            kernel = p.get("kernel")
            strides = _normalize(mod.strides) if mod.strides else (1,)
            dilation = (_normalize(mod.kernel_dilation)
                        if mod.kernel_dilation else (1,))
            if (kernel is not None and kernel.ndim == 3
                    and strides == (1,)
                    and len(dilation) == 1
                    and mod.feature_group_count == 1
                    and mod.padding in ("SAME", "VALID")
                    and kernel.shape[0] * kernel.shape[1] >= config.min_k
                    and kernel.shape[2] >= config.min_n):
                bias = (p.get("bias")
                        if mod.use_bias else None)
                return _conv1d_as_int8_gemm(mod, args[0], kernel, bias)

        return next_fun(*args, **kwargs)

    return interceptor


def int8_apply(model: nn.Module, variables, *args,
               config: Optional[QuantConfig] = None, **kwargs):
    """``model.apply`` with every large Conv/Dense GEMM running int8."""
    with nn.intercept_methods(_make_interceptor(config or QuantConfig())):
        return model.apply(variables, *args, **kwargs)


def make_int8_embed_fn(model, normalize: bool = True,
                       compute_dtype: Optional[Any] = None,
                       config: Optional[QuantConfig] = None) -> Callable:
    """Build a jitted int8 ``embed(params, batch_stats, wave) -> [B, D]``.

    Drop-in for ``make_eval_embed_fn`` (training/train_step.py): same
    signature and L2 normalization; non-quantized ops still run in
    ``compute_dtype`` (pass bf16 on TPU), the frontend stays fp32.
    """
    cfg = config or QuantConfig()

    @jax.jit
    def embed(params, batch_stats, wave):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        emb = int8_apply(model, {"params": params, "batch_stats": batch_stats},
                         wave, config=cfg)
        emb = emb.astype(jnp.float32)
        if normalize:
            emb = emb / jnp.clip(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    return embed
