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

**Measured honesty (bench chip, tunneled v5-lite, ECAPA batch 512)**:
on THIS part int8 extraction does not beat bf16 end-to-end — 9,321
utt/s bf16 vs 5,243 dynamic / 5,518 static / 5,018 pallas-fused int8 —
because (a) the part's practical int8 ceiling is only ~1.2x its bf16
ceiling (104 vs 88 T/s measured; nominal v5e spec is 2x), (b) the VPU
quantize pass costs ~1ms per hot layer, and (c) ECAPA's quantized convs
are never back-to-back (each is sandwiched between float Res2/SE/ASP
ops), so activations cannot stay int8 and every layer pays the
quantize/dequantize boundary. The isolated fused kernel DOES beat the
isolated bf16 GEMM (60.6 vs 56.5 T/s per-layer; the raw int8 dot is
1.62x faster at the hot shape, 83.8 vs 51.7 T/s) — on a part with the
full 2x int8 MXU rate the same code paths win end-to-end. Full table
in PARITY.md's roofline section.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantConfig", "int8_apply", "make_int8_embed_fn",
           "calibrate_act_scales"]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Which GEMMs go int8, and through which lowering.

    A layer is quantized only when its contraction dim ``K`` (= kernel
    taps x in-channels for convs) and output dim ``N`` both clear the
    floors — below them the GEMM is dispatch-bound, not MXU-bound, and
    quantization costs accuracy for no time (see module docstring).

    ``backend``: 'xla' | 'pallas' | 'auto'. 'pallas' routes static-scale
    layers through the fused ops/pallas_quant.py kernel (quantize + int8
    dot + dequant in VMEM — the fastest int8 lowering measured on the
    bench chip); it needs TPU + calibrated ``act_scales``, and falls
    back to XLA otherwise. 'auto' picks pallas when those hold.
    """
    min_k: int = 512
    min_n: int = 128
    quant_conv: bool = True
    quant_dense: bool = True
    backend: str = "auto"


def _int8_gemm(x2d: jax.Array, w2d: jax.Array,
               act_scale: Optional[float] = None) -> jax.Array:
    """``[M, K] @ [K, N]`` via symmetric int8 with int32 accumulation.

    Activations: one per-tensor scale — a traced max-abs reduce when
    ``act_scale`` is None (dynamic mode), or the given Python float
    (static mode, from ``calibrate_act_scales``). The static path is the
    fast one: the dynamic max-reduce serializes against the quantize and
    costs extra HBM passes that on the bench chip more than cancel the
    MXU's int8 speedup (measured: dynamic 5.2k utt/s vs bf16 9.3k on
    ECAPA extraction; the bare GEMM at the same shape is 1.62x FASTER in
    int8 — 83.8 vs 51.7 T/s). Weights: one scale per output channel,
    always computed in-trace (an O(K*N) reduce, noise next to the GEMM).
    Returns fp32 ``[M, N]`` (no bias).
    """
    xf = x2d.astype(jnp.float32)
    wf = w2d.astype(jnp.float32)
    if act_scale is None:
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    else:
        s_x = jnp.float32(max(act_scale / 127.0, 1e-12))
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


def _quantized_gemm(x2d: jax.Array, w2d: jax.Array, bias,
                    act_scale: Optional[float],
                    config: "QuantConfig") -> jax.Array:
    """Route one ``[M,K]@[K,N]`` through the configured int8 lowering."""
    backend = config.backend
    use_pallas = (act_scale is not None
                  and jax.default_backend() == "tpu"
                  and backend in ("pallas", "auto"))
    if use_pallas:
        from speakerverification_tpu.ops.pallas_quant import quant_matmul
        return quant_matmul(x2d, w2d, bias, act_scale).astype(jnp.float32)
    y = _int8_gemm(x2d, w2d, act_scale=act_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y


def _conv1d_as_int8_gemm(mod: nn.Conv, x: jax.Array,
                         kernel: jax.Array,
                         bias: Optional[jax.Array],
                         act_scale: Optional[float] = None,
                         config: Optional["QuantConfig"] = None) -> jax.Array:
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
    y = _quantized_gemm(cols.reshape(b * t_out, k * cin),
                        kernel.reshape(k * cin, kernel.shape[-1]),
                        bias, act_scale, config or QuantConfig())
    return y.reshape(b, t_out, -1).astype(x.dtype)


def _dense_kernel_if_quantizable(mod, args, config: QuantConfig):
    if not (config.quant_dense and type(mod) is nn.Dense
            and args and getattr(args[0], "ndim", 0) >= 2):
        return None
    kernel = mod.variables.get("params", {}).get("kernel")
    if (kernel is not None and kernel.shape[0] >= config.min_k
            and kernel.shape[1] >= config.min_n):
        return kernel
    return None


def _conv_kernel_if_quantizable(mod, args, config: QuantConfig):
    if not (config.quant_conv and type(mod) is nn.Conv
            and args and getattr(args[0], "ndim", 0) == 3):
        return None
    kernel = mod.variables.get("params", {}).get("kernel")
    strides = _normalize(mod.strides) if mod.strides else (1,)
    dilation = (_normalize(mod.kernel_dilation)
                if mod.kernel_dilation else (1,))
    in_dilation = (_normalize(mod.input_dilation)
                   if mod.input_dilation else (1,))
    if (kernel is not None and kernel.ndim == 3
            and strides == (1,)
            and len(dilation) == 1
            and in_dilation == (1,)          # im2col ignores lhs dilation
            and getattr(mod, "mask", None) is None
            and mod.feature_group_count == 1
            and mod.padding in ("SAME", "VALID")
            and kernel.shape[0] * kernel.shape[1] >= config.min_k
            and kernel.shape[2] >= config.min_n):
        return kernel
    return None


def _module_key(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _make_interceptor(config: QuantConfig,
                      act_scales: Optional[dict] = None) -> Callable:
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod.is_initializing():
            return next_fun(*args, **kwargs)

        def scale_for(mod):
            if act_scales is None:
                return None          # dynamic mode: in-trace max reduce
            return act_scales.get(_module_key(mod))

        kernel = _dense_kernel_if_quantizable(mod, args, config)
        if kernel is not None:
            p = mod.variables.get("params", {})
            x = args[0]
            lead = x.shape[:-1]
            bias = p.get("bias") if mod.use_bias else None
            y = _quantized_gemm(x.reshape(-1, x.shape[-1]), kernel, bias,
                                scale_for(mod), config)
            return y.reshape(*lead, -1).astype(x.dtype)

        kernel = _conv_kernel_if_quantizable(mod, args, config)
        if kernel is not None:
            p = mod.variables.get("params", {})
            bias = p.get("bias") if mod.use_bias else None
            return _conv1d_as_int8_gemm(mod, args[0], kernel, bias,
                                        act_scale=scale_for(mod),
                                        config=config)

        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_act_scales(model: nn.Module, variables, *args,
                         config: Optional[QuantConfig] = None,
                         margin: float = 1.1,
                         **kwargs) -> dict:
    """Record per-layer activation max-abs on a calibration batch.

    Runs the FLOAT model once (eagerly — do not jit) with a recording
    interceptor; returns ``{module_path: max_abs * margin}`` for every
    layer the config would quantize. Feed the dict to ``int8_apply`` /
    ``make_int8_embed_fn`` as ``act_scales`` to get static-scale int8 —
    the serving configuration (see ``_int8_gemm`` for why static wins).

    ``margin`` head-rooms the recorded maxima: static symmetric
    quantization SATURATES silently at ±127·scale, and later batches
    can run hotter than the calibration batch (eval lists are often
    speaker-ordered). 10 % costs a fraction of a quantization bin in
    resolution and absorbs typical batch-to-batch drift; recalibrate on
    a representative sample rather than raising it much further.
    """
    cfg = config or QuantConfig()
    scales: dict = {}

    def recorder(next_fun, args_, kwargs_, context):
        mod = context.module
        if context.method_name == "__call__" and not mod.is_initializing():
            if (_dense_kernel_if_quantizable(mod, args_, cfg) is not None
                    or _conv_kernel_if_quantizable(mod, args_, cfg)
                    is not None):
                key = _module_key(mod)
                m = float(jnp.max(jnp.abs(args_[0].astype(jnp.float32))))
                scales[key] = max(scales.get(key, 0.0), m)
        return next_fun(*args_, **kwargs_)

    with nn.intercept_methods(recorder):
        model.apply(variables, *args, **kwargs)
    return {k: v * margin for k, v in scales.items()}


def int8_apply(model: nn.Module, variables, *args,
               config: Optional[QuantConfig] = None,
               act_scales: Optional[dict] = None, **kwargs):
    """``model.apply`` with every large Conv/Dense GEMM running int8.

    ``act_scales`` (from ``calibrate_act_scales``) switches activation
    quantization from dynamic in-trace max-reduces to static constants.
    """
    with nn.intercept_methods(
            _make_interceptor(config or QuantConfig(), act_scales)):
        return model.apply(variables, *args, **kwargs)


def make_int8_embed_fn(model, normalize: bool = True,
                       compute_dtype: Optional[Any] = None,
                       config: Optional[QuantConfig] = None,
                       act_scales: Optional[dict] = None) -> Callable:
    """Build a jitted int8 ``embed(params, batch_stats, wave) -> [B, D]``.

    Drop-in for ``make_eval_embed_fn`` (training/train_step.py): same
    signature and L2 normalization; non-quantized ops still run in
    ``compute_dtype`` (pass bf16 on TPU), the frontend stays fp32.
    Pass ``act_scales`` for the fast static-scale serving mode.
    """
    cfg = config or QuantConfig()

    @jax.jit
    def embed(params, batch_stats, wave):
        if wave.dtype == jnp.int16:
            # int16 serving wire format — dequantize in-program (same
            # contract as make_eval_embed_fn, training/train_step.py)
            wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        emb = int8_apply(model, {"params": params, "batch_stats": batch_stats},
                         wave, config=cfg, act_scales=act_scales)
        emb = emb.astype(jnp.float32)
        if normalize:
            emb = emb / jnp.clip(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    return embed
