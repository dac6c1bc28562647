"""Mel-image encoders: EfficientNet v1/v2, RepVGG, SCNet, DPN (Flax).

Parity targets (all consume ``[B, frames, n_mels]`` features, reshaped
to an NHWC mel image after log/CMN + instance norm, like the reference's
``[B, 1, n_mels, T]``):

* ``EfficientNet``   — src/models/EfficientNet.py:42-217: MBConv blocks
  with SE and drop-connect, b4 compound scaling, head conv to 1280 +
  global pooling; the reference's ASP aggregate runs *after* global
  pooling (a single time step — kept for parity, documented).
* ``EfficientNetv2`` — src/models/EfficientNetv2.py: fused-MBConv early
  stages + MBConv later (effnetv2-s config), GAP + linear.
* ``RepVGG``         — src/models/RepVGG.py:62-337 (RepVGG-D2se):
  train-time 3-branch blocks (3×3 + 1×1 + identity BN) with SE,
  ``reparameterize`` folds branches into one 3×3 conv for deploy.
* ``SCnet``          — src/models/SCnet.py:169-271: self-calibrated
  bottlenecks (pooled-branch sigmoid gating), layers [3,4,6,3], GAP+fc.
* ``DPN``            — src/models/DPN.py:73-159: dual-path blocks
  (residual + dense concat paths), GAP + classifier.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.registry import MODELS

__all__ = ["EfficientNet", "EfficientNetV2", "RepVGG", "SCNet", "DPN"]


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


def _prep(x: jax.Array, log_input: bool,
          instance_norm: bool = True) -> jax.Array:
    """log + CMN (+ non-affine instance norm), to NHWC mel image.

    RepVGG is the one reference image encoder with NO instance norm
    (src/models/RepVGG.py:186-198); the rest normalize per-channel."""
    if log_input:
        x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
        x = x - jnp.mean(x, axis=1, keepdims=True)
    if instance_norm:
        x = (x - jnp.mean(x, axis=1, keepdims=True)) / jnp.sqrt(
            jnp.var(x, axis=1, keepdims=True) + 1e-5)
    return jnp.transpose(x, (0, 2, 1))[..., None]      # [B, mels, T, 1]


# ---------------------------------------------------------------------------
# EfficientNet v1
# ---------------------------------------------------------------------------

class MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    bn_eps: float = 1e-5     # EfficientNet v1's conv_bn_act uses 1e-3

    @nn.compact
    def __call__(self, x, train=False):
        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=self.bn_eps)(y)

        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(h)
            h = jax.nn.swish(bn(h))
        h = nn.Conv(h.shape[-1], (self.kernel, self.kernel),
                    (self.stride, self.stride), padding="SAME",
                    feature_group_count=h.shape[-1], use_bias=False)(h)
        h = jax.nn.swish(bn(h))
        # squeeze-excitation (squeeze width from the block INPUT channels,
        # Efficient_utils.py SEModule / EfficientNet.py:23-24)
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = h.mean(axis=(1, 2))
        s = jax.nn.swish(nn.Dense(se_ch)(s))
        s = jax.nn.sigmoid(nn.Dense(h.shape[-1])(s))
        h = h * s[:, None, None, :]
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = bn(h)
        if self.stride == 1 and in_ch == self.out_ch:
            # the reference's DropConnect is dead code — always Identity
            # (EfficientNet.py:38-40), so the skip is a plain residual
            h = h + x
        return h


class EfficientNet(nn.Module):
    nOut: int = 512
    width_coeff: float = 1.4        # b4
    depth_coeff: float = 1.8
    dropout_rate: float = 0.4
    aggregate: str = "ASP"
    log_input: bool = True

    def _ch(self, x: int) -> int:
        x *= self.width_coeff
        new = max(8, int(x + 4) // 8 * 8)
        return new + 8 if new < 0.9 * x else new

    def _rep(self, x: int) -> int:
        return int(math.ceil(x * self.depth_coeff))

    @nn.compact
    def __call__(self, x, train=False):
        def bn(y):       # conv_bn_act pins eps=1e-3 (Efficient_utils.py:8-16)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-3)(y)

        x = _prep(x, self.log_input)
        h = nn.Conv(self._ch(32), (3, 3), (2, 2), padding="SAME",
                    use_bias=False)(x)
        h = jax.nn.swish(bn(h))

        specs = [(16, 1, 3, 1, 1), (24, 6, 3, 2, 2), (40, 6, 5, 2, 2),
                 (80, 6, 3, 2, 3), (112, 6, 5, 1, 3), (192, 6, 5, 2, 4),
                 (320, 6, 3, 1, 1)]
        for out, expand, k, s, rep in specs:
            for i in range(self._rep(rep)):
                h = MBConv(self._ch(out), expand, k, s if i == 0 else 1,
                           bn_eps=1e-3)(h, train=train)

        h = nn.Conv(self._ch(1280), (1, 1), use_bias=False)(h)
        h = jax.nn.swish(bn(h))
        pooled = h.mean(axis=(1, 2))                   # [B, 1280]
        pooled = nn.Dropout(self.dropout_rate,
                            deterministic=not train)(pooled)

        if self.aggregate == "flatten":
            return nn.Dense(self.nOut)(pooled)
        # 'ASP' after the head's global pool (EfficientNet.py:132-139,
        # 184-192): with T=1 the attention softmax is identically 1 (the
        # attention convs exist in the reference but cannot affect the
        # output), mu = pooled, and sg = sqrt(clamp(0, min=1e-5)) — a
        # CONSTANT sqrt(1e-5), not zero, feeding fc_attn
        mu = pooled
        sg = jnp.full_like(pooled, jnp.sqrt(1e-5))
        return nn.Dense(self.nOut)(jnp.concatenate([mu, sg], axis=-1))


# ---------------------------------------------------------------------------
# EfficientNet v2 (effnetv2-s)
# ---------------------------------------------------------------------------

def _make_divisible(v: float, divisor: int = 8) -> int:
    """Channel rounding (parity: src/models/EfficientNetv2.py:17-31)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MBConvV2(nn.Module):
    """v2 MBConv (parity: src/models/EfficientNetv2.py:81-119, use_se):
    pw 1×1 → hidden=round(inp·t), dw 3×3 stride p1 (torch explicit pad,
    not SAME), SE squeezed to ``_make_divisible(inp//4, 8)`` — NOT the
    v1 ``int(inp·0.25)`` — then pw-linear; SiLU activations."""
    out_ch: int
    expand: int
    stride: int

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        hidden = round(in_ch * self.expand)
        h = nn.Conv(hidden, (1, 1), use_bias=False)(x)
        h = jax.nn.swish(_bn(train)(h))
        h = nn.Conv(hidden, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=hidden,
                    use_bias=False)(h)
        h = jax.nn.swish(_bn(train)(h))
        s = h.mean(axis=(1, 2))
        s = jax.nn.swish(nn.Dense(_make_divisible(in_ch // 4, 8))(s))
        s = jax.nn.sigmoid(nn.Dense(hidden)(s))
        h = h * s[:, None, None, :]
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = _bn(train)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class FusedMBConv(nn.Module):
    """v2 fused block (parity: src/models/EfficientNetv2.py:103-115):
    3×3 stride p1 to hidden=round(inp·t) then ALWAYS a pw-linear 1×1 +
    BN — the reference keeps the projection even at expand==1."""
    out_ch: int
    expand: int
    stride: int

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        h = nn.Conv(round(in_ch * self.expand), (3, 3),
                    (self.stride, self.stride), padding=((1, 1), (1, 1)),
                    use_bias=False)(x)
        h = jax.nn.swish(_bn(train)(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = _bn(train)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetV2(nn.Module):
    """effnetv2-s config (parity: src/models/EfficientNetv2.py:122-190).

    Stem 3×3/2 p1 → _make_divisible(24·w); per-cfg blocks (fused for
    use_se=0, MBConvV2 for use_se=1) with _make_divisible channel
    rounding; head 1×1 → 1792 (scaled only when width_mult>1), GAP,
    Dense(nOut) standing in for the ImageNet classifier."""
    nOut: int = 512
    log_input: bool = True
    width_mult: float = 1.0
    image_input: bool = False       # feed NHWC images directly (no _prep)
    # (expansion, channels, repeats, stride, use_se)
    cfgs: Sequence[Tuple[int, int, int, int, int]] = (
        (1, 24, 2, 1, 0), (4, 48, 4, 2, 0), (4, 64, 4, 2, 0),
        (4, 128, 6, 2, 1), (6, 160, 9, 1, 1), (6, 256, 15, 2, 1))

    @nn.compact
    def __call__(self, x, train=False):
        if not self.image_input:
            x = _prep(x, self.log_input)
        h = nn.Conv(_make_divisible(24 * self.width_mult, 8), (3, 3), (2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        h = jax.nn.swish(_bn(train)(h))
        for t, c, n, s, use_se in self.cfgs:
            out = _make_divisible(c * self.width_mult, 8)
            for i in range(n):
                stride = s if i == 0 else 1
                if use_se:
                    h = MBConvV2(out, t, stride)(h, train=train)
                else:
                    h = FusedMBConv(out, t, stride)(h, train=train)
        head = (_make_divisible(1792 * self.width_mult, 8)
                if self.width_mult > 1.0 else 1792)
        h = nn.Conv(head, (1, 1), use_bias=False)(h)
        h = jax.nn.swish(_bn(train)(h))
        return nn.Dense(self.nOut)(h.mean(axis=(1, 2)))


# ---------------------------------------------------------------------------
# RepVGG
# ---------------------------------------------------------------------------

class RepVGGBlock(nn.Module):
    """Parity: src/models/RepVGG.py:27-71. Torch p1 padding (explicit, NOT
    SAME — they differ at stride 2 on even sizes), SE reduction //8 via
    ResNetBlocks.SEBlock (RepVGG.py:43-45), identity-BN branch when
    shape-preserving."""
    out_ch: int
    stride: int = 1
    use_se: bool = False
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        if self.deploy:
            h = nn.Conv(self.out_ch, (3, 3), (self.stride, self.stride),
                        padding=((1, 1), (1, 1)), name="rbr_reparam")(x)
        else:
            dense = nn.Conv(self.out_ch, (3, 3),
                            (self.stride, self.stride),
                            padding=((1, 1), (1, 1)),
                            use_bias=False, name="rbr_dense")(x)
            dense = _bn(train)(dense)
            one = nn.Conv(self.out_ch, (1, 1),
                          (self.stride, self.stride), use_bias=False,
                          name="rbr_1x1")(x)
            one = _bn(train)(one)
            h = dense + one
            if in_ch == self.out_ch and self.stride == 1:
                h = h + _bn(train)(x)
        if self.use_se:
            s = h.mean(axis=(1, 2))
            s = jax.nn.relu(nn.Dense(max(self.out_ch // 8, 1))(s))
            s = jax.nn.sigmoid(nn.Dense(self.out_ch)(s))
            h = h * s[:, None, None, :]
        return jax.nn.relu(h)


class RepVGG(nn.Module):
    """RepVGG-D2se layout (parity: src/models/RepVGG.py:335-337).

    Unlike the other mel-image encoders the reference RepVGG applies NO
    instance norm — only log+CMN for melspectrogram features
    (RepVGG.py:186-198) — hence ``_prep(..., instance_norm=False)``.
    """
    nOut: int = 256
    num_blocks: Sequence[int] = (8, 14, 24, 1)
    width: Sequence[float] = (2.5, 2.5, 2.5, 5.0)
    use_se: bool = True
    deploy: bool = False
    log_input: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = _prep(x, self.log_input, instance_norm=False)
        ch0 = min(64, int(64 * self.width[0]))
        h = RepVGGBlock(ch0, 2, self.use_se, self.deploy)(x, train=train)
        for stage, (n, w) in enumerate(zip(self.num_blocks, self.width)):
            out_ch = int((64 << stage) * w)
            for i in range(n):
                h = RepVGGBlock(out_ch, 2 if i == 0 else 1, self.use_se,
                                self.deploy)(h, train=train)
        return nn.Dense(self.nOut)(h.mean(axis=(1, 2)))


def repvgg_reparameterize(variables: dict) -> dict:
    """Fold a train-mode RepVGG's 3×3+1×1+identity branches into deploy
    3×3 convs (the ``switch_to_deploy`` fold, src/models/RepVGG.py:80-136).

    Per block: fuse each conv's BN into (kernel·t, β−μ·t) with
    t = γ/√(σ²+ε), pad the 1×1 kernel to 3×3, and add an identity 3×3
    kernel for the BN-only branch; sums become the deploy conv's kernel
    and bias. Returns ``{"params": ...}`` for ``deploy=True`` apply
    (SE and head params copied through; eval-equality is proven in
    tests/test_torch_parity.py::test_repvgg_reparameterize_fold).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if not stats:
        raise ValueError(
            "repvgg_reparameterize needs 'batch_stats' to fold BN "
            "(got params only — a deploy-mode or params-only checkpoint "
            "has nothing to fold)")
    eps = 1e-5

    def fuse(kernel, bn_p, bn_s):
        t = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        return kernel * t, bn_p["bias"] - bn_s["mean"] * t

    out = {}
    for name, sub in params.items():
        if not name.startswith("RepVGGBlock_"):
            out[name] = sub
            continue
        st = stats.get(name, {})
        k3, b3 = fuse(sub["rbr_dense"]["kernel"],
                      sub["BatchNorm_0"], st["BatchNorm_0"])
        k1, b1 = fuse(sub["rbr_1x1"]["kernel"],
                      sub["BatchNorm_1"], st["BatchNorm_1"])
        k1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        kernel, bias = k3 + k1, b3 + b1
        if "BatchNorm_2" in sub:                   # identity branch
            in_ch = k3.shape[2]
            kid = jnp.zeros_like(k3).at[
                1, 1, jnp.arange(in_ch), jnp.arange(in_ch)].set(1.0)
            kfold, bfold = fuse(kid, sub["BatchNorm_2"], st["BatchNorm_2"])
            kernel, bias = kernel + kfold, bias + bfold
        new = {"rbr_reparam": {"kernel": kernel, "bias": bias}}
        for k, v in sub.items():                   # SE denses pass through
            if k.startswith("Dense_"):
                new[k] = v
        out[name] = new
    return {"params": out}


# ---------------------------------------------------------------------------
# SCNet
# ---------------------------------------------------------------------------

class SCBottleneck(nn.Module):
    """Self-calibrated bottleneck, exact port of the reference block
    (src/models/utils/SCnet_utils.py:54-129): group_width = planes/2,
    torch-p=d explicit padding (stride-2 SAME differs), per-branch
    conv→BN→relu ordering, SCConv with AvgPool(pooling_r)→k2 (stride 1)
    →nearest-upsample gate, k3 (stride 1), k4 (stride), and the
    downsample rule ``stride != 1 or in_ch != planes·4``."""
    planes: int
    stride: int = 1
    dilation: int = 1
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        half = self.planes // 2
        d = self.dilation
        pad = ((d, d), (d, d))
        residual = x

        # branch a: 1×1 then k1 (SCnet_utils.py:103-112)
        a = nn.Conv(half, (1, 1), use_bias=False)(x)
        a = jax.nn.relu(_bn(train)(a))
        a = nn.Conv(half, (3, 3), (self.stride, self.stride), padding=pad,
                    kernel_dilation=(d, d), use_bias=False)(a)
        a = jax.nn.relu(_bn(train)(a))

        # branch b: 1×1 then self-calibrated conv
        b = nn.Conv(half, (1, 1), use_bias=False)(x)
        b = jax.nn.relu(_bn(train)(b))
        # torch AvgPool2d(r, r): VALID floor pooling (window clamped so
        # deep stages with tiny spatial dims keep a non-empty map)
        r = max(1, min(self.pooling_r, b.shape[1], b.shape[2]))
        pooled = nn.avg_pool(b, (r, r), (r, r))
        k2 = nn.Conv(half, (3, 3), padding=pad, kernel_dilation=(d, d),
                     use_bias=False)(pooled)
        k2 = _bn(train)(k2)
        k2 = jax.image.resize(k2, b.shape, "nearest")
        gate = jax.nn.sigmoid(b + k2)
        k3 = nn.Conv(half, (3, 3), padding=pad, kernel_dilation=(d, d),
                     use_bias=False)(b)
        k3 = _bn(train)(k3)
        b = k3 * gate
        b = nn.Conv(half, (3, 3), (self.stride, self.stride), padding=pad,
                    kernel_dilation=(d, d), use_bias=False)(b)
        b = jax.nn.relu(_bn(train)(b))

        out = jnp.concatenate([a, b], axis=-1)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        out = _bn(train)(out)
        if self.stride != 1 or in_ch != self.planes * 4:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               (self.stride, self.stride),
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


class SCNet(nn.Module):
    """SCNet-50, the reference MainModel layout (src/models/SCnet.py:
    265-271: dilated=True): 7×7-s2-p3 stem + 3×3-s2-p1 maxpool, stages
    [3,4,6,3] at planes 64/128/256/512 where layers 3/4 keep stride 1
    with dilations — first block dil 1 then 2 (layer3), first 2 then 4
    (layer4), SCnet.py:123-160 — GAP, Linear."""
    nOut: int = 256
    layers: Sequence[int] = (3, 4, 6, 3)
    log_input: bool = True
    dilated: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = _prep(x, self.log_input)
        h = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        h = jax.nn.relu(_bn(train)(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, n in enumerate(self.layers):
            planes = 64 << stage
            for i in range(n):
                if self.dilated and stage >= 2:
                    stride = 1
                    base = 2 if stage == 2 else 4
                    dil = base // 2 if i == 0 else base
                else:
                    stride = 2 if stage > 0 and i == 0 else 1
                    dil = 1
                h = SCBottleneck(planes, stride, dil)(h, train=train)
        return nn.Dense(self.nOut)(h.mean(axis=(1, 2)))


# ---------------------------------------------------------------------------
# DPN
# ---------------------------------------------------------------------------

class DualPathBlock(nn.Module):
    """Pre-activation dual-path block (parity: src/models/DPN.py:37-87).

    Every conv is the reference's ``BN_ReLU_Conv`` (BatchNorm → ReLU →
    Conv, NO trailing BN — DPN.py:65-71); ``proj``/``down`` blocks run
    a separate pre-activated 1×1 on the same input and slice it into
    the residual/dense shortcuts (DPN.py:73-80)."""
    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int
    inc: int
    groups: int = 32
    block_type: str = "normal"      # 'proj' | 'down' | 'normal'

    @nn.compact
    def __call__(self, res_dense, train=False):
        if isinstance(res_dense, (tuple, list)):
            res, dense = res_dense
            x = jnp.concatenate([res, dense], axis=-1)
        else:                       # first block gets the plain stem map
            res = dense = None
            x = res_dense
        stride = 2 if self.block_type == "down" else 1
        has_proj = self.block_type in ("proj", "down")

        def bn_relu_conv(h, out, k, s=1, groups=1):
            h = jax.nn.relu(_bn(train)(h))
            pad = ((k // 2, k // 2),) * 2
            return nn.Conv(out, (k, k), (s, s), padding=pad,
                           feature_group_count=groups, use_bias=False)(h)

        if has_proj:
            p = bn_relu_conv(x, self.num_1x1_c + 2 * self.inc, 1, stride)
            res_s = p[..., :self.num_1x1_c]
            dense_s = p[..., self.num_1x1_c:]
        else:
            res_s, dense_s = res, dense

        h = bn_relu_conv(x, self.num_1x1_a, 1)
        h = bn_relu_conv(h, self.num_3x3_b, 3, stride, self.groups)
        h = bn_relu_conv(h, self.num_1x1_c + self.inc, 1)

        res_out = res_s + h[..., :self.num_1x1_c]
        dense_out = jnp.concatenate([dense_s, h[..., self.num_1x1_c:]],
                                    axis=-1)
        return res_out, dense_out


class DPN(nn.Module):
    """Dual Path Network (parity: src/models/DPN.py:90-159, DPN-92
    widths). Stem = 7×7/2 p3 conv + BN + ReLU + 3×3/2 p1 maxpool
    (DPN.py:100-106, torch explicit paddings, not SAME); stage s uses
    bw=256·2^s, R=k_R·bw/256, first block 'proj' (stride 1) at stage 0
    and 'down' elsewhere (DPN.py:108-148). Head: residual+dense concat
    → global mean (≡ the reference's 7×7 avg_pool on its 224-input 7×7
    map) → Dense(nOut) standing in for its ImageNet classifier.
    ``k_sec`` default is depth-trimmed vs dpn92's (3,4,20,3) for the
    speaker workload; pass (3,4,20,3) for the paper config."""
    nOut: int = 512
    k_r: int = 96
    groups: int = 32
    k_sec: Sequence[int] = (3, 4, 8, 3)      # depth trimmed vs (3,4,20,3)
    inc_sec: Sequence[int] = (16, 32, 24, 128)
    num_init_features: int = 64
    log_input: bool = True
    image_input: bool = False       # feed NHWC images directly (no _prep)

    @nn.compact
    def __call__(self, x, train=False):
        if not self.image_input:
            x = _prep(x, self.log_input)
        h = nn.Conv(self.num_init_features, (7, 7), (2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False)(x)
        h = jax.nn.relu(_bn(train)(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        data = h                                     # plain tensor in
        for stage, (n, inc) in enumerate(zip(self.k_sec, self.inc_sec)):
            bw = 256 << stage
            r = int(self.k_r * bw / 256)
            for i in range(n):
                if i == 0:
                    btype = "proj" if stage == 0 else "down"
                else:
                    btype = "normal"
                data = DualPathBlock(r, r, bw, inc, self.groups,
                                     btype)(data, train=train)
        feats = jnp.concatenate(data, axis=-1)
        return nn.Dense(self.nOut)(feats.mean(axis=(1, 2)))


def _feature_flag(kwargs):
    return kwargs.get("feature_type",
                      kwargs.get("features", "melspectrogram")) == "melspectrogram"


@MODELS.register("EfficientNet")
def build_efficientnet(nOut: int = 512, version: str = "b4",
                       aggregate: str = "ASP", **kwargs) -> EfficientNet:
    """MainModel parity (src/models/EfficientNet.py:207-217)."""
    params = {"b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2),
              "b2": (1.1, 1.2, 0.3), "b3": (1.2, 1.4, 0.3),
              "b4": (1.4, 1.8, 0.4), "b5": (1.6, 2.2, 0.4),
              "b6": (1.8, 2.6, 0.5), "b7": (2.0, 3.1, 0.5)}
    w, d, p = params[version]
    return EfficientNet(nOut=nOut, width_coeff=w, depth_coeff=d,
                        dropout_rate=p, aggregate=aggregate,
                        log_input=_feature_flag(kwargs))


@MODELS.register("EfficientNetv2")
def build_efficientnetv2(nOut: int = 512, **kwargs) -> EfficientNetV2:
    """MainModel parity (src/models/EfficientNetv2.py; effnetv2-s cfgs
    by default, overridable via ``cfgs`` / ``width_mult``)."""
    opts = {k: kwargs[k] for k in ("cfgs", "width_mult") if k in kwargs}
    if "cfgs" in opts:
        opts["cfgs"] = tuple(tuple(c) for c in opts["cfgs"])
    return EfficientNetV2(nOut=nOut, log_input=_feature_flag(kwargs), **opts)


@MODELS.register("RepVGG")
def build_repvgg(nOut: int = 256, deploy: bool = False, **kwargs) -> RepVGG:
    """MainModel parity (src/models/RepVGG.py:335-337, RepVGG-D2se)."""
    return RepVGG(nOut=nOut, deploy=deploy, log_input=_feature_flag(kwargs))


@MODELS.register("SCnet")
def build_scnet(nOut: int = 256, **kwargs) -> SCNet:
    """MainModel parity (src/models/SCnet.py:265-271)."""
    return SCNet(nOut=nOut, log_input=_feature_flag(kwargs))


@MODELS.register("DPN")
def build_dpn(nOut: int = 512, **kwargs) -> DPN:
    """MainModel parity (src/models/DPN.py; dpn92-style widths by
    default, sizable via ``k_sec``/``inc_sec``/``k_r``/``groups``)."""
    opts = {k: kwargs[k] for k in
            ("k_r", "groups", "num_init_features") if k in kwargs}
    for k in ("k_sec", "inc_sec"):
        if k in kwargs:
            opts[k] = tuple(kwargs[k])
    return DPN(nOut=nOut, log_input=_feature_flag(kwargs), **opts)
