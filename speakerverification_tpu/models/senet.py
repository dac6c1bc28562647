"""SE-ResNet image-style encoders (vendored-senet parity).

Parity target: the vendored ``src/models/senet/`` package —
se_resnet18/34/50/101/152 are ``torchvision.models.ResNet`` trunks built
from the senet-file SEBasicBlock/SEBottleneck
(src/models/senet/se_resnet.py:11-87) whose SE is the senet
``SELayer`` — BIAS-FREE c/reduction excitation
(src/models/senet/se_module.py:4-19) for BOTH block families, unlike
the root-ResNetBlocks bottleneck variant ResNetSE50/101/152 use.

Trunk semantics are torchvision-exact so ported ImageNet-format
checkpoints reproduce the torch forward: 7×7/2 stem with EXPLICIT (3,3)
padding (torch ``padding=3`` — XLA "SAME" pads (2,3) on even inputs and
silently shifts every window), 3×3/2 maxpool with (1,1) padding,
1×1-conv+BN downsample whenever stride≠1 or channels change (including
the stride-1 layer1 entry of bottleneck nets), GAP → biased fc.

Registered speaker builders consume mel images via the shared ``_prep``;
``raw_image=True`` (the port-parity tests) feeds an NHWC image directly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.image_encoders import _prep
from speakerverification_tpu.models.resnetse import SEBasicBlock, SELayer, _bn
from speakerverification_tpu.registry import MODELS

__all__ = ["SEResNet", "SENetBottleneck"]


class SENetBottleneck(nn.Module):
    """senet-file SEBottleneck (se_resnet.py:46-87): 1×1 → 3×3-stride →
    1×1×4, BIAS-FREE c/16 SE (se_module.py — NOT the biased fixed-16
    root-file variant resnetse.SEBottleneck carries), downsample on
    stride or channel change, post-add relu."""
    expansion = 4
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = jax.nn.relu(_bn(train)(out))
        out = nn.Conv(self.planes, (3, 3), self.stride,
                      padding=((1, 1), (1, 1)), use_bias=False)(out)
        out = jax.nn.relu(_bn(train)(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        out = _bn(train)(out)
        out = SELayer()(out)             # bias-free c/16 (se_module.py)
        out_ch = self.planes * 4
        if self.stride != (1, 1) or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), self.stride,
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


class SEResNet(nn.Module):
    nOut: int = 512
    block: str = "basic"               # 'basic' | 'bottleneck'
    layers: Sequence[int] = (2, 2, 2, 2)
    log_input: bool = True
    raw_image: bool = False            # True: x is already an NHWC image

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block_cls = SEBasicBlock if self.block == "basic" else SENetBottleneck
        if not self.raw_image:
            x = _prep(x, self.log_input)
        # torchvision stem: conv 7×7/2 pad 3, bn, relu, maxpool 3×3/2 pad 1
        h = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        h = jax.nn.relu(_bn(train)(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, n in enumerate(self.layers):
            planes = 64 << stage
            for i in range(n):
                stride = (2, 2) if stage > 0 and i == 0 else (1, 1)
                h = block_cls(planes, stride)(h, train=train)
        return nn.Dense(self.nOut)(h.mean(axis=(1, 2)))


def _register(name: str, block: str, layers):
    @MODELS.register(name)
    def build(nOut: int = 512, **kwargs):
        feature_type = kwargs.get("feature_type",
                                  kwargs.get("features", "melspectrogram"))
        return SEResNet(nOut=nOut, block=block, layers=tuple(layers),
                        log_input=(feature_type == "melspectrogram"))
    build.__name__ = f"build_{name}"
    return build


_register("se_resnet18", "basic", (2, 2, 2, 2))
_register("se_resnet34", "basic", (3, 4, 6, 3))
_register("se_resnet50", "bottleneck", (3, 4, 6, 3))
_register("se_resnet101", "bottleneck", (3, 4, 23, 3))
_register("se_resnet152", "bottleneck", (3, 8, 36, 3))
