"""SE-ResNet image-style encoders (vendored-senet parity).

Parity target: the vendored ``src/models/senet/`` package
(se_resnet18/34/50/101/152 built from SEBasicBlock/SEBottleneck with an
ImageNet stem). Exposed here as registered builders over the same SE
blocks used by ResNetSE, with a 7×7/stride-2 stem + maxpool and GAP+fc
head, consuming mel images like the other 2-D encoders.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.image_encoders import _prep
from speakerverification_tpu.models.resnetse import (
    SEBasicBlock,
    SEBottleneck,
    _bn,
)
from speakerverification_tpu.registry import MODELS

__all__ = ["SEResNet"]


class SEResNet(nn.Module):
    nOut: int = 512
    block: str = "basic"               # 'basic' | 'bottleneck'
    layers: Sequence[int] = (2, 2, 2, 2)
    log_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block_cls = SEBasicBlock if self.block == "basic" else SEBottleneck
        x = _prep(x, self.log_input)
        h = nn.Conv(64, (7, 7), (2, 2), padding="SAME", use_bias=False)(x)
        h = jax.nn.relu(_bn(train)(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")
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
