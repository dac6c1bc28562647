"""Hybrid losses combining classification and metric-learning heads.

Behavioral parity targets:
* ``SoftmaxAngularProto`` — src/losses/SoftmaxAngularProto.py:12-30
  (softmax CE + angular prototypical, summed)
* ``AmSoftmaxProto``      — src/losses/AmSoftmaxProto.py (AM + AP)
* ``AAmSoftmaxProto``     — src/losses/AAmSoftmaxProto.py (AAM + AP)
* ``AAmSoftmaxAP``        — src/losses/AAmSoftmaxAP.py:14-33
  ((AAM + AP + softmax) / 3 — the VLSP config's loss)
"""

from __future__ import annotations

import flax.linen as nn
import jax

from speakerverification_tpu.losses.margin import AAmSoftmax, AmSoftmax, Softmax
from speakerverification_tpu.losses.proto import AngularProto
from speakerverification_tpu.registry import LOSSES

__all__ = ["SoftmaxAngularProto", "AmSoftmaxProto", "AAmSoftmaxProto",
           "AAmSoftmaxAP"]


@LOSSES.register("SoftmaxAngularProto")
class SoftmaxAngularProto(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        assert x.ndim == 3 and x.shape[1] == 2
        loss_s, prec1 = Softmax(self.nOut, self.nClasses)(x, label)
        loss_p, _ = AngularProto(self.init_w, self.init_b)(x, None)
        return loss_s + loss_p, prec1


@LOSSES.register("AmSoftmaxProto")
class AmSoftmaxProto(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        assert x.ndim == 3 and x.shape[1] == 2
        loss_m, prec1 = AmSoftmax(self.nOut, self.nClasses, self.margin,
                                  self.scale)(x, label)
        loss_p, _ = AngularProto(self.init_w, self.init_b)(x, None)
        return loss_m + loss_p, prec1


@LOSSES.register("AAmSoftmaxProto")
class AAmSoftmaxProto(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.2
    scale: float = 30.0
    easy_margin: bool = False
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        assert x.ndim == 3 and x.shape[1] == 2
        loss_m, prec1 = AAmSoftmax(self.nOut, self.nClasses, self.margin,
                                   self.scale, self.easy_margin)(x, label)
        loss_p, _ = AngularProto(self.init_w, self.init_b)(x, None)
        return loss_m + loss_p, prec1


@LOSSES.register("AAmSoftmaxAP")
class AAmSoftmaxAP(nn.Module):
    """(AAM-softmax + angular-proto + softmax) / 3; prec1 from the softmax
    head (parity: src/losses/AAmSoftmaxAP.py:24-33)."""
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.2
    scale: float = 30.0
    easy_margin: bool = False
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        assert x.ndim == 3 and x.shape[1] == 2
        loss_aam, _ = AAmSoftmax(self.nOut, self.nClasses, self.margin,
                                 self.scale, self.easy_margin)(x, label)
        loss_ap, _ = AngularProto(self.init_w, self.init_b)(x, None)
        loss_s, prec2 = Softmax(self.nOut, self.nClasses)(x, label)
        return (loss_aam + loss_ap + loss_s) / 3.0, prec2
