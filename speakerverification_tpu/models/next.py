"""RawNeXt and ResNeXt raw-waveform encoders (Flax).

Parity targets:
* ``NeXt_utils`` — src/models/NeXt_utils.py:5-160: multi-head gate
  module and the elastic ResNeXt bottleneck with dynamic scaling policy
  (original-, down-(avgpool3→convT3) and up-(convT3→avgpool3) resolution
  branches, grouped 3×1 convs, gate or sum aggregation).
* ``RawNeXt``  — src/models/RawNeXt.py:8-193: DLA tree aggregation
  (Root/Tree) over elastic bottlenecks, 6 levels with maxpool(3) after
  each, ASP head, ×9-normalized train codes.
* ``ResNeXt``  — src/models/ResNeXt.py:9-125: same trunk without the
  DLA trees (plain block stacks).

Both consume raw waveforms pad-wrapped to 3¹⁰ = 59049 samples (the
reference's ``x.repeat(batch, ...)`` tiling contains a batch-dim bug —
we implement the intended per-example wrap, documented).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.rawnet_blocks import max_pool1d
from speakerverification_tpu.registry import MODELS

__all__ = ["RawNeXt", "ResNeXt"]

FIXED_SAMPLES = 59049          # 3^10


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


class GateModule(nn.Module):
    """Softmax gate over n branch outputs (parity: NeXt_utils.py:5-29).

    The reference pools the CONCATENATED branches to [B, n·C] and
    reshapes row-major to [B, C, n] (NeXt_utils.py:19) — so gate slot j
    of channel i reads concat channel 3i+j, an INTERLEAVED view, while
    the weights are applied to each branch's contiguous slice
    (:22-28). Replicated exactly: the scrambled view feeds the MLP, the
    per-slot softmax weights multiply the unscrambled branches."""
    channels: int
    bottleneck: int
    nb_input: int

    @nn.compact
    def __call__(self, branches, train=False):
        n = len(branches)
        pooled = jnp.concatenate([b.mean(axis=1) for b in branches],
                                 axis=-1)                    # [B, n*C]
        gate_in = pooled.reshape(pooled.shape[0], self.channels, n)
        gate_in = jnp.transpose(gate_in, (0, 2, 1))          # [B, n, C]
        h = nn.Conv(self.bottleneck, (1,))(gate_in)
        h = jax.nn.relu(h)
        h = _bn(train)(h)
        h = nn.Conv(self.channels, (1,))(h)                  # [B, n, C]
        w = jax.nn.softmax(h, axis=1)                        # over slots
        return sum(w[:, i, None, :] * branches[i] for i in range(n))


class ElasticBottleneck(nn.Module):
    """ResNeXt bottleneck with DSP/up-path/gate (NeXt_utils.py:32-160)."""
    planes: int
    dsp: bool = True
    up_path: bool = True
    gate: bool = True
    dilation: int = 1
    cardinality: int = 32

    @nn.compact
    def __call__(self, x, train=False):
        inplanes = x.shape[-1]
        card = self.cardinality
        width = self.planes
        if self.dsp:
            card //= 2
            width //= 2
            card_split = card // 2 if self.up_path else card
            width_split = width // 2 if self.up_path else width

        residual = x
        if inplanes != self.planes:
            residual = nn.Conv(self.planes, (1,), use_bias=False)(x)

        def branch(inp, w, c):
            h = nn.Conv(w, (1,), use_bias=False)(inp)
            h = jax.nn.relu(_bn(train)(h))
            h = nn.Conv(w, (3,), padding="SAME",
                        kernel_dilation=(self.dilation,),
                        feature_group_count=c, use_bias=False)(h)
            h = jax.nn.relu(_bn(train)(h))
            return nn.Conv(self.planes, (1,), use_bias=False)(h)

        out = branch(x, width, card)
        branches = [out]

        if self.dsp:
            # low-resolution: avgpool3 -> branch -> convT x3
            # (torch ConvTranspose1d k3 s3 p0 == flax VALID, length 3L)
            x_d = nn.avg_pool(x, (3,), (3,))
            out_d = branch(x_d, width_split, card_split)
            out_d = nn.ConvTranspose(self.planes, (3,), (3,),
                                     padding="VALID")(out_d)
            out_d = out_d[:, :out.shape[1], :]
            branches.append(out_d)
            if self.up_path:
                # high-resolution: convT x3 -> branch -> avgpool3
                x_u = nn.ConvTranspose(inplanes, (3,), (3,),
                                       padding="VALID")(x)
                out_u = branch(x_u, width_split, card_split)
                out_u = nn.avg_pool(out_u, (3,), (3,))[:, :out.shape[1], :]
                branches.append(out_u)

        if self.dsp and self.gate:
            out = GateModule(self.planes, max(self.planes // len(branches), 1),
                             len(branches))(branches, train=train)
        else:
            out = sum(branches)

        # the SHARED bn3 runs after branch aggregation, before the
        # residual add (NeXt_utils.py:137-177)
        out = _bn(train)(out)
        return jax.nn.relu(out + residual)


class Root(nn.Module):
    """DLA root: conv over concatenated children (RawNeXt.py:8-26)."""
    features: int
    kernel_size: int = 1
    residual: bool = False

    @nn.compact
    def __call__(self, children, train=False):
        x = nn.Conv(self.features, (self.kernel_size,), padding="SAME",
                    use_bias=False)(jnp.concatenate(children, axis=-1))
        x = _bn(train)(x)
        if self.residual:
            x = x + children[0]
        return jax.nn.relu(x)


class Tree(nn.Module):
    """DLA tree aggregation (parity: RawNeXt.py:28-81)."""
    levels: int
    planes: int
    level_root: bool = False
    dsp: bool = True
    up_path: bool = True
    gate: bool = True

    @nn.compact
    def __call__(self, x, children: Optional[list] = None, train=False):
        children = [] if children is None else children
        if self.level_root:
            children.append(x)
        if self.levels == 1:
            x1 = ElasticBottleneck(self.planes, self.dsp, self.up_path,
                                   self.gate)(x, train=train)
            x2 = ElasticBottleneck(self.planes, self.dsp, self.up_path,
                                   self.gate)(x1, train=train)
            return Root(self.planes)( [x2, x1, *children], train=train)
        x1 = Tree(self.levels - 1, self.planes, False, self.dsp,
                  self.up_path, self.gate)(x, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.planes, False, self.dsp,
                    self.up_path, self.gate)(x1, children, train=train)


class _NeXtBase(nn.Module):
    nOut: int = 512
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (128, 128, 256, 256, 512, 512)
    dsp: bool = True
    up_path: bool = True
    gate: bool = True
    use_tree: bool = True          # RawNeXt (DLA) vs ResNeXt (plain stacks)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → embeddings [B, nOut]."""
        B, T = x.shape
        reps = FIXED_SAMPLES // T + 1
        x = jnp.tile(x, (1, reps))[:, :FIXED_SAMPLES]
        x = x[:, :, None]

        x = nn.Conv(self.channels[0], (3,), (3,), padding="VALID",
                    use_bias=False)(x)
        x = jax.nn.relu(_bn(train)(x))

        # level0/1: plain conv levels
        for li in range(2):
            for _ in range(self.levels[li]):
                x = nn.Conv(self.channels[li], (3,), padding="SAME",
                            use_bias=False)(x)
                x = jax.nn.relu(_bn(train)(x))
            x = max_pool1d(x, 3)

        for li in range(2, 6):
            if self.use_tree:
                x = Tree(self.levels[li], self.channels[li],
                         level_root=(li >= 3), dsp=self.dsp,
                         up_path=self.up_path, gate=self.gate)(x, train=train)
            else:
                for _ in range(self.levels[li]):
                    x = ElasticBottleneck(self.channels[li], self.dsp,
                                          self.up_path, self.gate)(
                        x, train=train)
            x = max_pool1d(x, 3)

        # ASP head (RawNeXt.py:115-127)
        C = self.channels[5]
        attn = nn.Conv(C // 8, (1,))(x)
        attn = jax.nn.relu(attn)
        attn = _bn(train)(attn)
        attn = nn.Conv(C, (1,))(attn)
        w = jax.nn.softmax(attn, axis=1)
        m = jnp.sum(x * w, axis=1)
        s = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=1) - m ** 2, 1e-5))
        h = _bn(train)(jnp.concatenate([m, s], axis=-1))

        code = nn.Dense(self.nOut)(h)
        code = _bn(train)(code)
        if train:
            # ×9-normalized training codes (RawNeXt.py:174-178)
            norm = jnp.linalg.norm(code, axis=1, keepdims=True) / 9.0
            code = code / jnp.clip(norm, 1e-12)
        return code


class RawNeXt(_NeXtBase):
    use_tree: bool = True


class ResNeXt(_NeXtBase):
    use_tree: bool = False


@MODELS.register("RawNeXt")
def build_rawnext(nOut: int = 512, **kwargs) -> RawNeXt:
    """MainModel parity (src/models/RawNeXt.py:180-193)."""
    return RawNeXt(nOut=nOut)


@MODELS.register("ResNeXt")
def build_resnext(nOut: int = 512, **kwargs) -> ResNeXt:
    """MainModel parity (src/models/ResNeXt.py:112-125)."""
    return ResNeXt(nOut=nOut)
