"""Model summary: per-module parameter counts and feature-shape math.

Parity target: the reference's model-plot tool (src/model.py:797-833 —
torchsummary dump incl. trainable params and the mel frame count derived
from audio_spec).
"""

from __future__ import annotations

from typing import Mapping

import jax
import numpy as np

__all__ = ["count_params", "summarize_params", "mel_frames_for_spec",
           "forward_flops"]


def count_params(params) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def summarize_params(params, max_depth: int = 2) -> str:
    """Tabulated per-module parameter counts (grouped to ``max_depth``)."""
    groups: dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        group = "/".join(keys[:max_depth])
        groups[group] = groups.get(group, 0) + int(np.prod(leaf.shape))
    width = max((len(g) for g in groups), default=10) + 2
    lines = [f"{'module':<{width}}{'params':>12}"]
    for g in sorted(groups):
        lines.append(f"{g:<{width}}{groups[g]:>12,}")
    total = count_params(params)
    lines.append("-" * (width + 12))
    lines.append(f"{'total':<{width}}{total:>12,}")
    return "\n".join(lines)


def mel_frames_for_spec(audio_spec: Mapping, center: bool = True) -> int:
    """Number of mel frames for a crop (parity: src/model.py:820-833)."""
    sr = int(audio_spec["sample_rate"])
    samples = int(audio_spec["sentence_len"] * sr)
    hop = int(round(audio_spec.get("hop_len", 0.01) * sr))
    if center:
        return 1 + samples // hop
    win = int(round(audio_spec.get("win_len", 0.025) * sr))
    return 1 + (samples - win) // hop


def forward_flops(model, variables, x) -> float:
    """XLA-counted FLOPs of one eval forward (the compiler's own cost
    analysis of the optimized program — exact where the reference's
    torchsummary Mult-Adds at src/model.py:806 are a per-layer
    estimate). Returns NaN when the backend reports no cost model."""
    import jax.numpy as jnp

    compiled = (jax.jit(lambda v, y: model.apply(v, y, train=False))
                .lower(variables, jnp.asarray(x)).compile())
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:                                # pragma: no cover
        return float("nan")


def _main() -> None:
    """Model-plot CLI (parity: the reference's ``python src/model.py``
    __main__ block, src/model.py:797-833: build the model from
    yaml/model_plot.yaml, print the parameter table and the mel frame
    count for the configured audio_spec)."""
    import argparse

    import jax.numpy as jnp

    from speakerverification_tpu.builder import encoder_from_hparams
    from speakerverification_tpu.config import read_config

    p = argparse.ArgumentParser(description="model summary / plot tool")
    p.add_argument("--config", type=str, default="yaml/model_plot.yaml")
    p.add_argument("--max_depth", type=int, default=2)
    args = p.parse_args()

    hparams = read_config(args.config)
    model = encoder_from_hparams(hparams, with_loss=False)
    spec = hparams.get("audio_spec", {})
    sr = int(spec.get("sample_rate", 16000))
    t = int(float(spec.get("sentence_len", 2.0)) * sr)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t)))
    print(summarize_params(variables["params"], max_depth=args.max_depth))
    flops = forward_flops(model, variables, jnp.zeros((1, t)))
    print(f"\ninput: {t} samples @ {sr} Hz -> "
          f"{mel_frames_for_spec(spec)} mel frames")
    if flops == flops:                               # not NaN
        print(f"forward: {flops / 1e9:.2f} GFLOPs/utt (XLA cost analysis)")


if __name__ == "__main__":
    _main()
