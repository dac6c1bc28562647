"""Model export: serialized params + StableHLO program.

TPU-native replacement for the reference's ONNX export
(src/model.py:748-792, src/export.py:13-37): instead of opset-11 ONNX,
the eval-mode embedding function is lowered with ``jax.export`` to a
StableHLO artifact (plus msgpack weights + a JSON architecture config),
which any XLA-backed runtime can load. A self-check runs the exported
function against the live model (parity with the reference's
``onnx.checker`` + ORT session check).

The fixed export signature matches the reference's dummy input
``[num_eval, sr * sentence_len]`` (src/model.py:756-767).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
import flax.serialization as fser

from speakerverification_tpu.inference import InferenceEngine

__all__ = ["export_model", "load_exported"]


def export_model(hparams: Mapping, out_dir: str | Path | None = None) -> dict:
    """Export eval-mode embedding extraction. Returns artifact paths."""
    # jax.export pins the device count the function was traced with —
    # an artifact captured over N local chips would refuse to load on
    # any other topology, so exports always trace the single-device fn
    engine = InferenceEngine({**hparams, "eval_data_parallel": False})
    spec = hparams.get("audio_spec", {})
    sr = int(spec.get("sample_rate", 8000))
    T = int(spec.get("sentence_len", 2.0) * sr)
    num_eval = int(hparams.get("num_eval", 10))

    out_dir = Path(out_dir) if out_dir else (engine.dirs["model"] / "export")
    out_dir.mkdir(parents=True, exist_ok=True)

    # 1. weights + architecture config
    (out_dir / "params.msgpack").write_bytes(fser.to_bytes(
        {"params": engine.state.params,
         "batch_stats": engine.state.batch_stats}))
    arch = {"model": hparams.get("model", {}),
            "features": hparams.get("features", "melspectrogram"),
            "n_mels": hparams.get("n_mels", 80),
            "audio_spec": dict(spec), "num_eval": num_eval,
            "embedding_normalized": bool(
                getattr(engine.model.loss, "test_normalize", True))}
    (out_dir / "config.json").write_text(json.dumps(arch, indent=2))

    # 2. StableHLO program for the fixed eval signature
    def fn(wave):
        return engine._embed(engine.state.params, engine.state.batch_stats,
                             wave)

    example = jnp.zeros((num_eval, T), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(example)
    (out_dir / "model.stablehlo").write_bytes(exported.serialize())

    # 3. self-check: exported vs live (parity: onnx checker, model.py:776-781)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.1, (num_eval, T)).astype(np.float32))
    live = np.asarray(fn(x))
    replay = np.asarray(exported.call(x))
    np.testing.assert_allclose(live, replay, rtol=1e-4, atol=1e-5)

    print(f"[INFO] exported to {out_dir} (embedding dim {live.shape[-1]})")
    return {"dir": str(out_dir),
            "params": str(out_dir / "params.msgpack"),
            "stablehlo": str(out_dir / "model.stablehlo"),
            "config": str(out_dir / "config.json")}


def load_exported(out_dir: str | Path):
    """Rehydrate an exported model → callable ``wave -> embeddings``."""
    out_dir = Path(out_dir)
    exported = jax.export.deserialize(
        (out_dir / "model.stablehlo").read_bytes())
    return lambda wave: exported.call(jnp.asarray(wave))
