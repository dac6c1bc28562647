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

__all__ = ["export_model", "export_onnx", "load_exported"]


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


def export_onnx(hparams: Mapping, out_dir: str | Path | None = None):
    """ONNX export — ACCEPTED DIVERGENCE (documented in MIGRATION.md).

    The reference exports via ``torch.onnx.export`` (src/model.py:748-781)
    and notes in its own comment (src/model.py:756) that the export is
    broken for every torchaudio/mel-frontend model — only the raw-wave
    families ever produced an artifact. This framework's programs are
    JAX/StableHLO; a faithful ONNX emission would require a
    jaxpr-to-ONNX compiler, and neither ``onnx`` nor ``onnxruntime`` is
    present in the target image to validate one against. Rather than
    ship an unverifiable converter, ONNX export is an accepted,
    documented divergence; this entry point exists so the decision is
    discoverable at the exact API a reference user would reach for.

    Supported interop routes (both tested):
      * ``export_model`` — StableHLO + msgpack params + config.json,
        loadable by any XLA-backed runtime (``load_exported``), with a
        replay self-check standing in for the reference's onnx.checker
        pass.
      * the checkpoint converter CLI — round-trips weights with the
        torch ecosystem, where ``torch.onnx.export`` can be applied to
        a reference-side model if an ONNX artifact is truly required.
    """
    try:
        import onnx  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "ONNX export is not supported: the 'onnx' package is not "
            "installed, and jaxpr->ONNX conversion is an accepted "
            "divergence from the reference (whose own ONNX export is "
            "broken for mel-frontend models, src/model.py:756). Use "
            "export_model() for the StableHLO serving artifact, or the "
            "checkpoint converter CLI to reach the torch ecosystem. "
            "See MIGRATION.md 'ONNX export'.") from None
    raise NotImplementedError(
        "jaxpr->ONNX conversion is an accepted divergence: no converter "
        "ships even when 'onnx' is importable, because it cannot be "
        "validated in the target image (no onnxruntime) and the "
        "reference's exporter it would mirror is itself broken for "
        "mel-frontend models (src/model.py:756). See MIGRATION.md "
        "'ONNX export' for the supported interop routes.")


def load_exported(out_dir: str | Path):
    """Rehydrate an exported model → callable ``wave -> embeddings``."""
    out_dir = Path(out_dir)
    exported = jax.export.deserialize(
        (out_dir / "model.stablehlo").read_bytes())
    return lambda wave: exported.call(jnp.asarray(wave))
