"""export_onnx disposition gate (export.py): ONNX export is an
accepted, documented divergence — the entry point must say so clearly
both without and with an importable ``onnx`` (MIGRATION.md 'ONNX
consumers'; reference: src/model.py:748-792, src/export.py:13-37)."""

import sys
import types

import pytest

from speakerverification_tpu.export import export_onnx


def test_export_onnx_without_onnx_names_the_routes():
    assert "onnx" not in sys.modules or sys.modules["onnx"] is None
    with pytest.raises(RuntimeError) as e:
        export_onnx({})
    msg = str(e.value)
    assert "export_model" in msg          # StableHLO route
    assert "converter" in msg             # torch round-trip route
    assert "MIGRATION.md" in msg


def test_export_onnx_with_mocked_onnx_states_divergence(monkeypatch):
    monkeypatch.setitem(sys.modules, "onnx", types.ModuleType("onnx"))
    with pytest.raises(NotImplementedError) as e:
        export_onnx({})
    assert "accepted divergence" in str(e.value)
    assert "MIGRATION.md" in str(e.value)
