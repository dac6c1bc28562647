"""Reverse weight port (compat/torch_export.py): our tree → torch
state_dict, validated by exact round-trip through the reference's own
models (the supported route to the reference's torch.onnx.export,
src/model.py:748-781 — see MIGRATION.md 'ONNX consumers')."""

import sys
import types

import numpy as np
import pytest

from speakerverification_tpu.compat.torch_export import (
    porter_args,
    reverse_port,
    shapes_of_state_dict,
)


def _reference_path():
    for name in ("torchaudio", "nnAudio", "nnAudio.features"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def small_ref_ecapa():
    _reference_path()
    import torch
    from models import ECAPA_TDNN as RefE

    torch.manual_seed(3)
    net = RefE.MainModel(nOut=64, channels=[64, 64, 64, 64, 192],
                         attention_channels=16, res2net_scale=4,
                         se_channels=16, n_mels=80, augment=False,
                         augment_options={"augment_chain": []},
                         features="raw")
    net.eval()
    return net


def test_ecapa_roundtrip_exact(small_ref_ecapa):
    """torch sd → forward port → reverse port → identical sd, loadable
    strict back into the reference model."""
    import torch

    from speakerverification_tpu.compat.torch_port import (
        ecapa_from_torch_state_dict,
    )

    sd0 = small_ref_ecapa.state_dict()
    params, stats = ecapa_from_torch_state_dict(sd0, n_blocks=4,
                                                res2net_scale=4)
    tree = {"params": {"backbone": params},
            "batch_stats": {"backbone": stats}}

    sd1 = reverse_port(tree, shapes_of_state_dict(sd0), "ECAPA_TDNN",
                       porter_args(res2net_scale=4))
    for k, v in sd0.items():
        assert k in sd1, f"missing {k}"
        np.testing.assert_array_equal(
            sd1[k], v.numpy().astype(sd1[k].dtype), err_msg=k)

    small_ref_ecapa.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd1.items()}, strict=True)


def test_reverse_port_rejects_wrong_family(small_ref_ecapa):
    sd0 = small_ref_ecapa.state_dict()
    with pytest.raises((ValueError, KeyError)):
        reverse_port({"params": {"backbone": {"bogus": np.zeros(3)}},
                      "batch_stats": {"backbone": {}}},
                     shapes_of_state_dict(sd0), "ECAPA_TDNN",
                     porter_args(res2net_scale=4))


def test_reverse_port_carries_loss_head(small_ref_ecapa):
    from speakerverification_tpu.compat.torch_port import (
        ecapa_from_torch_state_dict,
    )

    sd0 = small_ref_ecapa.state_dict()
    params, stats = ecapa_from_torch_state_dict(sd0, n_blocks=4,
                                                res2net_scale=4)
    centers = np.random.default_rng(0).normal(size=(10, 64)) \
        .astype(np.float32)
    tree = {"params": {"backbone": params, "loss": {"weight": centers}},
            "batch_stats": {"backbone": stats}}
    sd1 = reverse_port(tree, shapes_of_state_dict(sd0), "ECAPA_TDNN",
                       porter_args(res2net_scale=4))
    np.testing.assert_array_equal(sd1["__L__.weight"], centers)


@pytest.mark.slow
def test_rawnet3_roundtrip_exact():
    """Second family, with BN running stats and the sinc front."""
    from test_torch_parity import _install_asteroid_stub
    _install_asteroid_stub()
    _reference_path()
    import torch
    from models import RawNet3 as RefR
    from speakerverification_tpu.compat.torch_port import (
        rawnet3_from_torch_state_dict,
    )

    torch.manual_seed(0)
    net = RefR.MainModel(nOut=64, model_scale=8, context=True, summed=True,
                         out_bn=False, log_sinc=True, norm_sinc="mean",
                         encoder_type="ASP", sinc_stride=10)
    net.eval()
    sd0 = net.state_dict()
    params, stats = rawnet3_from_torch_state_dict(sd0, model_scale=8)
    tree = {"params": {"backbone": params},
            "batch_stats": {"backbone": stats}}
    # fill_from supplies the keys the porter never consumes: constant
    # buffers (PreEmphasis flipped_filter) and the dead bn1/bn6 modules
    # of this config (out_bn=False, src/models/RawNet3.py) — exactly
    # what the CLI's --like checkpoint provides
    sd1 = reverse_port(tree, shapes_of_state_dict(sd0), "RawNet3",
                       porter_args(model_scale=8), fill_from=sd0)
    for k, v in sd0.items():
        np.testing.assert_array_equal(
            sd1[k], v.numpy().astype(sd1[k].dtype), err_msg=k)
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd1.items()}, strict=True)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["ResNetSE34", "SCnet", "RawNet3",
                                  "RawNet2", "TitaNet", "RawNeXt"])
def test_reverse_roundtrip_across_families(arch):
    """The id-tracing inverse is porter-GENERIC: exact round-trip for
    every family the converter CLI is tested on (same builders as
    test_converter_cli_families; with a --like donor every torch key —
    learned, constant buffer, or dead module — reconstructs exactly)."""
    from test_converter_cli_families import FAMILIES

    sd0, extra, direct = FAMILIES[arch]()
    params, stats = direct(sd0)
    tree = {"params": {"backbone": params},
            "batch_stats": {"backbone": stats}}
    pa = porter_args(model_scale=4) if arch == "RawNet3" else porter_args()
    sd1 = reverse_port(tree, shapes_of_state_dict(sd0), arch, pa,
                       fill_from=sd0)
    for k, v in sd0.items():
        v = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        assert k in sd1, f"{arch}: missing {k}"
        if ".bias_ih_l" in k or ".bias_hh_l" in k:
            # the GRU r/z gate biases are FOLDED (bi+bh) by the porter
            # (torch_port._gru_at) — torch only ever uses their sum, so
            # the reverse reconstructs an equivalent split; compare sums
            if ".bias_hh_l" in k:
                continue
            hh = k.replace(".bias_ih_l", ".bias_hh_l")
            ref_sum = v + (sd0[hh].numpy() if hasattr(sd0[hh], "numpy")
                           else np.asarray(sd0[hh]))
            np.testing.assert_allclose(sd1[k] + sd1[hh],
                                       ref_sum.astype(np.float32),
                                       rtol=1e-6, err_msg=f"{arch}:{k}+hh")
            continue
        np.testing.assert_array_equal(sd1[k], v.astype(sd1[k].dtype),
                                      err_msg=f"{arch}:{k}")


@pytest.mark.slow
def test_shapes_route_synthesizes_constants_and_guards_zero_fill():
    """Without a --like donor: known constant buffers (PreEmphasis
    flipped_filter) are synthesized exactly; unknown never-consumed
    keys (RawNet3's dead bn1/bn6) raise unless explicitly allowed
    (review finding r5 — a zero-filled functional buffer loads strict
    and computes garbage)."""
    from test_torch_parity import _install_asteroid_stub
    _install_asteroid_stub()
    _reference_path()
    import torch
    from models import RawNet3 as RefR

    from speakerverification_tpu.compat.torch_port import (
        rawnet3_from_torch_state_dict,
    )

    torch.manual_seed(0)
    net = RefR.MainModel(nOut=64, model_scale=8, context=True, summed=True,
                         out_bn=False, log_sinc=True, norm_sinc="mean",
                         encoder_type="ASP", sinc_stride=10)
    sd0 = net.state_dict()
    params, stats = rawnet3_from_torch_state_dict(sd0, model_scale=8)
    tree = {"params": {"backbone": params},
            "batch_stats": {"backbone": stats}}
    shapes = shapes_of_state_dict(sd0)

    with pytest.raises(ValueError, match="never read|zero_fill"):
        reverse_port(tree, shapes, "RawNet3", porter_args(model_scale=8))

    sd1 = reverse_port(tree, shapes, "RawNet3", porter_args(model_scale=8),
                       allow_zero_fill=True)
    key = [k for k in sd0 if k.endswith("flipped_filter")][0]
    np.testing.assert_array_equal(sd1[key], sd0[key].numpy())


@pytest.mark.slow
def test_reverse_cli_roundtrip(tmp_path, small_ref_ecapa):
    """CLI: msgpack + --like reference ckpt → state_dict.pt that the
    reference model loads strict (subprocess, the user-facing path)."""
    import subprocess

    import torch
    from flax import serialization as fser

    from speakerverification_tpu.compat.torch_port import (
        ecapa_from_torch_state_dict,
    )

    sd0 = small_ref_ecapa.state_dict()
    torch.save(sd0, tmp_path / "ref.pt")
    params, stats = ecapa_from_torch_state_dict(sd0, n_blocks=4,
                                                res2net_scale=4)
    (tmp_path / "ours.msgpack").write_bytes(fser.msgpack_serialize(
        {"params": {"backbone": params}, "batch_stats": {"backbone": stats}}))

    r = subprocess.run(
        [sys.executable, "-m", "speakerverification_tpu.compat.torch_export",
         "--arch", "ECAPA_TDNN", "--res2net_scale", "4",
         "--input", str(tmp_path / "ours.msgpack"),
         "--like", str(tmp_path / "ref.pt"),
         "--output", str(tmp_path / "out.pt")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sd1 = torch.load(tmp_path / "out.pt", map_location="cpu",
                     weights_only=True)
    small_ref_ecapa.load_state_dict(sd1, strict=True)
