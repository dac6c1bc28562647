"""One-command checkpoint conversion works across model FAMILIES.

VERDICT r3 item 7: `compat/torch_port.py` has porter functions for 25
architectures, but only the ECAPA path of the user-facing CLI was
exercised end-to-end (tests/test_torch_parity.py:
test_checkpoint_converter_cli). These tests run the documented
one-liner

    python -m speakerverification_tpu.compat.torch_port \
        --arch <name> --input ref.pt --output out.msgpack

for six families spanning the zoo's major branches — mel-trunk CNN
(ResNetSE34, SCnet), raw-waveform (RawNet3, RawNet2, RawNeXt) and
depthwise-separable (TitaNet, incl. the mega-block auto-detection the
CLI relies on) — against REAL reference-format state dicts
(``module.__S__.``/``__L__.`` prefixes, src/model.py:24-33,104) and
assert the artifact equals the direct porter output leaf-for-leaf and
carries the ported loss-head centers.

Numeric forward correctness of each porter is proven separately by
tests/test_torch_parity.py; these tests pin the CLI *dispatch* layer:
arch routing, prefix stripping, head porting, msgpack layout.
"""

import os
import subprocess
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EMB = 48


def _ref_path():
    for name in ("torchaudio", "nnAudio", "nnAudio.features"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")


def _mel_kwargs(n_mels):
    return dict(n_mels=n_mels, augment=False,
                augment_options={"augment_chain": []}, features="raw")


def _build_resnetse34():
    import torch
    _ref_path()
    from models import ResNetSE34 as Ref
    torch.manual_seed(0)
    net = Ref.MainModel(nOut=EMB, **_mel_kwargs(40))
    from speakerverification_tpu.compat.torch_port import (
        resnetse_from_torch_state_dict,
    )
    return net.state_dict(), [], lambda sd: resnetse_from_torch_state_dict(sd)


def _build_scnet():
    import torch
    _ref_path()
    from models import SCnet as Ref
    torch.manual_seed(1)
    net = Ref.MainModel(nOut=EMB, **_mel_kwargs(32))
    from speakerverification_tpu.compat.torch_port import (
        scnet_from_torch_state_dict,
    )
    return net.state_dict(), [], lambda sd: scnet_from_torch_state_dict(sd)


def _build_rawnet3():
    import torch
    from test_torch_parity import _install_asteroid_stub
    _install_asteroid_stub()
    _ref_path()
    from models import RawNet3 as Ref
    torch.manual_seed(2)
    net = Ref.MainModel(nOut=EMB, model_scale=4, C=128, sinc_stride=10,
                        context=True, summed=True, out_bn=False,
                        log_sinc=True, norm_sinc="mean", encoder_type="ASP")
    from speakerverification_tpu.compat.torch_port import (
        rawnet3_from_torch_state_dict,
    )
    return (net.state_dict(), ["--model_scale", "4"],
            lambda sd: rawnet3_from_torch_state_dict(sd, model_scale=4))


def _build_rawnet2():
    import torch
    _ref_path()
    from models import RawNet_baseline as Ref
    torch.manual_seed(3)
    net = Ref.MainModel(nOut=400, sample_rate=16000, max_frames=100,
                        nb_fc_node=EMB)
    from speakerverification_tpu.compat.torch_port import (
        rawnet2_from_torch_state_dict,
    )
    return net.state_dict(), [], lambda sd: rawnet2_from_torch_state_dict(sd)


def _build_titanet():
    # small config; the CLI passes n_mega_blocks=None so the porter's
    # depth auto-detection must find the 2 mega blocks from the sd
    import torch
    _ref_path()
    from models.TitaNet import TitaNet as Ref
    torch.manual_seed(4)
    net = Ref(n_mels=32, n_mega_blocks=2, n_sub_blocks=3,
              encoder_hidden_size=48, encoder_output_size=96,
              embedding_size=24, mega_block_kernel_size=3,
              attention_hidden_size=16, dropout=0.0)
    from speakerverification_tpu.compat.torch_port import (
        titanet_from_torch_state_dict,
    )
    return (net.state_dict(), [],
            lambda sd: titanet_from_torch_state_dict(sd, n_mega_blocks=None))


def _build_rawnext():
    import torch
    _ref_path()
    from models import RawNeXt as Ref
    torch.manual_seed(5)
    net = Ref.MainModel(nOut=EMB)
    from speakerverification_tpu.compat.torch_port import (
        rawnext_from_torch_state_dict,
    )
    return net.state_dict(), [], lambda sd: rawnext_from_torch_state_dict(sd)


FAMILIES = {
    "ResNetSE34": _build_resnetse34,
    "SCnet": _build_scnet,
    "RawNet3": _build_rawnet3,
    "RawNet2": _build_rawnet2,
    "TitaNet": _build_titanet,
    "RawNeXt": _build_rawnext,
}


@pytest.mark.slow
@pytest.mark.parametrize("arch", sorted(FAMILIES))
def test_converter_cli_family(arch, tmp_path):
    import jax
    import torch
    from flax import serialization as fser

    sd_plain, extra, direct = FAMILIES[arch]()

    # reference training-checkpoint format: DDP "module." + encoder
    # "__S__." prefixes, margin head centers under "__L__.weight"
    sd = {f"module.__S__.{k}": v for k, v in sd_plain.items()}
    torch.manual_seed(99)
    head = torch.randn(10, EMB)
    sd["module.__L__.weight"] = head

    pt = tmp_path / "best_state.pt"
    torch.save(sd, pt)
    out = tmp_path / "ported.msgpack"

    r = subprocess.run(
        [sys.executable, "-m", "speakerverification_tpu.compat.torch_port",
         "--arch", arch, "--input", str(pt), "--output", str(out), *extra],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert out.exists()
    assert "loss head ported" in r.stdout

    tree = fser.msgpack_restore(out.read_bytes())
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["loss"]["weight"]), head.numpy())

    want_params, want_stats = direct(sd_plain)
    for got_tree, want_tree, kind in (
            (tree["params"]["backbone"], want_params, "params"),
            (tree["batch_stats"]["backbone"], want_stats, "batch_stats")):
        got = jax.tree_util.tree_flatten_with_path(got_tree)[0]
        want = jax.tree_util.tree_flatten_with_path(want_tree)[0]
        assert len(got) == len(want), (kind, len(got), len(want))
        for (pg, vg), (pw, vw) in zip(got, want):
            assert jax.tree_util.keystr(pg) == jax.tree_util.keystr(pw)
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(vw),
                                          err_msg=f"{kind} {pg}")
