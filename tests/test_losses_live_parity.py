"""Live-torch parity for the whole loss zoo (VERDICT r2 item #1).

Drives every importable reference loss class in /root/reference/src/losses
on CPU torch with identical inputs and (where the head has parameters)
identical ported weights, and compares ``(loss, prec1)`` against our
registered heads. Where the reference file is broken as shipped, the
breakage itself is asserted so the divergence is pinned, not assumed:

* ``AngularPenaltySMLoss`` — NameError at construction (undefined ``s``,
  AngularPenaltySMLoss.py:23) and a dead ``costh_m`` tail in forward.
* ``MP``                   — NameError at construction (undefined
  ``n_classes``, MP.py:17).
* ``MMP``                  — constructs, but ``pre_process`` +
  ``l2_norm`` cannot consume either the grouped [B,n,D] or the flat
  [B*n,D] convention without crashing (MMP.py:41-57, mpa_utils.py:26-43).
* ``MultiSimilarity_v2`` / ``MSAmSoftmax`` — un-importable: relative
  import of a vendored ``pytorch_metric_learning`` package that does not
  exist in the tree (MultiSimilarity_v2.py:6).
* ``MSSoftmax``            — the class is misnamed ``MSSofmaxLoss``, so
  the reference's dynamic loader cannot resolve it (model.py:82-83);
  the class itself is driven here directly.
* ``adasoftmax_v1/v2``     — no class matches the module name, so the
  loader fails; the AdaptiveSoftmax+AdaptiveLoss pair is driven directly.

prec1 divergences (documented, not asserted equal): TripletLoss returns
a threshold-tuning EER as "prec1" (TripletLoss.py:56); MultiSimilarity
returns ``accuracy(sim_mat.view(-1,B))`` over raw similarities
(MultiSimilarity.py:78-80); CircleLoss/V2 return a bare loss with no
precision at all. Our heads return a nearest-neighbor top-1 instead.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.losses import build_loss

D, C, B = 16, 10, 10

RNG = np.random.default_rng(7)
_protos = RNG.normal(0, 1.0, (B, 1, D)).astype(np.float32)
X3 = (_protos + 0.35 * RNG.normal(0, 1.0, (B, 2, D))).astype(np.float32)
X3M = (_protos[:6] + 0.35 * RNG.normal(0, 1.0, (6, 3, D))).astype(np.float32)
LBL_U = np.arange(B, dtype=np.int64)              # unique (speaker-balanced)
LBL_R = RNG.integers(0, C, B).astype(np.int64)    # random class ids
X2 = X3.reshape(-1, D)                            # flat [2B, D]
LBL2 = np.repeat(LBL_R, 2)


@pytest.fixture(scope="module")
def ref_losses():
    """Import path + dep stubs + CPU shims for the reference loss files.

    The reference hard-codes ``.cuda()`` / ``.to(x.get_device())`` moves
    (e.g. AngularProto.py:40, MMP_Balance.py:53); on CPU these are
    device no-ops, shimmed so the math can run unchanged.
    """
    from test_torch_parity import _install_asteroid_stub
    _install_asteroid_stub()
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import torch
    import utils as ref_utils                     # reference src/utils.py

    acc_mod = types.ModuleType("accuracy")        # ProxyNCA.py:9 imports it
    acc_mod.accuracy = ref_utils.accuracy
    sys.modules.setdefault("accuracy", acc_mod)

    orig_cuda = torch.Tensor.cuda
    orig_getdev = torch.Tensor.get_device
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.get_device = lambda self: torch.device("cpu")
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.get_device = orig_getdev


def _replace(params, overrides):
    """Replace leaves whose path ends with the override key's components."""
    used = set()

    def sub(path, leaf):
        comps = tuple(k.key for k in path)
        for key, val in overrides.items():
            want = tuple(key.split("/"))
            if comps[-len(want):] == want:
                used.add(key)
                assert leaf.shape == val.shape, (key, leaf.shape, val.shape)
                return jnp.asarray(val)
        return leaf

    out = jax.tree_util.tree_map_with_path(sub, params)
    assert used == set(overrides), f"unused overrides: {set(overrides) - used}"
    return out


def _ours(name, x, label, overrides=None, **kw):
    mod = build_loss(name, nOut=D, nClasses=C, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "mining": jax.random.PRNGKey(1)}
    lbl = None if label is None else jnp.asarray(label)
    variables = mod.init(rngs, jnp.asarray(x), lbl)
    params = _replace(variables.get("params", {}), overrides or {})
    loss, prec = mod.apply({"params": params} if params else {},
                           jnp.asarray(x), lbl,
                           rngs={"mining": jax.random.PRNGKey(2)})
    return float(loss), float(prec)


def _t(a):
    import torch
    return torch.from_numpy(np.asarray(a))


def _close(ours, ref, rtol=2e-4, atol=2e-3):
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# classification margin family
# ---------------------------------------------------------------------------

def test_softmax_live(ref_losses):
    import torch
    from losses.Softmax import Softmax as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X2), _t(LBL2))
    ol, op = _ours("Softmax", X2, LBL2, {
        "Dense_0/kernel": ref.fc.weight.detach().numpy().T,
        "Dense_0/bias": ref.fc.bias.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


def test_amsoftmax_live(ref_losses):
    import torch
    from losses.AmSoftmax import AmSoftmax as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C, margin=0.15, scale=20)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))           # 3-D path incl. reshape
    ol, op = _ours("AmSoftmax", X3, LBL_R,
                   {"W": ref.W.detach().numpy()}, margin=0.15, scale=20)
    _close(ol, rl.item())
    _close(op, rp.item())


def test_aamsoftmax_live(ref_losses):
    import torch
    from losses.AAmSoftmax import AAmSoftmax as Ref
    torch.manual_seed(0)
    for easy in (False, True):
        ref = Ref(nOut=D, nClasses=C, margin=0.3, scale=15, easy_margin=easy)
        with torch.no_grad():
            rl, rp = ref(_t(X3), _t(LBL_R))
        ol, op = _ours("AAmSoftmax", X3, LBL_R,
                       {"weight": ref.weight.detach().numpy()},
                       margin=0.3, scale=15, easy_margin=easy)
        _close(ol, rl.item())
        _close(op, rp.item())


def test_armsoftmax_live(ref_losses):
    import torch
    from losses.ARmSoftmax import ARmSoftmax as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C, margin=0.1, scale=30)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))
    ol, op = _ours("ARmSoftmax", X3, LBL_R, {"W": ref.W.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


# ---------------------------------------------------------------------------
# metric / prototypical family (no learnable weights beyond w, b constants)
# ---------------------------------------------------------------------------

def test_angularproto_live(ref_losses):
    import torch
    from losses.AngularProto import AngularProto as Ref
    ref = Ref(init_w=10.0, init_b=-5.0)
    with torch.no_grad():
        rl, rp = ref(_t(X3), None)
    ol, op = _ours("AngularProto", X3, None)
    _close(ol, rl.item())
    _close(op, rp.item())


class _dim1_pairwise_distance:
    """Contemporary-torch shim: the reference's ``unsqueeze(-1)`` /
    ``transpose(0,2)`` all-pairs trick (Prototypical.py:35-36,
    TripletLoss.py:34-35) was written for the era when
    ``F.pairwise_distance`` reduced over dim=1 — the same convention
    ``F.cosine_similarity`` still defaults to, which is why AngularProto
    works unchanged. torch>=2 reduces over dim=-1, so those two files
    produce [B, D] pseudo-logits on modern torch (asserted in
    test_reference_prototypical_axis_skew). This shim restores the
    intended dim=1 semantics so the math can be compared live."""

    def __init__(self):
        import torch
        self._torch = torch
        self._orig = torch.nn.functional.pairwise_distance

    def __enter__(self):
        F = self._torch.nn.functional

        def pd(x1, x2, p=2.0, eps=1e-6, keepdim=False):
            d = x1 - x2 + eps
            dim = 1 if d.ndim > 2 else -1
            return self._torch.linalg.vector_norm(d, ord=p, dim=dim,
                                                  keepdim=keepdim)
        F.pairwise_distance = pd
        return self

    def __exit__(self, *exc):
        self._torch.nn.functional.pairwise_distance = self._orig


def test_prototypical_live(ref_losses):
    import torch
    from losses.Prototypical import Prototypical as Ref
    ref = Ref()
    with torch.no_grad(), _dim1_pairwise_distance():
        rl, rp = ref(_t(X3), None)
    ol, op = _ours("Prototypical", X3, None)
    _close(ol, rl.item(), atol=5e-3)   # F.pairwise_distance eps=1e-6 offset
    _close(op, rp.item())


def test_reference_prototypical_axis_skew(ref_losses):
    """On stock torch>=2 the reference's all-pairs distance reduces over
    the wrong axis, yielding [B, D]-shaped logits — pinned here so the
    shim above stays an honest reconstruction, not a fudge."""
    import torch
    import torch.nn.functional as F
    a = torch.randn(4, 8)
    out = F.pairwise_distance(a.unsqueeze(-1), a.unsqueeze(-1).transpose(0, 2))
    assert out.shape == (4, 8)        # speakers × feature-dims, not B × B


@pytest.mark.parametrize("method", ["softmax", "contrast"])
def test_ge2e_v1_live(ref_losses, method):
    import torch
    from losses.GE2ELoss import GE2ELoss as Ref
    ref = Ref(init_w=10.0, init_b=-5.0, loss_method=method)
    with torch.no_grad():
        rl = ref(_t(X3M))                          # v1 returns a bare sum
    ol, _ = _ours("GE2ELoss", X3M, None, loss_method=method)
    _close(ol, rl.item(), rtol=5e-4)


@pytest.mark.parametrize("method", ["softmax", "contrast"])
def test_ge2e_v2_live(ref_losses, method):
    import torch
    from losses.GE2ELossV2 import GE2ELossV2 as Ref
    ref = Ref(init_w=10.0, init_b=-5.0, loss_method=method)
    with torch.no_grad():
        rl, rp = ref(_t(X3M), None)
    ol, op = _ours("GE2ELossV2", X3M, None, loss_method=method)
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


def test_ge2e_fusion_live(ref_losses):
    import torch
    from losses.GE2ELoss_fusion import GE2ELoss_fusion as Ref
    ref = Ref()
    with torch.no_grad():
        rl, rp = ref(_t(X3M), None)
    ol, op = _ours("GE2ELoss_fusion", X3M, None)
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


def test_triplet_live_deterministic_mining(ref_losses):
    """hard_prob=1, hard_rank=0 ⇒ the reference's random.choice paths are
    never taken and mining is deterministic (TripletLoss.py:77-93).

    The reference's prec path is broken as shipped: it indexes the dict
    returned by utils.tuneThresholdfromScore with ``[1]``
    (TripletLoss.py:54-56 vs utils.py:74-121) — asserted below, then the
    lookup is shimmed so the loss math can be driven live."""
    import torch
    import losses.TripletLoss as mod
    ref = mod.TripletLoss(hard_rank=0, hard_prob=1.0, margin=0.2)
    with torch.no_grad():
        with pytest.raises(KeyError):             # errors[1] on a dict
            ref(_t(X3), None)
        orig = mod.tuneThresholdfromScore
        mod.tuneThresholdfromScore = lambda s, l, t: {1: 0.0}
        try:
            with _dim1_pairwise_distance():       # see shim docstring
                rl, _ = ref(_t(X3), None)
        finally:
            mod.tuneThresholdfromScore = orig
    ol, _ = _ours("TripletLoss", X3, None, hard_rank=0, hard_prob=1.0,
                  margin=0.2)
    _close(ol, rl.item(), atol=5e-3)


# ---------------------------------------------------------------------------
# pair-similarity family
# ---------------------------------------------------------------------------

def test_circle_live(ref_losses):
    import torch
    from losses.CircleLoss import CircleLoss as Ref
    ref = Ref(m=0.25, gamma=64)
    with torch.no_grad():
        rl = ref(_t(X3), _t(LBL_U))               # returns a bare loss
    ol, _ = _ours("CircleLoss", X3, LBL_U, m=0.25, gamma=64)
    _close(ol, rl.item(), rtol=5e-4)


def test_circle_v2_live(ref_losses):
    import torch
    from losses.CircleLossV2 import CircleLossV2 as Ref
    ref = Ref(scale=16, margin=0.25)
    with torch.no_grad():
        rl = ref(_t(X3), _t(LBL_U))
    ol, _ = _ours("CircleLossV2", X3, LBL_U, scale=16, margin=0.25)
    _close(ol, rl.item(), rtol=5e-4)


def test_multisimilarity_live(ref_losses):
    """Loss parity only — the reference's prec is
    ``accuracy(sim_mat.view(-1, B))``, a different statistic by design."""
    import torch
    from losses.MultiSimilarity import MultiSimilarity as Ref
    ref = Ref(margin=0.1)
    with torch.no_grad():
        rl, _ = ref(_t(X3), _t(LBL_U))
    ol, _ = _ours("MultiSimilarity", X3, LBL_U)
    _close(ol, rl.item(), rtol=5e-4)


def test_mssoftmax_live(ref_losses):
    """The class is misnamed MSSofmaxLoss so the reference's own loader
    (model.py:82-83) cannot construct it — assert that, then drive the
    class directly."""
    import importlib
    import torch
    mod = importlib.import_module("losses.MSSoftmax")
    assert not hasattr(mod, "MSSoftmax")          # the loader's lookup fails
    torch.manual_seed(0)
    ref = mod.MSSofmaxLoss(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_U))
    ol, op = _ours("MSSoftmax", X3, LBL_U, {
        "Dense_0/kernel": ref.softmax.fc.weight.detach().numpy().T,
        "Dense_0/bias": ref.softmax.fc.bias.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


# ---------------------------------------------------------------------------
# proxy family
# ---------------------------------------------------------------------------

def test_proxy_anchor_live(ref_losses):
    import torch
    from losses.ProxyAnchor import ProxyAnchor as Ref
    torch.manual_seed(0)
    ref = Ref(n_classes=C, sz_embed=D, mrg=0.1, alpha=30)
    with torch.no_grad():
        rl, _ = ref(_t(X2), _t(LBL2))
    ol, _ = _ours("ProxyAnchor", X2, LBL2,
                  {"proxies": ref.proxies.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)


def test_proxy_nca_live(ref_losses):
    import torch
    from losses.ProxyNCA import ProxyNCA as Ref
    torch.manual_seed(0)
    ref = Ref(n_classes=C, sz_embedding=D)
    with torch.no_grad():
        rl, _ = ref(_t(X2), _t(LBL2))
    ol, _ = _ours("ProxyNCA", X2, LBL2,
                  {"proxies": ref.proxies.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)


def test_mp_balance_live(ref_losses):
    import torch
    from losses.MP_Balance import MP_Balance as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_U))
    ol, op = _ours("MP_Balance", X3, LBL_U,
                   {"proxies": ref.proxies.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


# The MMP family exponentiates UNNORMALIZED query·center products scaled
# by w=10 (MMP_Balance.py:60-66); on wide-spread embeddings float32
# ``z.sum() - diag(z)`` cancels catastrophically and the result depends
# on summation order, not math. Scaled-down inputs keep the comparison in
# the numerically meaningful regime.
X3S = (0.25 * X3).astype(np.float32)


def test_mmp_balance_live(ref_losses):
    import torch
    from losses.MMP_Balance import MMP_Balance as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3S), _t(LBL_U))
    ol, op = _ours("MMP_Balance", X3S, LBL_U,
                   {"proxies": ref.proxies.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


def test_mmp_balance_mtl_live(ref_losses):
    import torch
    from losses.MMP_Balance_MTL import MMP_Balance_MTL as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3S), _t(LBL_U))
    ol, op = _ours("MMP_Balance_MTL", X3S, LBL_U, {
        "AmSoftmax_0/W": ref.amsoftmax.W.detach().numpy(),
        "MMP_0/proxies": ref.mmp_balance.proxies.detach().numpy()})
    _close(ol, rl.item(), rtol=5e-4)
    _close(op, rp.item())


# ---------------------------------------------------------------------------
# combined heads
# ---------------------------------------------------------------------------

def test_softmax_angularproto_live(ref_losses):
    import torch
    from losses.SoftmaxAngularProto import SoftmaxAngularProto as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))
    ol, op = _ours("SoftmaxAngularProto", X3, LBL_R, {
        "Dense_0/kernel": ref.softmax.fc.weight.detach().numpy().T,
        "Dense_0/bias": ref.softmax.fc.bias.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


def test_amsoftmax_proto_live(ref_losses):
    import torch
    from losses.AmSoftmaxProto import AmSoftmaxProto as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))
    ol, op = _ours("AmSoftmaxProto", X3, LBL_R,
                   {"W": ref.amsoftmax.W.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


def test_aamsoftmax_proto_live(ref_losses):
    import torch
    from losses.AAmSoftmaxProto import AAmSoftmaxProto as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))
    ol, op = _ours("AAmSoftmaxProto", X3, LBL_R,
                   {"weight": ref.aamsoftmax.weight.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


def test_aamsoftmax_ap_live(ref_losses):
    import torch
    from losses.AAmSoftmaxAP import AAmSoftmaxAP as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with torch.no_grad():
        rl, rp = ref(_t(X3), _t(LBL_R))
    ol, op = _ours("AAmSoftmaxAP", X3, LBL_R, {
        "AAmSoftmax_0/weight": ref.aamsoftmax.weight.detach().numpy(),
        "Softmax_0/Dense_0/kernel": ref.softmax.fc.weight.detach().numpy().T,
        "Softmax_0/Dense_0/bias": ref.softmax.fc.bias.detach().numpy()})
    _close(ol, rl.item())
    _close(op, rp.item())


# ---------------------------------------------------------------------------
# adaptive softmax (driven directly: no class matches the module name, so
# the reference loader itself cannot build these — asserted below)
# ---------------------------------------------------------------------------

# targets spanning head bucket [0,4) and tail bucket [4,10), one per X2 row
ADA_TGT = np.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 9] * 2, np.int64)


def test_adasoftmax_v1_live(ref_losses):
    import importlib
    import torch
    mod = importlib.import_module("losses.adasoftmax_v1")
    assert not hasattr(mod, "adasoftmax_v1")      # loader lookup fails
    torch.manual_seed(0)
    asm = mod.AdaptiveSoftmax(D, [4, C])
    crit = mod.AdaptiveLoss([4, C])
    tgt = ADA_TGT
    x = X2
    with torch.no_grad():
        out = asm(_t(x), _t(tgt))
        rl = crit(out, _t(tgt))
    sd = {k: v.detach().numpy() for k, v in asm.state_dict().items()}
    ol, _ = _ours("adasoftmax_v1", x, tgt, {
        "head/kernel": sd["head.weight"].T,
        "head/bias": sd["head.bias"],
        "tail0_proj/kernel": sd["tail.0.0.weight"].T,
        "tail0_out/kernel": sd["tail.0.1.weight"].T,
        "tail0_out/bias": sd["tail.0.1.bias"],
    }, cutoff=(4, C))
    _close(ol, rl.item(), rtol=5e-4)


def test_adasoftmax_v2_live(ref_losses):
    import importlib
    import torch
    mod = importlib.import_module("losses.adasoftmax_v2")
    assert not hasattr(mod, "adasoftmax_v2")
    torch.manual_seed(0)
    asm = mod.AdaptiveSoftmax(D, [4, C])
    crit = mod.AdaptiveLoss([4, C])
    tgt = ADA_TGT
    x = X2
    asm.set_target(_t(tgt))
    with torch.no_grad():
        out = asm(_t(x))
        rl = crit(out, _t(tgt))
    sd = {k: v.detach().numpy() for k, v in asm.state_dict().items()}
    ol, _ = _ours("adasoftmax_v2", x, tgt, {
        "head/kernel": sd["head.weight"].T,
        "head/bias": sd["head.bias"],
        "tail0_proj/kernel": sd["tail.0.0.weight"].T,
        "tail0_out/kernel": sd["tail.0.1.weight"].T,
    }, cutoff=(4, C))
    _close(ol, rl.item(), rtol=5e-4)


# ---------------------------------------------------------------------------
# reference-side breakage, asserted so the divergences stay documented facts
# ---------------------------------------------------------------------------

def test_reference_angular_penalty_is_broken(ref_losses):
    from losses.AngularPenaltySMLoss import AngularPenaltySMLoss as Ref
    with pytest.raises(NameError):                # undefined 's' (line 23)
        Ref(nOut=D, nClasses=C)


def test_reference_mp_is_broken(ref_losses):
    from losses.MP import MP as Ref
    with pytest.raises(NameError):                # undefined 'n_classes'
        Ref(nOut=D, nClasses=C)


def test_reference_mmp_is_broken(ref_losses):
    """MMP cannot consume the trainer's grouped [B,n,D] convention:
    ``pre_process`` (mpa_utils.py:34-43) stacks one [n,D] block per
    speaker, whose empty-slice centroid then crashes ``l2_norm``'s
    reshape (mpa_utils.py:26-32). Flat [B*n,D] input only "runs" by
    accident — ``set()`` over 0-d torch tensors hashes by object
    identity, so every row becomes its own group and speakers are
    duplicated as separate classes."""
    import torch
    from losses.MMP import MMP as Ref
    torch.manual_seed(0)
    ref = Ref(nOut=D, nClasses=C)
    with pytest.raises((RuntimeError, ValueError, IndexError)):
        ref(_t(X3), _t(LBL_U))                    # grouped convention


def test_reference_ms_v2_family_is_unimportable(ref_losses):
    import importlib
    for name in ("losses.MultiSimilarity_v2", "losses.MSAmSoftmax"):
        sys.modules.pop(name, None)
        with pytest.raises(ImportError):
            importlib.import_module(name)
