"""Live-torch parity for the scheduler/callback zoo.

Same program as the loss/optimizer/metrics live harnesses: import the
reference's own callback factories (src/callbacks/torch_callbacks.py —
pure torch+numpy, no stubs needed) and step REAL torch schedulers
alongside our closed-form schedules over identical tick sequences.

LR convention: both trainers read the LR *before* stepping the
scheduler at the end of tick t, so torch's sequence is
``[group lr after t step() calls]`` and ours is ``sched(t)``.

Documented divergences (asserted, not skipped):

* ``cosine_annealinglr_cus`` plugs an ABSOLUTE lr value into LambdaLR,
  which multiplies it by the base lr — lr² scaling
  (torch_callbacks.py:5-18). We return the absolute annealed value;
  the reference's sequence equals ours × lr exactly.
* ``EarlyStopping`` in the reference never resets its counter on
  improvement (earlyStopping.py:23-34) — the trainer resets it
  externally on a new best (trainer.py:158-160). Ours resets
  internally; the test asserts both the raw-class divergence and the
  net-effect equivalence under the trainer's reset protocol.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from speakerverification_tpu.optim.schedulers import (  # noqa: E402
    EarlyStopping,
    ReduceOnPlateau,
    build_scheduler,
)

LR = 1e-3
N = 45


@pytest.fixture(scope="module")
def ref_callbacks():
    """Import the reference factories with a torch-version shim: this
    torch removed the long-deprecated ``verbose`` scheduler kwarg that
    the reference passes (torch_callbacks.py:22,28,58) — strip it so the
    reference code runs unchanged otherwise."""
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")

    import functools

    lrs = torch.optim.lr_scheduler
    patched = {}
    for cls_name in ("CosineAnnealingLR", "CosineAnnealingWarmRestarts",
                     "CyclicLR", "ReduceLROnPlateau", "LambdaLR"):
        orig = getattr(lrs, cls_name)
        patched[cls_name] = orig

        def make(orig):
            @functools.wraps(orig)
            def ctor(*a, **k):
                k.pop("verbose", None)
                return orig(*a, **k)
            return ctor

        setattr(lrs, cls_name, make(orig))
    try:
        from callbacks import torch_callbacks as m
        yield m
    finally:
        for cls_name, orig in patched.items():
            setattr(lrs, cls_name, orig)


def _torch_lr_sequence(sched, opt, n=N):
    lrs = []
    for _ in range(n):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()                      # silence the torch order warning
        sched.step()
    return np.asarray(lrs)


def _opt():
    p = torch.nn.Parameter(torch.zeros(1))
    return torch.optim.SGD([p], lr=LR)


@pytest.mark.parametrize("name,kwargs", [
    ("steplr", dict(step_size=4, lr_decay=0.5)),
    ("cosine_annealinglr_pt", dict(T_max=12, eta_min=1e-6)),
    ("cosine_annealing_warm_restarts", dict(T_max=8, T_mult=1, eta_min=0.0)),
    ("cosine_annealing_warm_restarts", dict(T_max=6, T_mult=2, eta_min=1e-5)),
    ("cycliclr", dict(base_lr=1e-8, max_lr=1e-3, T_max=10,
                      mode="triangular2")),
    ("cycliclr", dict(base_lr=1e-8, max_lr=1e-3, T_max=10,
                      mode="triangular")),
    ("cycliclr", dict(base_lr=1e-8, max_lr=1e-3, T_max=10,
                      mode="exp_range", gamma=0.99)),
])
def test_schedule_live_parity(ref_callbacks, name, kwargs):
    opt = _opt()
    ref_kwargs = dict(kwargs)
    if name == "steplr":
        torch_sched, unit_ref = ref_callbacks.steplr(opt, **ref_kwargs)
    else:
        torch_sched, unit_ref = getattr(ref_callbacks, name)(opt, **ref_kwargs)
    ref_lrs = _torch_lr_sequence(torch_sched, opt)

    ours, unit = build_scheduler(name, LR, **kwargs)
    assert unit == unit_ref
    our_lrs = np.asarray([ours(t) for t in range(N)])
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-9, atol=1e-12)


def test_cosine_cus_divergence_is_lr_squared(ref_callbacks):
    """The reference's cosine_annealinglr_cus returns base_lr × (absolute
    annealed lr) — the LambdaLR factor bug. Ours is the absolute value;
    reference == ours × LR exactly."""
    opt = _opt()
    torch_sched, unit_ref = ref_callbacks.cosine_annealinglr_cus(
        opt, T_max=12, lr_min=1e-6, lr=LR)
    ref_lrs = _torch_lr_sequence(torch_sched, opt)

    ours, unit = build_scheduler("cosine_annealinglr_cus", LR,
                                 T_max=12, lr_min=1e-6)
    assert unit == unit_ref
    our_lrs = np.asarray([ours(t) for t in range(N)])
    # within the annealing window the reference is exactly ours × lr
    np.testing.assert_allclose(our_lrs[:13] * LR, ref_lrs[:13], rtol=1e-9)
    assert our_lrs[0] == pytest.approx(LR)          # ours starts at lr
    assert ref_lrs[0] == pytest.approx(LR * LR)     # reference at lr²
    # second documented divergence: past T_max the reference's unclamped
    # cos(t/T_max·π) swings the lr back UP toward lr_max (a bug for a
    # "total steps" parameter); ours clamps at lr_min
    assert ref_lrs[24] == pytest.approx(LR * LR, rel=1e-6)  # back at max
    np.testing.assert_allclose(our_lrs[12:], 1e-6, rtol=1e-9)


def test_reduce_on_plateau_live_parity(ref_callbacks):
    """Drive torch's ReduceLROnPlateau (via the reference's LRScheduler
    wrapper) and ours with one loss trace; LR sequences must match.
    torch reduces when num_bad > patience, same as ours.
    (ref_callbacks keeps the verbose-kwarg shim active — the wrapper
    passes verbose=True, reduceOnPlateau.py:31.)"""
    from callbacks.reduceOnPlateau import LRScheduler as RefPlateau

    opt = _opt()
    ref = RefPlateau(opt, patience=2, min_lr=1e-6, factor=0.5)
    ours = ReduceOnPlateau(LR, patience=2, min_lr=1e-6, factor=0.5)

    rng = np.random.default_rng(3)
    # plateaus then improvements then a long plateau hitting min_lr
    losses = np.concatenate([
        np.linspace(1.0, 0.5, 5),                    # improving
        np.full(6, 0.5),                             # plateau → reduce
        np.linspace(0.49, 0.3, 4),                   # improving again
        np.full(30, 0.3) + rng.uniform(0, 1e-9, 30), # long near-plateau
    ])
    ref_lrs, our_lrs = [], []
    for v in losses:
        ref(float(v))
        ref_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(ours(float(v)))
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-12)


def test_early_stopping_net_effect_parity():
    """Raw classes diverge (reference never resets its counter on
    improvement); under the trainer's protocol — which resets the
    counter on every new best (src/trainer.py:158-160) — stop epochs
    must coincide."""
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from callbacks.earlyStopping import EarlyStopping as RefES

    losses = [1.0, 0.9, 0.95, 0.94, 0.8, 0.85, 0.86, 0.87, 0.88, 0.89]

    # raw-class divergence: the reference counter keeps climbing across
    # the 0.8 improvement (its counter is 2 by then), ours resets
    ref_raw, ours_raw = RefES(patience=4), EarlyStopping(patience=4)
    ref_stop = our_stop = None
    for i, v in enumerate(losses):
        ref_raw(v)
        if ref_raw.early_stop and ref_stop is None:
            ref_stop = i
        if ours_raw(v) and our_stop is None:
            our_stop = i
    # reference: counter survives the 0.8 improvement at i=4 (it was 2),
    # reaching patience at i=6; ours resets there and stops at i=8
    assert ref_stop == 6 and our_stop == 8   # documented divergence

    # trainer protocol: counter reset on new best on BOTH sides
    ref_tr, ours_tr = RefES(patience=4), EarlyStopping(patience=4)
    stops = []
    for es in (ref_tr, ours_tr):
        best, stop = np.inf, None
        for i, v in enumerate(losses):
            es(v)
            if v < best:
                best = v
                es.counter = 0           # src/trainer.py:158-160
                es.early_stop = False
            if es.early_stop and stop is None:
                stop = i
        stops.append(stop)
    assert stops[0] == stops[1] == 8
