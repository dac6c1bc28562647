"""The multi-chip dryrun gate must never depend on accelerator health.

Round-3 post-mortem: the driver's ``dryrun_multichip`` artifact went red
because an eager op escaped to the tunneled TPU client during a rolling
libtpu upgrade — a backend the virtual-CPU dryrun never needed.
These tests pin the contract:

* ``_pin_cpu_backend`` forces the CPU platform + virtual device count
  before JAX initializes anything, even when the ambient environment
  points at a broken/unavailable accelerator platform;
* the FULL dryrun succeeds with the accelerator platform made
  unavailable (``JAX_PLATFORMS=nonexistent``) and the subprocess retry
  disabled — i.e. the primary path itself never touches it;
* when a foreign backend was already initialized in-process, the gate
  still goes green via its one clean-subprocess retry.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict, timeout: int = 560):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout)


def test_pin_cpu_backend_overrides_broken_platform():
    """Pinning wins over an ambient JAX_PLATFORMS naming an unavailable
    platform, and provisions the virtual device count."""
    r = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g._pin_cpu_backend(4)\n"
        "import jax\n"
        "ds = jax.devices()\n"
        "assert all(d.platform == 'cpu' for d in ds), ds\n"
        "assert len(ds) >= 4, ds\n"
        "print('PIN-OK', len(ds))\n" % REPO,
        {"JAX_PLATFORMS": "nonexistent", "XLA_FLAGS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PIN-OK" in r.stdout


@pytest.mark.slow
def test_dryrun_succeeds_with_accelerator_unavailable():
    """VERDICT r3 item 1: the dryrun path itself (retry disabled) runs
    green when the accelerator platform cannot initialize at all.

    Slow tier (r5 cold-suite budget): this subprocess re-compiles the
    full 5-phase dryrun (~40 s); the CPU-pin MECHANISM it relies on
    stays default-tier in test_pin_cpu_backend_overrides_broken_platform,
    and the dryrun itself is executed by the driver gate every round."""
    r = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(2)\n" % REPO,
        {"JAX_PLATFORMS": "nonexistent", "SVTPU_DRYRUN_NO_RETRY": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    for phase in ("phase train-step", "phase eval-allgather",
                  "phase sharded-save", "phase elastic-restore",
                  "phase post-restore-step"):
        assert phase in r.stdout, (phase, r.stdout)
    assert "dryrun_multichip(2" in r.stdout


@pytest.mark.slow
def test_dryrun_retries_in_subprocess_after_foreign_backend_init():
    """If JAX already initialized another backend in this process (so
    the CPU pin can no longer take effect in-process), the gate falls
    back to one clean CPU-pinned subprocess and still goes green."""
    r = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "assert jax.device_count() == 1  # plain CPU, no virtual mesh\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(2)\n"
        "print('RETRY-PATH-DONE')\n" % REPO,
        # strip the conftest virtual-mesh flag so the pre-initialized CPU
        # backend has 1 device and the in-process attempt must fail over
        {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "retrying once in a clean CPU-pinned subprocess" in r.stdout
    assert "RETRY-PATH-DONE" in r.stdout


@pytest.mark.slow
def test_dryrun_full_tp_lifecycle_reshapes_mesh():
    """n=8: the elastic restore phase must actually change mesh shape
    (4x2 -> 2x4) and the second step must run on the restored state."""
    r = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n" % REPO,
        {"SVTPU_DRYRUN_NO_RETRY": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "data x model (dp+tp)" in r.stdout
    assert ("elastic-restore OK: mesh {'data': 4, 'model': 2} -> "
            "{'data': 2, 'model': 4}") in r.stdout
    assert "phase post-restore-step OK" in r.stdout
