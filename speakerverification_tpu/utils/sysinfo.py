"""System / accelerator environment report.

Parity target: src/utils.py:527-613 ``get_sys_information`` (psutil CPU/
RAM/GPU dump behind the --sys_info flag, src/main.py:37,141-142). The
TPU-native version reports JAX devices, platform, memory stats from
/proc, and library versions — without requiring psutil.
"""

from __future__ import annotations

import os
import platform
from pathlib import Path

__all__ = ["get_sys_information", "format_sys_information"]


def _meminfo() -> dict:
    out = {}
    p = Path("/proc/meminfo")
    if p.exists():
        for line in p.read_text().splitlines():
            k, _, v = line.partition(":")
            if k in ("MemTotal", "MemAvailable"):
                out[k] = v.strip()
    return out


def get_sys_information() -> dict:
    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "cpu_count": os.cpu_count(),
        "memory": _meminfo(),
    }
    try:
        import jax
        info["jax_version"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["devices"] = [f"{d.platform}:{d.device_kind} (id {d.id})"
                           for d in jax.devices()]
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                info["device_memory"] = {
                    k: v for k, v in stats.items()
                    if "bytes" in k and "limit" in k or k == "bytes_in_use"}
        except Exception:
            pass
    except Exception as e:          # jax missing/broken: still report host
        info["jax_error"] = str(e)
    for mod in ("flax", "optax", "numpy"):
        try:
            info[f"{mod}_version"] = __import__(mod).__version__
        except ImportError:
            pass
    return info


def format_sys_information() -> str:
    info = get_sys_information()
    lines = ["System information:"]
    for k, v in info.items():
        lines.append(f"  {k}: {v}")
    return "\n".join(lines)
