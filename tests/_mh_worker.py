"""Subprocess worker for the multi-host DP test.

Launched once per simulated host with SVTPU_NUM_PROCESSES /
SVTPU_PROCESS_ID / SVTPU_COORDINATOR in the environment; runs the full
Trainer on a 2-process × 4-virtual-CPU-device global mesh.

Usage: python _mh_worker.py <hparams.json>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    with open(sys.argv[1]) as f:
        hparams = json.load(f)

    from speakerverification_tpu.training.trainer import Trainer

    trainer = Trainer(hparams)
    assert trainer.multiprocess, "worker expected a multi-process run"
    assert jax.process_count() == int(os.environ["SVTPU_NUM_PROCESSES"])
    result = trainer.fit()
    print(f"WORKER_DONE rank={trainer.rank} min_loss={result['min_loss']:.6f}")


if __name__ == "__main__":
    main()
