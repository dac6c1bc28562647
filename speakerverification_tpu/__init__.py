"""speakerverification_tpu — a TPU-native speaker-verification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hiimmuc/SpeakerVerification (PyTorch/CUDA), designed TPU-first:

* GEMM-native audio frontend (framing + windowed DFT + mel projection as
  matmuls on the MXU), with an optional fused Pallas kernel.
* Encoder zoo (ECAPA-TDNN, RawNet2/3, ResNetSE, TitaNet, hybrids, ...) in
  Flax with static shapes and channels-last layouts.
* Margin/metric-learning loss zoo and optax-based optimizer zoo.
* Trial scoring as a single on-device ``E @ E.T`` matmul plus top-k
  adaptive S-norm, replacing the reference's per-pair Python loops
  (reference: src/model.py:415-448).
* Data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
  gradient reduction over ICI, replacing torch DDP/NCCL
  (reference: src/trainer.py:292-303).

The public configuration surface (YAML schema with ``!ref`` interpolation,
CLI verbs, manifest/trial-file formats) is kept compatible with the
reference (src/utils.py:191-201, yaml/configuration.yaml).
"""

__version__ = "0.1.0"

from speakerverification_tpu.config import read_config  # noqa: F401
