"""Trial scoring on device: one GEMM for the whole trial list.

TPU-native replacement for the reference's per-pair Python scoring loop
(src/model.py:415-448 and src/utils.py:126-169): every unique file's
``num_eval`` crop embeddings are stacked into one ``[n_files, E, D]``
tensor, and the whole trial list is scored with batched gathers +
matmuls, plus a single ``E_mean @ cohorts.T`` GEMM + ``top_k`` for
adaptive S-norm (AS-norm) — BASELINE.md's "single-matmul trial scoring".

Scoring-mode parity (all modes accept per-file crop stacks [E, D]):

* ``cosine``  — mean over crops of |cos(ref_a, com_a)| elementwise in a
  (src/utils.py:163-164).
* ``pnorm``   — mean elementwise euclidean distance (src/utils.py:167-169;
  note: a *distance*, larger = farther — kept for parity).
* ``distance``— no-cohort path: −mean over all crop pairs of
  ‖ref_a − com_b‖ (src/model.py:426-431; the reference's
  ``pairwise_distance`` broadcast there predates torch changing the
  reduction axis — we implement the intended all-pairs semantics).
* ``zt_norm``/``norm`` — adaptive symmetric S-norm with top-k cohort
  statistics (src/utils.py:135-160, top=200 at call sites).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["l2_normalize", "score_trials", "cohort_stats", "snorm_scores"]


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@functools.partial(jax.jit, static_argnames=("mode",))
def _score_pairs(emb: jax.Array, ridx: jax.Array, cidx: jax.Array,
                 mode: str) -> jax.Array:
    """emb: [n_files, E, D]; ridx/cidx: [n_trials] int32 → [n_trials]."""
    ref = emb[ridx]                                     # [T, E, D]
    com = emb[cidx]

    if mode == "cosine":
        rn = l2_normalize(ref, eps=1e-5)
        cn = l2_normalize(com, eps=1e-5)
        cos = jnp.sum(rn * cn, axis=-1)                 # [T, E] elementwise crops
        return jnp.mean(jnp.abs(cos), axis=-1)
    if mode == "pnorm":
        # torch F.pairwise_distance adds eps inside the difference
        d = jnp.linalg.norm(ref - com + 1e-6, axis=-1)
        return jnp.mean(d, axis=-1)
    if mode == "distance":
        # −mean over all crop pairs of euclidean distance
        d2 = (jnp.sum(ref**2, -1)[:, :, None] + jnp.sum(com**2, -1)[:, None, :]
              - 2.0 * jnp.einsum("ted,tfd->tef", ref, com))
        d = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
        return -jnp.mean(d, axis=(1, 2))
    raise ValueError(f"unknown scoring mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("top",))
def cohort_stats(emb_mean: jax.Array, cohorts: jax.Array, top: int = 200):
    """Per-file top-k cohort statistics in one GEMM + top_k.

    ``mean over crops of inner(cohorts, crops)`` equals
    ``cohorts @ mean(crops)``, so the whole cohort pass is
    ``emb_mean [n_files, D] @ cohorts.T [D, N]`` (parity with the Z/T-norm
    inner mean in src/utils.py:142-144).
    Returns (mu, sigma) each ``[n_files]``.
    """
    scores = emb_mean @ cohorts.T                       # [n_files, N]
    k = min(top, scores.shape[-1]) if top > 0 else scores.shape[-1]
    top_scores, _ = jax.lax.top_k(scores, k)
    mu = jnp.mean(top_scores, axis=-1)
    sigma = jnp.std(top_scores, axis=-1)
    return mu, sigma


@jax.jit
def snorm_scores(emb_mean: jax.Array, ridx: jax.Array, cidx: jax.Array,
                 mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Adaptive symmetric S-norm (parity: src/utils.py:135-160).

    raw(r, c) = mean over crop pairs of inner = emb_mean[r] · emb_mean[c];
    s = ((raw − μ_r)/σ_r + (raw − μ_c)/σ_c) / 2.
    """
    raw = jnp.sum(emb_mean[ridx] * emb_mean[cidx], axis=-1)
    return 0.5 * ((raw - mu[ridx]) / sigma[ridx] + (raw - mu[cidx]) / sigma[cidx])


def score_trials(emb: np.ndarray | jax.Array,
                 ridx: np.ndarray, cidx: np.ndarray,
                 mode: str = "cosine",
                 cohorts: Optional[np.ndarray] = None,
                 top: int = 200,
                 normalize: bool = True) -> np.ndarray:
    """Score a whole trial list on device.

    emb: ``[n_files, E, D]`` crop embeddings (E = num_eval). ``normalize``
    mirrors the loss head's ``test_normalize`` (src/model.py:421-424).
    ``mode='norm'``/``'zt_norm'`` requires ``cohorts [N, D]``.
    """
    emb = jnp.asarray(emb)
    ridx = jnp.asarray(ridx, dtype=jnp.int32)
    cidx = jnp.asarray(cidx, dtype=jnp.int32)
    if normalize:
        emb = l2_normalize(emb)

    if mode in ("norm", "zt_norm"):
        if cohorts is None:
            raise ValueError("zt_norm scoring requires a cohort bank")
        emb_mean = jnp.mean(emb, axis=1)
        mu, sigma = cohort_stats(emb_mean, jnp.asarray(cohorts), top)
        return np.asarray(snorm_scores(emb_mean, ridx, cidx, mu, sigma))

    return np.asarray(_score_pairs(emb, ridx, cidx, mode))
