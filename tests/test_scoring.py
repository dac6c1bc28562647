"""Batched device scoring vs numpy oracles of the reference math."""

import numpy as np
import pytest

from speakerverification_tpu.evaluation.scoring import score_trials


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(0)
    n_files, E, D = 12, 5, 16
    emb = rng.normal(size=(n_files, E, D)).astype(np.float32)
    ridx = rng.integers(0, n_files, 30)
    cidx = rng.integers(0, n_files, 30)
    return emb, ridx, cidx


def _norm(x, eps=1e-12):
    return x / np.clip(np.linalg.norm(x, axis=-1, keepdims=True), eps, None)


def test_cosine_oracle(embeddings):
    """mean |cos| elementwise over crops (src/utils.py:163-164)."""
    emb, ridx, cidx = embeddings
    ours = score_trials(emb, ridx, cidx, mode="cosine", normalize=True)
    embn = _norm(emb)
    for t in range(len(ridx)):
        r, c = embn[ridx[t]], embn[cidx[t]]
        cos = np.sum(_norm(r, 1e-5) * _norm(c, 1e-5), axis=-1)
        assert ours[t] == pytest.approx(np.mean(np.abs(cos)), rel=1e-4)


def test_pnorm_oracle(embeddings):
    emb, ridx, cidx = embeddings
    ours = score_trials(emb, ridx, cidx, mode="pnorm", normalize=False)
    for t in range(len(ridx)):
        r, c = emb[ridx[t]], emb[cidx[t]]
        d = np.linalg.norm(r - c + 1e-6, axis=-1)
        assert ours[t] == pytest.approx(np.mean(d), rel=1e-3, abs=1e-5)


def test_distance_oracle(embeddings):
    """no-cohort path: −mean all-pairs distance (src/model.py:426-431)."""
    emb, ridx, cidx = embeddings
    ours = score_trials(emb, ridx, cidx, mode="distance", normalize=True)
    embn = _norm(emb)
    for t in range(3):
        r, c = embn[ridx[t]], embn[cidx[t]]
        d = np.linalg.norm(r[:, None, :] - c[None, :, :], axis=-1)
        assert ours[t] == pytest.approx(-np.mean(d), rel=1e-3)


def test_snorm_oracle(embeddings):
    """Adaptive S-norm vs a literal port of src/utils.py:135-160."""
    emb, ridx, cidx = embeddings
    rng = np.random.default_rng(1)
    cohorts = rng.normal(size=(50, emb.shape[-1])).astype(np.float32)
    top = 10
    ours = score_trials(emb, ridx, cidx, mode="zt_norm", cohorts=cohorts,
                        top=top, normalize=True)

    embn = _norm(emb)

    def zt(ref, com):
        S = np.mean(np.inner(cohorts, ref), axis=1)
        S = np.sort(S, axis=0)[::-1][:top]
        score = np.mean(np.inner(ref, com))
        return (score - np.mean(S)) / np.std(S)

    for t in range(len(ridx)):
        r, c = embn[ridx[t]], embn[cidx[t]]
        ref_score = (zt(r, c) + zt(c, r)) / 2
        assert ours[t] == pytest.approx(ref_score, rel=1e-3, abs=1e-4)


def test_snorm_requires_cohorts(embeddings):
    emb, ridx, cidx = embeddings
    with pytest.raises(ValueError):
        score_trials(emb, ridx, cidx, mode="zt_norm", cohorts=None)


def test_same_file_cosine_is_one(embeddings):
    emb, _, _ = embeddings
    idx = np.arange(emb.shape[0])
    s = score_trials(emb, idx, idx, mode="cosine")
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
