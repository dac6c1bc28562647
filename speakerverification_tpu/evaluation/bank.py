"""Device-resident speaker bank — production-scale identification.

The reference identifies a speaker by a host-side linear scan over the
enrolled bank (``src/inference.py:254-327``: pairwise distance against
every enrolled mean embedding, ``score = 1 − d²/2``). On L2-normalized
embeddings that score IS the cosine similarity and the argmin of the
distance IS the argmax of the cosine — so the whole scan is one
``[Q, D] @ [D, N]`` GEMM plus a ``lax.top_k``, which the MXU does at
memory speed for banks far past what a host scan can serve online.

``SpeakerBank`` keeps the normalized bank resident in HBM (fp32 by
default; bf16 halves footprint for multi-million-speaker banks) and
serves ``identify(queries, k)`` through a jitted program per padded
query-batch size:

* bank rows are L2-normalized once at construction (same formula as
  ``scoring.l2_normalize``) and padded to a lane-friendly multiple;
  padded rows are masked to −2 (below any cosine) before ``top_k``;
* queries are L2-normalized *inside* the program, so callers may pass
  raw or normalized mean embeddings interchangeably (normalizing an
  already-normalized vector is a no-op);
* query batches are padded to a small bucket grid so online traffic
  (Q = 1 … batch) reuses a handful of compiled programs instead of one
  per Q.

Numerics vs the host path: the host computes ``1 − d²/2`` through the
``|e|² + |c|² − 2e·c`` expansion on normalized vectors, which equals
the cosine up to fp32 rounding of ``|e|² ≈ 1`` (~1e-7). Exact-parity
tested in tests/test_bank.py.
"""

from __future__ import annotations

import functools
from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpeakerBank", "ShardedSpeakerBank", "identify_with_bank"]

# Banks at or above this row count route /identify and --predict through
# the device GEMM by default; below it a host scan is already sub-ms and
# not worth a device dispatch.
AUTO_DEVICE_BANK_MIN_ROWS = 4096


def _normalize_rows(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.clip(n, eps, None)


def _padded_normalized_bank(embeds: np.ndarray, pad_unit: int):
    """[N, D] float32 -> (bank [n_pad, D] row-normalized, n, dim, n_pad).

    Allocates exactly ONE full-size host array (the padded bank) and
    normalizes rows in place — at multi-hundred-GB bank scale an extra
    normalize temp or staging copy is the difference between fitting in
    host RAM and an OOM kill.
    """
    embeds = np.asarray(embeds, np.float32)
    if embeds.ndim != 2:
        raise ValueError(f"bank must be [N, D], got {embeds.shape}")
    n, dim = embeds.shape
    n_pad = -(-max(n, 1) // pad_unit) * pad_unit
    bank = np.zeros((n_pad, dim), np.float32)
    bank[:n] = embeds
    norms = np.linalg.norm(bank[:n], axis=-1, keepdims=True)
    np.clip(norms, 1e-12, None, out=norms)
    bank[:n] /= norms
    return bank, n, dim, n_pad


@functools.lru_cache(maxsize=32)
def _identify_fn(q_pad: int, n_pad: int, dim: int, k: int, dtype: str):
    """Jitted (bank[n_pad,D], queries[q_pad,D], n_valid) -> (cos[q_pad,k],
    idx). ``n_valid`` is TRACED so live enrollment (``add``) never
    recompiles the lookup."""

    @jax.jit
    def run(bank, queries, n_valid):
        qn = queries / jnp.clip(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        scores = (qn.astype(bank.dtype) @ bank.T).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, jnp.float32(-2.0))
        return jax.lax.top_k(scores, k)

    return run


# Jitted donated scatter: bank.at[idx].set(rows) — the bank buffer
# updates in place (donate), so enrollment is O(rows) HBM work, not a
# bank copy; jit's own cache keys on (shape, dtype, sharding), so one
# program per enroll bucket. Padding lanes repeat row 0 / index 0 of
# the batch, making the duplicate writes idempotent.
_enroll_scatter = jax.jit(
    lambda b, rows, idx: b.at[idx].set(rows.astype(b.dtype)),
    donate_argnums=0)


@functools.lru_cache(maxsize=16)
def _grow_fn(extra: int, sharding=None):
    """Cached re-pad for bank growth. A size-changing copy can't reuse
    the old buffer (donation is a no-op across shapes), so growth
    transiently peaks at old+new HBM — inherent to re-padding; size the
    initial ``pad_rows_to`` so growth is rare. lru_cache keeps repeated
    (esp. sharded) growth from re-tracing per call."""
    kw = {"out_shardings": sharding} if sharding is not None else {}
    return jax.jit(lambda b: jnp.pad(b, ((0, extra), (0, 0))), **kw)


class SpeakerBank:
    """HBM-resident L2-normalized enrollment bank with GEMM top-k lookup.

    Parameters
    ----------
    embeds : [N, D] enrolled mean embeddings (normalized or not).
    labels : optional sequence/mapping of N speaker names; ``name(i)``
        falls back to the integer index when absent.
    dtype : bank storage dtype — fp32 (exact) or bf16 (half footprint;
        scores still accumulate and rank in fp32).
    pad_rows_to : bank rows pad to this multiple (MXU lane tiling).
    query_buckets : padded query-batch sizes, smallest sufficient bucket
        wins; queries beyond the largest bucket are chunked through it.
    """

    def __init__(self, embeds: np.ndarray,
                 labels: Optional[Sequence | Mapping] = None, *,
                 dtype: jnp.dtype = jnp.float32, pad_rows_to: int = 1024,
                 query_buckets: Sequence[int] = (1, 8, 64, 512),
                 device=None):
        bank, self.n, self.dim, self.n_pad = _padded_normalized_bank(
            embeds, pad_rows_to)
        self._labels = labels
        self._pad_unit = pad_rows_to
        self._buckets = tuple(sorted(set(int(b) for b in query_buckets)))
        self._bank = jax.device_put(jnp.asarray(bank, dtype), device)
        self.nbytes = self._bank.nbytes

    def name(self, idx: int):
        if self._labels is None:
            return int(idx)
        if isinstance(self._labels, Mapping):
            return self._labels[int(idx)]
        return self._labels[int(idx)]

    def _bucket(self, q: int) -> int:
        for b in self._buckets:
            if q <= b:
                return b
        return self._buckets[-1]

    def _identify_chunked(self, queries, k: int, fn_factory):
        """Shared bucket/pad/chunk loop; ``fn_factory(q_pad, k)`` returns
        the jitted ``(bank, queries) -> (scores, idx)`` for one bucket."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if q.shape[-1] != self.dim:
            raise ValueError(f"query dim {q.shape[-1]} != bank {self.dim}")
        k = min(int(k), self.n)
        if k == 0:                                 # empty bank
            return (np.zeros((q.shape[0], 0), np.float32),
                    np.zeros((q.shape[0], 0), np.int32))
        out_s, out_i = [], []
        step = self._buckets[-1]
        for lo in range(0, q.shape[0], step):
            chunk = q[lo: lo + step]
            qp = self._bucket(chunk.shape[0])
            pad = np.zeros((qp, self.dim), np.float32)
            pad[: chunk.shape[0]] = chunk
            s, i = fn_factory(qp, k)(self._bank, jnp.asarray(pad),
                                     jnp.asarray(self.n, jnp.int32))
            out_s.append(np.asarray(s[: chunk.shape[0]]))
            out_i.append(np.asarray(i[: chunk.shape[0]]))
        return np.concatenate(out_s), np.concatenate(out_i)

    def identify(self, queries: np.ndarray, k: int = 1):
        """Top-k nearest speakers by cosine (== reference's 1 − d²/2).

        queries: [Q, D] or [D] mean embeddings. Returns
        ``(scores [Q, k] fp32, idx [Q, k] int)`` as host arrays.
        """
        fn_dtype = str(self._bank.dtype)
        return self._identify_chunked(
            queries, k,
            lambda qp, kk: _identify_fn(qp, self.n_pad, self.dim, kk,
                                        fn_dtype))

    # ------------------------------------------------------- enrollment
    _ENROLL_BUCKETS = (1, 8, 64)

    def _append_labels(self, names):
        if names is None:
            if self._labels is not None:
                raise ValueError("bank has labels; add() needs names")
            return
        if self._labels is None and self.n > 0:
            raise ValueError("bank has no labels; add() got names")
        if self._labels is None:
            self._labels = {}
        if isinstance(self._labels, Mapping):
            if not isinstance(self._labels, dict):
                self._labels = dict(self._labels)
            for j, nm in enumerate(names):
                self._labels[self.n + j] = nm
        else:
            self._labels = list(self._labels) + list(names)

    def _grow(self, min_rows: int):
        """Re-pad the device bank so at least ``min_rows`` fit."""
        new_pad = -(-min_rows // self._pad_unit) * self._pad_unit
        extra = new_pad - self.n_pad
        self._bank = _grow_fn(extra)(self._bank)
        self.n_pad = new_pad
        self.nbytes = self._bank.nbytes

    def add(self, embeds: np.ndarray, names: Optional[Sequence] = None):
        """Enroll speakers into the LIVE bank.

        In-capacity adds are one donated scatter (in-place HBM update,
        O(new rows)); ``n_valid`` is traced, so identify() reuses its
        compiled program. Growth past the padding re-pads the device
        array (rare — padding absorbs ``pad_rows_to`` adds at a time).
        Returns the indices assigned to the new rows.
        """
        rows = np.atleast_2d(np.asarray(embeds, np.float32))
        if rows.shape[-1] != self.dim:
            raise ValueError(f"embed dim {rows.shape[-1]} != {self.dim}")
        rows = _normalize_rows(rows)
        m = rows.shape[0]
        if names is not None and len(names) != m:
            raise ValueError(f"{m} rows but {len(names)} names")
        if m == 0:
            return np.zeros((0,), np.int32)
        if self.n + m > self.n_pad:
            self._grow(self.n + m)
        self._append_labels(names)
        idx = np.arange(self.n, self.n + m, dtype=np.int32)
        for b in (*self._ENROLL_BUCKETS, None):
            if b is None or m <= b:
                mp = m if b is None else b
                break
        rows_p = np.broadcast_to(rows[:1], (mp, self.dim)).copy()
        rows_p[:m] = rows
        idx_p = np.full((mp,), idx[0], np.int32)
        idx_p[:m] = idx
        self._bank = _enroll_scatter(self._bank, jnp.asarray(rows_p),
                                     jnp.asarray(idx_p))
        self.n += m
        return idx

    def remove(self, idx: int):
        """Un-enroll row ``idx`` by swapping the LAST valid row into its
        slot (one gather + one donated scatter) and shrinking the traced
        valid count — identify() keeps its compiled program. Later rows'
        indices are unchanged except the moved last row, whose new index
        (``idx``) is returned (None if it was the last row)."""
        idx = int(idx)
        if not 0 <= idx < self.n:
            raise IndexError(f"row {idx} not in bank of {self.n}")
        last = self.n - 1
        moved = None
        if idx != last:
            row = np.asarray(self._bank[last], np.float32)[None, :]
            self._bank = _enroll_scatter(
                self._bank, jnp.asarray(row),
                jnp.asarray([idx], np.int32))
            moved = idx
        if self._labels is not None:
            if isinstance(self._labels, Mapping):
                if not isinstance(self._labels, dict):
                    self._labels = dict(self._labels)
                if idx != last:
                    self._labels[idx] = self._labels[last]
                self._labels.pop(last, None)
            else:
                self._labels = list(self._labels)
                if idx != last:
                    self._labels[idx] = self._labels[last]
                del self._labels[last]
        self.n = last
        return moved


def identify_with_bank(bank: SpeakerBank, queries: np.ndarray,
                       threshold: float = 0.0):
    """Reference --predict semantics over a device bank: best speaker per
    query, 'unknown' below threshold (src/inference.py:254-327)."""
    if bank.n == 0:
        raise ValueError("bank has no enrolled speakers")
    scores, idx = bank.identify(queries, k=1)
    scores, idx = scores[:, 0], idx[:, 0]
    names = [bank.name(int(b)) if scores[i] >= threshold else "unknown"
             for i, b in enumerate(idx)]
    return names, scores


@functools.lru_cache(maxsize=32)
def _sharded_identify_fn(q_pad: int, shard_rows: int, k: int,
                         k_local: int, dtype: str, mesh: jax.sharding.Mesh,
                         axis: str):
    """Jitted sharded lookup: bank P(axis, None), queries replicated.

    Each device GEMMs its row shard, top-k's LOCALLY (k_local candidates
    with global row indices), all_gathers the n_dev*k_local candidates
    per query, and reduces to the global top-k. The [Q, N] score matrix
    never exists unsharded, so bank capacity scales linearly with the
    mesh while per-query collective traffic is O(n_dev * k), not O(N).
    """
    from jax.sharding import PartitionSpec as P

    def local(bank_shard, q, n_valid):
        dev = jax.lax.axis_index(axis)
        row0 = dev * shard_rows
        qn = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        scores = (qn.astype(bank_shard.dtype) @ bank_shard.T
                  ).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + row0
        scores = jnp.where(col < n_valid, scores, jnp.float32(-2.0))
        s, li = jax.lax.top_k(scores, k_local)          # [q_pad, k_local]
        cand_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        cand_i = jax.lax.all_gather(li + row0, axis, axis=1, tiled=True)
        gs, pos = jax.lax.top_k(cand_s, k)              # [q_pad, k]
        gi = jnp.take_along_axis(cand_i, pos, axis=1)
        return gs, gi

    run = jax.shard_map(local, mesh=mesh,
                        in_specs=(P(axis, None), P(None, None), P()),
                        out_specs=(P(None, None), P(None, None)),
                        check_vma=False)
    return jax.jit(run)


class ShardedSpeakerBank(SpeakerBank):
    """Row-sharded :class:`SpeakerBank` over a device mesh.

    The enrolled bank is partitioned row-wise across a 1-D ``axis`` of
    ``mesh`` (``jax.sharding.NamedSharding(mesh, P(axis, None))``), so
    aggregate capacity is the SUM of the chips' HBM — a 16 GB v5e holds
    ~20 M fp32 192-d rows; an 8-chip pod slice holds ~160 M. ``identify``
    is exact-equal to the single-device bank (same GEMM, same masking;
    local-then-global top-k is exact because every global top-k row is
    by definition in its own shard's top-k).

    Beyond the reference (its identification is a host linear scan,
    src/inference.py:254-327); the TPU-native scale-out for it.
    """

    def __init__(self, embeds: np.ndarray,
                 labels: Optional[Sequence | Mapping] = None, *,
                 mesh: jax.sharding.Mesh, axis: str = "bank",
                 dtype: jnp.dtype = jnp.float32, pad_rows_to: int = 1024,
                 query_buckets: Sequence[int] = (1, 8, 64, 512)):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
        self.mesh, self.axis = mesh, axis
        self.n_dev = int(mesh.shape[axis])
        # equal shards, each a multiple of pad_rows_to
        bank, self.n, self.dim, self.n_pad = _padded_normalized_bank(
            embeds, pad_rows_to * self.n_dev)
        self._labels = labels
        self._pad_unit = pad_rows_to * self.n_dev
        self._buckets = tuple(sorted(set(int(b) for b in query_buckets)))
        # per-shard placement: each device pulls only its row slice, so
        # no second full-size host staging array exists next to `bank`.
        # The callback returns a HOST numpy slice (cast via the ml_dtypes
        # registry for bf16) — returning a jnp array would first commit
        # every shard to the default device and double-transfer 7 of 8
        # shards through it (transient 2-shard HBM peak on device 0)
        np_dtype = np.dtype(dtype)
        self._bank = jax.make_array_from_callback(
            bank.shape, NamedSharding(mesh, P(axis, None)),
            lambda idx: bank[idx].astype(np_dtype))
        self.shard_rows = self.n_pad // self.n_dev
        self.nbytes = self._bank.nbytes  # aggregate across shards

    def identify(self, queries: np.ndarray, k: int = 1):
        """Same contract as :meth:`SpeakerBank.identify`, sharded."""
        fn_dtype = str(self._bank.dtype)

        def factory(qp, kk):
            # Correctness: a global top-k row is in its shard's local
            # top-k, so min(kk, shard_rows) candidates per shard suffice.
            return _sharded_identify_fn(qp, self.shard_rows, kk,
                                        min(kk, self.shard_rows), fn_dtype,
                                        self.mesh, self.axis)

        return self._identify_chunked(queries, k, factory)

    def _grow(self, min_rows: int):
        """Re-pad keeping the P(axis, None) row sharding (and equal
        shards: the pad unit is pad_rows_to * n_dev)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        new_pad = -(-min_rows // self._pad_unit) * self._pad_unit
        extra = new_pad - self.n_pad
        sh = NamedSharding(self.mesh, P(self.axis, None))
        self._bank = _grow_fn(extra, sh)(self._bank)
        self.n_pad = new_pad
        self.shard_rows = new_pad // self.n_dev
        self.nbytes = self._bank.nbytes
