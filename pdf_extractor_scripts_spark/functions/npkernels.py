"""Vectorized numpy twins of the portable SQL expression builders.

The interpreted-expression forms in ``portable.py`` evaluate
``substr(text, i, 1)`` per character position — O(i) per call on Spark's
UTF8String, so a whole document costs O(n^2) character scans, and every
element goes through the interpreted higher-order-function evaluator. These
kernels compute the SAME integers (and, for embeddings, the SAME IEEE-754
doubles) with numpy inside ``mapInArrow`` batches, per the optimization
playbook (guide §4.2: hand whole Arrow batches to vectorized native code).

Bit-for-bit equivalence contract (asserted by tests/test_npkernels.py):

* Shingle/minhash/simhash/fingerprint are pure int64 modular arithmetic —
  associativity is exact, any evaluation order matches the SQL.
* Embedding dots/norms/plane-projections replicate Spark's
  ``aggregate(zip_with(...), 0.0, (acc, v) -> acc + v)`` STRICT LEFT FOLD:
  ``leftfold_dot`` accumulates column-by-column (acc += a_j * b_j for
  j = 0..d-1), which performs the identical sequence of IEEE additions per
  row, so the resulting doubles are bit-identical to the interpreted HOF —
  numpy's pairwise ``np.sum`` would NOT be.  Each product ``float32 *
  float32`` (or ``float32 * small-int weight``) is exactly representable in
  double, so the products themselves carry no rounding.
* ``round()`` is NEVER applied here — Spark's HALF_UP rounding differs from
  Python's bankers' rounding, so callers emit raw doubles and round in
  Spark SQL, keeping the final rounded values identical to the old plans.

Code points come from ``str.encode("utf-32-le")`` — one uint32 per code
point, matching ``ascii(substr(text, i, 1))`` for any Unicode input, not
just ASCII.
"""

from __future__ import annotations

import numpy as np

from .portable import MINHASH_PARAMS, MOD_SHINGLE, SIMHASH_BITS

_FP_MOD = 2147483647  # fingerprint modulus (2^31 - 1), see fingerprint_sql

_A = np.array([a for a, _ in MINHASH_PARAMS], dtype=np.int64)
_B = np.array([b for _, b in MINHASH_PARAMS], dtype=np.int64)


def codepoints(s: str) -> np.ndarray:
    """int64 Unicode code points of ``s`` — ascii(substr(s, i, 1)) per i."""
    if not s:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)


def shingle_hashes(s: str) -> np.ndarray:
    """All 3-gram shingle hashes of ``s`` (shingle_hashes_sql semantics):
    (cp[i]*961 + cp[i+1]*31 + cp[i+2]) % MOD_SHINGLE; empty for len < 3."""
    cp = codepoints(s)
    if cp.size < 3:
        return np.empty(0, dtype=np.int64)
    return (cp[:-2] * 961 + cp[1:-1] * 31 + cp[2:]) % MOD_SHINGLE


def minhash_signature(h: np.ndarray, k: int) -> np.ndarray:
    """(k,) int64 minima of (a_i*h + b_i) % MOD_SHINGLE over the shingle
    multiset — minhash_sql / the explode+groupBy-min aggregation. ``h``
    must be non-empty (callers filter length(text) >= 3 first)."""
    return ((_A[:k, None] * h[None, :] + _B[:k, None]) % MOD_SHINGLE).min(axis=1)


def simhash(h: np.ndarray) -> int:
    """SIMHASH_BITS-wide SimHash over shingle hashes (simhash_sql): bit b
    set iff sum over shingles of (2*((h>>b)&1) - 1) > 0."""
    bits = (h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.int64)[None, :]) & 1
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.int64) << np.arange(SIMHASH_BITS, dtype=np.int64)).sum())


def fingerprint(s: str) -> int:
    """Order-sensitive rolling-hash fingerprint (fingerprint_sql):
    sum_i cp_i * ((i % 97) + 1) mod 2^31-1, i 1-based; 0 for empty text
    (Spark's sequence(1,0) = [1,0] contributes ascii('') = 0 twice)."""
    cp = codepoints(s)
    n = cp.size
    if n == 0:
        return 0
    w = (np.arange(1, n + 1, dtype=np.int64) % 97) + 1
    return int((cp * w).sum() % _FP_MOD)


# --------------------------------------------------------------------------
# Whole-batch text kernels: one concatenated codepoint array per Arrow batch,
# per-document reductions via np.*.reduceat — no per-document Python loop.
# Bit-identical to the scalar kernels above (asserted in tests).
# --------------------------------------------------------------------------
def _batch_codepoints(texts: list[str]):
    """(cp, starts, lens) for the concatenated texts: cp is one int64 code-
    point array, doc d spans cp[starts[d]:starts[d]+lens[d]]."""
    joined = "".join(texts)
    cp = (
        np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
        if joined
        else np.empty(0, dtype=np.int64)
    )
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    ends = np.cumsum(lens)
    return cp, ends - lens, lens


def _batch_shingles(texts: list[str]):
    """(h, starts, invalid) over the concatenated batch: h[i] is the shingle
    hash starting at global char i; positions whose 3-gram crosses a doc
    boundary are listed in ``invalid`` (callers overwrite them with a
    neutral element before reducing). Requires every text length >= 3."""
    cp, starts, lens = _batch_codepoints(texts)
    if cp.size < 3:
        return np.empty(0, dtype=np.int64), starts, np.empty(0, dtype=np.int64)
    h = (cp[:-2] * 961 + cp[1:-1] * 31 + cp[2:]) % MOD_SHINGLE
    ends = starts + lens
    invalid = np.concatenate([ends - 2, ends - 1])
    invalid = invalid[invalid < h.size]
    return h, starts, invalid


def minhash_batch(texts: list[str], k: int) -> np.ndarray:
    """(n_docs, k) int64 minhash signatures for a whole batch — vectorized
    twin of per-doc minhash_signature(shingle_hashes(s), k)."""
    n = len(texts)
    if n == 0:
        return np.empty((0, k), dtype=np.int64)
    h, starts, invalid = _batch_shingles(texts)
    out = np.empty((n, k), dtype=np.int64)
    for i in range(k):
        m = (_A[i] * h + _B[i]) % MOD_SHINGLE
        m[invalid] = MOD_SHINGLE  # > any (a*h+b) % MOD — never the min
        out[:, i] = np.minimum.reduceat(m, starts)
    return out


def simhash_batch(texts: list[str]) -> np.ndarray:
    """(n_docs,) int64 SimHash values for a whole batch — vectorized twin of
    per-doc simhash(shingle_hashes(s))."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    h, starts, invalid = _batch_shingles(texts)
    out = np.zeros(n, dtype=np.int64)
    for b in range(SIMHASH_BITS):
        votes = 2 * ((h >> b) & 1) - 1
        votes[invalid] = 0  # boundary-crossing shingles contribute nothing
        out += (np.add.reduceat(votes, starts) > 0).astype(np.int64) << b
    return out


def fingerprint_batch(texts: list[str]) -> np.ndarray:
    """(n_docs,) int64 fingerprints for a whole batch — vectorized twin of
    per-doc fingerprint(s). Docs may be any length including empty."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cp, starts, lens = _batch_codepoints(texts)
    out = np.zeros(n, dtype=np.int64)
    nonempty = lens > 0
    if cp.size:
        pos = np.arange(cp.size, dtype=np.int64) - np.repeat(starts, lens) + 1
        prod = cp * ((pos % 97) + 1)
        # reduceat needs strictly valid segment starts; empty docs would
        # repeat a start index — reduce over non-empty docs only.
        ne_starts = starts[nonempty]
        out[nonempty] = np.add.reduceat(prod, ne_starts) % _FP_MOD
    return out


# --------------------------------------------------------------------------
# Embedding kernels — strict left-fold doubles
# --------------------------------------------------------------------------
def leftfold_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot of two (n, d) float64 matrices with strict left-fold
    addition order: acc_0 = 0.0; acc_j = acc_{j-1} + a_j*b_j — the exact
    IEEE addition sequence of Spark's aggregate() fold (and DuckDB's
    list_reduce), vectorized ACROSS rows (not across the fold)."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc += a[:, j] * b[:, j]
    return acc


def leftfold_norm(e: np.ndarray) -> np.ndarray:
    """sqrt(leftfold sum of squares) — the _emb_cte nrm column."""
    return np.sqrt(leftfold_dot(e, e))


def plane_weights(t: int, bits: int, d: int) -> np.ndarray:
    """(bits, d) integer-lattice hyperplane weights for sign-LSH table t:
    w(t, b, i) = ((i*3 + b*5 + t*11) % 7) - 3, i 1-based (_plane_dot)."""
    i = np.arange(1, d + 1, dtype=np.int64)
    b = np.arange(bits, dtype=np.int64)
    return (((i[None, :] * 3 + b[:, None] * 5 + t * 11) % 7) - 3).astype(np.float64)


def signlsh_buckets(e: np.ndarray, t: int, bits: int) -> np.ndarray:
    """Integer bucket ids for sign-LSH table ``t`` over the (n, d) float64
    embedding matrix — signlsh_bucket_sql: bit b set iff the left-fold
    plane projection is > 0."""
    w = plane_weights(t, bits, e.shape[1])
    out = np.zeros(e.shape[0], dtype=np.int64)
    for b in range(bits):
        acc = np.zeros(e.shape[0], dtype=np.float64)
        wb = w[b]
        for j in range(e.shape[1]):
            acc += e[:, j] * wb[j]
        out += (acc > 0).astype(np.int64) << b
    return out


def list_to_matrix(col) -> np.ndarray:
    """Arrow list<float> column (uniform length, no nulls) -> (n, d) float64
    matrix. Cast float32 -> float64 is exact (matches the SQL's
    cast(x as double))."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = flat.size // n
    return flat.astype(np.float64).reshape(n, d)
