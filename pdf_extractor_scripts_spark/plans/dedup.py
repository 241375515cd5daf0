"""Deduplication queries — the training-data-pipeline dedup family: exact
(hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join), SimHash,
blocked n-gram Jaccard, and embedding-cosine near-dup.

The reference deduplicates only within a document (line items keyed on
(line_number, item_code, description[:50]), text_pdf_processor.py:1718-1735);
corpus-level dedup is the capability a 100 TB training-data pipeline adds on
top. All hashes are the engine-portable arithmetic family from
functions/portable.py so the DuckDB oracle reproduces them bit-for-bit.

Scale design (r7): every signature (MinHash, SimHash, shingle set) is a
ZERO-SHUFFLE Arrow map stage — the numpy kernels in functions/npkernels.py
compute the identical integers per document batch (guide §4.2), so no plan
carries a per-character row and no signature pays a shuffle at all (the
r2-r6 explode + map-side-combined aggregation evaluated substr(text, i, 1)
per position — O(n^2) character scans per doc through the interpreted
evaluator). LSH banding turns the quadratic
all-pairs problem into an equi-join on (band_id, band_key); exact Jaccard
and cosine run only as VERIFY stages over LSH candidates. No operator here
ever materializes the O(n²) pair space or a coarse-block self-join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, load_table, spread
from ..functions.portable import (
    MINHASH_PARAMS,
    minhash_sql,
    simhash_sql,
    shingle_hashes_sql,
)

def _doc_texts(spark, sf_dir: str):
    """(doc_id, text) for documents long enough to shingle — the shared
    source for every signature kernel below."""
    d = load_table(spark, sf_dir, "documents")
    return spread(d.filter(F.length("text") >= 3).select("doc_id", "text"))


def _minhash_gen(k: int):
    """mapInArrow generator: (doc_id, text) batches -> (doc_id, mh0..mh{k-1}).

    r7 OPTIMIZATION (guide §4.2): the former explode + map-side-combined
    groupBy evaluated ``ascii(substr(text, i, 1))`` per character position —
    substr on UTF8String is O(i), so one document cost O(n^2) character
    scans through the interpreted expression evaluator, and the signature
    aggregation still paid a (small) shuffle. The numpy kernel computes the
    identical int64 modular arithmetic (tests/test_npkernels.py asserts
    bit-equality against the DuckDB oracle) in one vectorized pass per doc,
    emits the combined signature row directly, and removes the groupBy
    shuffle outright — measured 6.4s -> ~1s for dedup_minhash_lsh at sf0.1.
    The DuckDB oracle keeps the list-comprehension formulation — identical
    arithmetic, different physical plan."""

    def gen(batches):
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        for batch in batches:
            sigs = npk.minhash_batch(batch.column(1).to_pylist(), k)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0)] + [pa.array(sigs[:, i]) for i in range(k)],
                ["doc_id"] + [f"mh{i}" for i in range(k)],
            )

    return gen


def _shingle_distinct_gen():
    """mapInArrow generator: (doc_id, text) -> distinct (doc_id, h) rows —
    np.unique per document replaces the former explode + corpus-wide
    DISTINCT aggregation (two HashAggregates over one row per corpus
    character)."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            out_id, out_h = [], []
            for i, s in zip(ids, batch.column(1).to_pylist()):
                u = np.unique(npk.shingle_hashes(s))
                out_h.append(u)
                out_id.append(np.full(u.size, i, dtype=np.int64))
            if out_id:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(out_id)), pa.array(np.concatenate(out_h))],
                    ["doc_id", "h"],
                )

    return gen


def _shingle_array_gen():
    """mapInArrow generator: (doc_id, text) -> (doc_id, hs, n) where hs is
    the SORTED distinct shingle-hash array and n its length — the per-doc
    metadata the broadcast verify path ships instead of exploded rows."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        for batch in batches:
            # int32 payload: shingle hashes are < 2^20, and the arrays are
            # re-shipped once per PAIR through the broadcast joins below —
            # halving the element width halves the dominant Arrow traffic.
            arrs = [
                np.unique(npk.shingle_hashes(s)).astype(np.int32)
                for s in batch.column(1).to_pylist()
            ]
            sizes = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
            flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int32)
            offsets = np.zeros(len(arrs) + 1, dtype=np.int32)
            np.cumsum(sizes, out=offsets[1:])
            hs = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), hs, pa.array(sizes)],
                ["doc_id", "hs", "n"],
            )

    return gen


def _pair_intersect_gen():
    """mapInArrow generator over (doc_a, doc_b, n_a, n_b, ha, hb) rows:
    n_inter = |ha ∩ hb| via np.intersect1d on the sorted unique arrays —
    exact integer set math, same |A∩B| the narrow-row join+count computed."""

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ha = batch.column(4)
            hb = batch.column(5)
            # zero-copy offset/value views — no per-row ListScalar objects
            va = ha.values.to_numpy(zero_copy_only=False)
            oa = ha.offsets.to_numpy(zero_copy_only=False)
            vb = hb.values.to_numpy(zero_copy_only=False)
            ob = hb.offsets.to_numpy(zero_copy_only=False)
            n = len(ha)
            inter = np.empty(n, dtype=np.int64)
            for i in range(n):
                a = va[oa[i]:oa[i + 1]]
                b = vb[ob[i]:ob[i + 1]]
                inter[i] = np.intersect1d(a, b, assume_unique=True).size
            yield pa.RecordBatch.from_arrays(
                [batch.column(j) for j in range(4)] + [pa.array(inter)],
                ["doc_a", "doc_b", "n_a", "n_b", "n_inter"],
            )

    return gen


# MinHash geometry. The ORACLE-CHECKED default is k=16 / 4 bands — the full
# width of the portable hash family, geometry-matched to the production
# k=128/16 claim (4 rows per band both here and there); round 2 gated the
# narrower k=8/2. Production tuning beyond that is a parameter, not a
# rewrite — minhash_signatures/lsh_candidate_pairs take any (k, bands) with
# k % bands == 0 and k <= len(MINHASH_PARAMS)=16, and the plan shape
# (map-side-combined signature agg → band-key equi-join → full-signature
# verify) is IDENTICAL at k=128/16 bands; only column count grows.
_K = 16
_BANDS = 4
# Hot-bucket guard: DEFAULT-ON in every pipeline-facing candidate path (and
# oracle-checked — the star pairing is deterministic, so DuckDB replays it).
# Round-2 telemetry: one 742-doc band bucket at sf0.1 = 275k pairs from a
# single key; boilerplate-heavy real corpora are far worse. Pass
# max_bucket=None to opt out (research/audit runs only).
_MAX_BUCKET = 64

# Broadcast ceiling for the Jaccard-verify pair list (rows). Below this the
# candidate pairs (and their doc-id list) are broadcast into the verify
# joins — measured 10.0s vs 16.8s for the shuffle form at sf0.1. Above it
# the hint is DROPPED automatically and AQE picks a shuffle join: the guard
# keeps |pairs| ~linear in corpus size, but "linear" still outgrows executor
# memory at 10^12 docs, and an OOM is worse than a slower join. ~50 bytes
# per (doc_a, doc_b) row puts the default (4M rows) around 200 MB broadcast
# — inside a 4 GB executor's comfort zone. Tests drive the fallback path by
# monkeypatching this to 0.
BROADCAST_PAIRS_MAX = 4_000_000

# Second guard for the r7 array-verify fast path: the broadcast of
# candidate-doc shingle arrays is sized by candidates × DOCUMENT LENGTH,
# which the pair-count guard alone does not bound — a corpus of megabyte
# documents could blow executor memory through a "small" pair list. The
# total candidate character count is read from the documents table's
# n_chars column (column-pruned scan, no text materialized); above the
# ceiling the narrow-row formulation takes over. 64M chars ≈ 256 MB of
# int32 arrays — comfortably inside a 4 GB executor. Tests drive the
# fallback by monkeypatching this to 0.
ARRAY_BC_MAX_CHARS = 64_000_000


# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT count(*) AS n_docs,
           count(DISTINCT text) AS n_distinct_texts,
           count(DISTINCT md5(text)) AS n_distinct_hashes,
           (count(*) - count(DISTINCT text))::BIGINT AS n_dup_docs
    FROM documents
    """,
    doc="Exact deduplication via content-hash groupBy. The synthetic corpus "
        "has no exact duplicates, so this reports the audit stats (total vs "
        "distinct); the group-by-hash survivor selection is the same plan "
        "shape as t4_dedup_documents. md5 agrees across engines (both hash "
        "the UTF-8 bytes).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_distinct_hashes"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("bigint").alias("n_dup_docs"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------
def _sig_cte() -> str:
    mh = minhash_sql("text", "duckdb", k=_K)
    sig_cols = ", ".join(f"cast({e} as bigint) AS mh{i}" for i, e in enumerate(mh))
    return f"sig AS (SELECT doc_id, {sig_cols} FROM documents WHERE length(text) >= 3)"


def _cand_cte(k: int = _K, bands: int = _BANDS, max_bucket: int = _MAX_BUCKET) -> str:
    """DuckDB CTEs reproducing lsh_candidate_pairs' guarded semantics over a
    preceding ``sig`` CTE: explode signatures into (band_id, band_key) rows,
    all-pairs inside buckets of size <= max_bucket, deterministic STAR
    pairing (min doc_id as representative) above it."""
    rpb = k // bands
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {t} AS band_id, concat_ws(',', "
        + ", ".join(f"mh{t * rpb + j}" for j in range(rpb))
        + ") AS band_key FROM sig"
        for t in range(bands)
    )
    return f"""
    bands AS (
{band_selects}
    ),
    sized AS (
      SELECT doc_id, band_id, band_key,
             count(*) OVER (PARTITION BY band_id, band_key) AS bsz,
             min(doc_id) OVER (PARTITION BY band_id, band_key) AS rep
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sized a JOIN sized b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id AND a.bsz <= {max_bucket}
        UNION ALL
        SELECT rep AS doc_a, doc_id AS doc_b
        FROM sized WHERE bsz > {max_bucket} AND doc_id <> rep
      ) u
    )"""


def _minhash_oracle() -> str:
    matches = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_K)
    )
    return f"""
    WITH {_sig_cte()},
    {_cand_cte()}
    SELECT c.doc_a, c.doc_b, round(({matches}) / {_K}.0, 4) AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    WHERE ({matches}) / {_K}.0 >= 0.75
    """


def minhash_signatures(spark, sf_dir: str, k: int = _K) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) — one zero-shuffle Arrow map stage: the numpy
    kernel emits each document's combined signature row directly (see
    _minhash_gen for the r7 rationale and the retired explode+groupBy
    shape). Values are bit-identical to the SQL formulation."""
    assert k <= len(MINHASH_PARAMS), f"k={k} exceeds the hash family"
    schema = ", ".join(["doc_id bigint"] + [f"mh{i} bigint" for i in range(k)])
    return _doc_texts(spark, sf_dir).mapInArrow(_minhash_gen(k), schema)


def lsh_candidate_pairs(
    sig: DataFrame, k: int = _K, bands: int = _BANDS,
    max_bucket: int | None = _MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: docs sharing at least one LSH band.
    Explode each signature into `bands` (band_id, band_key) rows, equi-join
    on the band — the shuffle key is the band key, so each bucket joins
    locally and the O(n²) pair space is never materialized.

    ``max_bucket`` is the hot-bucket guard (round-2 telemetry: the largest
    band bucket at sf0.1 holds 742 docs → 275k pairs from one bucket; a
    boilerplate-heavy real corpus is far worse). Buckets above the bound
    switch from all-pairs to STAR pairing — every member pairs with the
    bucket's min doc_id — which keeps the bucket connected for
    cluster-based dedup (union-find over pairs reaches every member) while
    linearizing its pair count. Same-band docs are near-identical by
    construction, so the representative transitively stands for the bucket.
    DEFAULT-ON (r3): the guard is the pipeline default AND what the driver
    gate oracle-checks (_cand_cte replays the deterministic star pairing in
    DuckDB); max_bucket=None opts out for research runs."""
    assert k % bands == 0, "k must divide evenly into bands"
    rows_per_band = k // bands
    band_structs = [
        F.struct(
            F.lit(t).alias("band_id"),
            F.concat_ws(
                ",", *[f"mh{t * rows_per_band + j}" for j in range(rows_per_band)]
            ).alias("band_key"),
        )
        for t in range(bands)
    ]
    bands_df = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")

    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key")
        sized = bands_df.withColumn("bsz", F.count(F.lit(1)).over(w)).withColumn(
            "rep", F.min("doc_id").over(w)
        )
        # three consumers below (self-join a/b + star) would otherwise each
        # re-evaluate the signature pipeline and the sizing window; the
        # cached state is one row per (doc, band) — tiny relative to corpus
        sized.cache()
        small = sized.filter(F.col("bsz") <= max_bucket).drop("bsz", "rep")
        a = small.alias("a")
        b = small.alias("b")
        small_pairs = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        star_pairs = (
            sized.filter((F.col("bsz") > max_bucket) & (F.col("doc_id") != F.col("rep")))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
        return small_pairs.union(star_pairs).dropDuplicates(["doc_a", "doc_b"])

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_lsh_pairs(
    spark, sf_dir: str, k: int = _K, bands: int = _BANDS, threshold: float = 0.75,
    max_bucket: int | None = _MAX_BUCKET,
) -> DataFrame:
    """Full MinHash+LSH dedup: signatures → band candidates (hot-bucket
    guard on by default) → full-signature estimate verify. Parameterized
    geometry; same plan at any (k, bands)."""
    sig = minhash_signatures(spark, sf_dir, k)
    sig.cache()
    pairs = lsh_candidate_pairs(sig, k, bands, max_bucket)
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    ) / F.lit(float(k))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash (k=16 universal hashes over 3-gram shingles) + LSH banding "
        "(4 bands × 4 rows — production geometry: same rows-per-band as "
        "k=128/16) with the hot-bucket guard ON: explode signatures into "
        "band keys, equi-join buckets (shuffle on band key — never the "
        "O(n²) pair space), STAR-pair buckets above 64 members "
        "(deterministic min-doc_id representative keeps them union-find-"
        "connected while linearizing the pair count), then verify "
        "candidates with the full signature at est-Jaccard >= 0.75. The "
        "DuckDB oracle replays both the banding and the star pairing. "
        "r7: signatures come from the zero-shuffle vectorized kernel.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(spark, sf_dir, k=_K, bands=_BANDS,
                             max_bucket=_MAX_BUCKET)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def _simhash_sql_full(dialect: str) -> str:
    sh = simhash_sql("text", dialect)
    return f"""
    WITH s AS (SELECT doc_id, cast({sh} as bigint) AS simhash FROM documents)
    SELECT doc_id, simhash,
           count(*) OVER (PARTITION BY simhash) AS n_bucket
    FROM s
    """


@register(
    "dedup_simhash",
    oracle=_simhash_sql_full("duckdb"),
    doc="16-bit SimHash per document (bitwise majority vote over shingle "
        "hashes) + bucket occupancy. One scan, no Python; near-dup "
        "candidates are same-bucket (or Hamming-adjacent) signatures.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: one zero-shuffle Arrow map stage — the numpy kernel computes the
    # full bit-vote SimHash per document (bit-identical integers, see
    # tests/test_npkernels.py), replacing the per-character explode +
    # 16-column vote aggregation and its shuffle (guide §2.4/§4.2).
    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        for batch in batches:
            sh = npk.simhash_batch(batch.column(1).to_pylist())
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(sh)], ["doc_id", "simhash"]
            )

    s = _doc_texts(spark, sf_dir).mapInArrow(gen, "doc_id bigint, simhash bigint")
    # docs shorter than one shingle (none in this corpus, but keep the
    # oracle's sentinel semantics): simhash = 0
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    s = d.join(s, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash")
    )
    from pyspark.sql import Window

    return s.withColumn("n_bucket", F.count(F.lit(1)).over(Window.partitionBy("simhash")))


# --------------------------------------------------------------------------
# Blocked n-gram Jaccard
# --------------------------------------------------------------------------
def _jaccard_sql(dialect: str) -> str:
    """Exact Jaccard VERIFY over the guarded LSH candidate pairs (docs
    sharing a MinHash band, hot buckets star-paired) — never an all-pairs
    or coarse-block self-join: a popular (lang, n_chars) block is quadratic
    at 100 TB, while band buckets are bounded by the guard."""
    sh = shingle_hashes_sql("text", dialect)
    if dialect == "spark":
        distinct = f"array_distinct({sh})"
        inter = "size(array_intersect(sa.s, sb.s))"
        union = "size(array_union(sa.s, sb.s))"
    else:
        distinct = f"list_distinct({sh})"
        inter = "len(list_intersect(sa.s, sb.s))"
        union = "len(list_distinct(sa.s || sb.s))"
    return f"""
    WITH {_sig_cte()},
    {_cand_cte()},
    sh AS (SELECT doc_id, {distinct} AS s FROM documents),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             cast({inter} as double) / {union} AS jac
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, round(jac, 4) AS jaccard
    FROM verified WHERE jac >= 0.5
    """


@register(
    "dedup_ngram_jaccard",
    oracle=_jaccard_sql("duckdb"),
    doc="Exact 3-gram Jaccard as the VERIFY stage over the guarded "
        "MinHash-LSH candidate pairs: band-bucket equi-join generates "
        "candidates (hot buckets star-paired — bounded at any scale); the "
        "verify computes |A∩B| by joining candidates to the exploded "
        "distinct (doc_id, shingle) rows on both sides and counting "
        "matches, |A∪B| = |A|+|B|−|A∩B| from per-doc distinct counts. "
        "Verify-shuffle bytes therefore scale with CANDIDATE count (narrow "
        "3-column rows), never with document length — the earlier "
        "collect_set formulation shipped each doc's full shingle array "
        "through two joins, a per-char network cost at 100 TB.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: signatures come from the zero-shuffle numpy kernel (see
    # _minhash_gen); recomputing shingles for the verify stage is now a
    # cheap vectorized pass over CANDIDATE docs only, so the old corpus-wide
    # per-character explode cache is gone entirely.
    sig = minhash_signatures(spark, sf_dir, _K)
    sig.cache()
    pairs = lsh_candidate_pairs(sig, _K, _BANDS, _MAX_BUCKET)
    # Automated broadcast decision (r4 VERDICT #6): cache the pair list and
    # count it — sig is already cached, so the count's marginal cost is the
    # band join, which the cache then reuses for the verify. Below the
    # ceiling (and the r7 character-volume ceiling checked next) → the
    # array fast path with broadcast candidate metadata; above → the
    # narrow-row formulation with plain joins, AQE chooses the strategy.
    # Both paths compute the identical set math (plan-audited equality).
    pairs = pairs.cache()
    use_bc = pairs.count() <= BROADCAST_PAIRS_MAX
    _bc = F.broadcast if use_bc else (lambda df: df)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # r7: semi-join the DOCUMENT rows (one row per doc) before shingling, so
    # the shingle kernel only runs over candidates — this deletes the old
    # corpus-wide explode + the two-HashAggregate DISTINCT shuffle over one
    # row per corpus character (guide §2.3/§2.4).
    cand_texts = _doc_texts(spark, sf_dir).join(_bc(cand_docs), "doc_id", "left_semi")
    if use_bc:
        # array-broadcast volume check (see ARRAY_BC_MAX_CHARS): sum of
        # candidate n_chars via a column-pruned scan — one tiny job, same
        # class as the pairs.count() decision above
        total_chars = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "n_chars")
            .join(_bc(cand_docs), "doc_id", "left_semi")
            .agg(F.sum("n_chars"))
            .first()[0]
        )
        use_bc = total_chars is not None and total_chars <= ARRAY_BC_MAX_CHARS
    if use_bc:
        # r7 guarded FAST PATH (guide §8: broadcast the per-doc metadata,
        # stream the small rows, never fan heavy bytes out): each candidate
        # doc's sorted distinct shingle-hash ARRAY rides a broadcast into
        # two map-side joins against the (guard-bounded, already-broadcast-
        # sized) pair list, and |A∩B| is one vectorized np.intersect1d per
        # pair. This replaces the old per-shingle fan-out — |pairs| ×
        # |shingles| probe rows (~33M at sf0.1) through two joins plus a
        # 1.5M-row broadcast hash build — with |pairs| rows total. No
        # shuffle ever carries an array: pairs (16 bytes/row) are the only
        # shuffled rows, arrays move once inside the broadcast.
        arr = cand_texts.mapInArrow(
            _shingle_array_gen(), "doc_id bigint, hs array<int>, n bigint"
        )
        # Join the SAME broadcast relation twice via aliases: the two
        # exchanges are canonically identical, so the runtime may reuse one
        # built relation for both joins; either way each build is sized by
        # CANDIDATES (the guard-bounded doc set), never the corpus.
        aa = F.broadcast(arr).alias("aa")
        ab = F.broadcast(arr).alias("ab")
        j = (
            pairs.join(aa, F.col("doc_a") == F.col("aa.doc_id"))
            .join(ab, F.col("doc_b") == F.col("ab.doc_id"))
            .select(
                "doc_a", "doc_b",
                F.col("aa.n").alias("n_a"), F.col("ab.n").alias("n_b"),
                F.col("aa.hs").alias("ha"), F.col("ab.hs").alias("hb"),
            )
        )
        inter = j.mapInArrow(
            _pair_intersect_gen(),
            "doc_a bigint, doc_b bigint, n_a bigint, n_b bigint, n_inter bigint",
        )
        jac = F.col("n_inter").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("n_inter")
        )
        return (
            inter.withColumn("jac_raw", jac)
            .filter(F.col("jac_raw") >= 0.5)  # filter BEFORE rounding (oracle does)
            .select("doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard"))
        )
    # FALLBACK above the guard — the 100 TB shape (r3 VERDICT #3): verify
    # from distinct (doc_id, h) rows; every shuffled row stays 2-3 narrow
    # columns (no row ever carries a whole document's set, so a 1 MB
    # document cannot produce a 1 MB shuffle row, and AQE can split skewed
    # partitions freely); |A∩B| = join candidates to the per-shingle rows
    # on both sides and count matches. Verify-shuffle bytes scale with
    # candidate count, never with document length.
    dist = cand_texts.mapInArrow(_shingle_distinct_gen(), "doc_id bigint, h bigint")
    dist.cache()
    sizes = dist.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ra = dist.select(F.col("doc_id").alias("doc_a"), "h")
    rb = dist.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        ra.join(pairs, "doc_a")
        .join(rb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.5)  # filter BEFORE rounding (oracle does)
        .select("doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Cluster dedup: connected components over verified near-dup pairs +
# survivor selection — pairs alone don't deduplicate a corpus; the curation
# step needs one canonical document per duplicate CLUSTER.
# --------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame, max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, cluster) via deterministic min-label propagation over an edge
    list: label(x) starts at x; each iteration every node takes the min of
    its own and its neighbors' labels; fixpoint = min node id reachable.

    Scale shape: per iteration ONE groupBy(node) shuffle over the edge list
    (edges are symmetrized once); iterations needed = cluster diameter,
    which the star-pairing hot-bucket guard keeps tiny (stars have diameter
    2). The driver-side convergence check is one small count() per
    iteration — bounded metadata work, not data movement. DuckDB replays
    the same fixpoint as a recursive reachability CTE.

    Fault tolerance (r5 VERDICT #1): ``localCheckpoint`` stores blocks on
    executors only, so on a real cluster an executor loss mid-fixpoint
    fails the job instead of recomputing. Pass ``checkpoint_dir`` (or set
    $SPARK_GRAFT_CHECKPOINT_DIR) to switch every per-iteration
    materialization to a RELIABLE ``checkpoint()`` on shared storage —
    same plan, same results, survivable executors. Local runs default to
    the executor-memory path (faster, and a single-JVM loss is fatal
    anyway)."""
    import os

    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if checkpoint_dir:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def mat(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def mat(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # materialize (NOT cache) at every step: iterative self-referencing
    # plans otherwise nest the whole upstream pipeline once per iteration —
    # plan depth (and codegen size) grows without bound and the JVM OOMs.
    # The materialized state is only the edge list + one label per node.
    edges = mat(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
    )
    labels = mat(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
    )
    for _ in range(max_iters):
        neighbor = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "cluster")
        )
        new_labels = mat(
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster"))
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("cluster", "old"), "node")
            .filter(F.col("cluster") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _clusters_sql() -> str:
    """Recursive reachability over the verified pair set: cluster(x) = min
    node reachable from x (the min-label-propagation fixpoint). The edge
    chain is MATERIALIZED — DuckDB inlines plain CTEs per reference, which
    would re-derive the 16-hash signature scan on every recursion step."""
    matches = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_K)
    )
    sig_body = _sig_cte().split(" AS ", 1)[1]
    return f"""
    WITH RECURSIVE sig AS MATERIALIZED {sig_body},
    {_cand_cte()},
    verified AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
      WHERE ({matches}) / {_K}.0 >= 0.75
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
    SELECT d.doc_id,
           cast(coalesce(c.cluster, d.doc_id) as bigint) AS cluster,
           cast(CASE WHEN coalesce(c.cluster, d.doc_id) = d.doc_id
                THEN 1 ELSE 0 END as int) AS is_survivor
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """


@register(
    "dedup_clusters",
    oracle=_clusters_sql(),
    doc="Corpus-curation dedup: connected components (deterministic "
        "min-label propagation; one groupBy shuffle per iteration, "
        "diameter-bounded thanks to the star-pairing guard) over the "
        "guarded+verified MinHash pair set, then survivor selection — the "
        "cluster's min doc_id is canonical, everything else is a duplicate "
        "to drop. One row per corpus document (singletons survive as their "
        "own cluster). DuckDB replays the fixpoint as a recursive "
        "reachability CTE.",
    gated=True,  # the curation money-path holds a driver slot (r5);
                 # f15_json_props vacated the window to make room
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_lsh_pairs(spark, sf_dir)
    comp = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id",
        F.coalesce("cluster", F.col("doc_id")).cast("bigint").alias("cluster"),
        (F.coalesce("cluster", F.col("doc_id")) == F.col("doc_id"))
        .cast("int")
        .alias("is_survivor"),
    )


# --------------------------------------------------------------------------
# Corpus curation: the end-to-end training-data filter — near-dup survivor
# selection composed with the quality gate, per-source accounting.
# --------------------------------------------------------------------------
def _curation_sql(dialect: str) -> str:
    from .textops import _p6_sql

    recursive = "RECURSIVE " if dialect == "duckdb" else ""
    clusters = _clusters_sql() if dialect == "duckdb" else None
    if dialect == "spark":
        raise AssertionError("spark side is composed from DataFrames")
    return f"""
    WITH {recursive}surv AS ({clusters.strip()}),
    q AS ({_p6_sql("duckdb")})
    SELECT d.source,
           count(*) AS n_docs,
           sum(CASE WHEN s.is_survivor = 0 THEN 1 ELSE 0 END)::BIGINT AS n_dropped_dup,
           sum(CASE WHEN s.is_survivor = 1
                     AND q.quality IN ('CORRUPTED', 'LOW')
                THEN 1 ELSE 0 END)::BIGINT AS n_dropped_quality,
           sum(CASE WHEN s.is_survivor = 1
                     AND q.quality NOT IN ('CORRUPTED', 'LOW')
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM documents d
    JOIN surv s ON s.doc_id = d.doc_id
    JOIN q ON q.doc_id = d.doc_id
    GROUP BY d.source
    """


@register(
    "corpus_curation",
    oracle=_curation_sql("duckdb"),
    doc="The full curation funnel a training-data pipeline runs before "
        "tokenization: near-dup clusters → keep one survivor per cluster → "
        "drop LOW/CORRUPTED quality → per-source kept/dropped accounting. "
        "Pure composition of dedup_clusters and the P6 quality formula — "
        "one extra doc_id join each, then a tiny rollup; at 100 TB the "
        "joins are co-partitioned on doc_id.",
    gated=True,  # the end-to-end funnel a training-data user actually runs
                 # holds a driver slot (r5); funnel_conversion vacated
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import p6_text_quality

    surv = dedup_clusters(spark, sf_dir).select("doc_id", "is_survivor")
    q = p6_text_quality(spark, sf_dir).select("doc_id", "quality")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = d.join(surv, "doc_id").join(q, "doc_id")
    dropped_dup = F.when(F.col("is_survivor") == 0, 1).otherwise(0)
    low = F.col("quality").isin("CORRUPTED", "LOW")
    dropped_q = F.when((F.col("is_survivor") == 1) & low, 1).otherwise(0)
    kept = F.when((F.col("is_survivor") == 1) & ~low, 1).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dropped_dup).cast("bigint").alias("n_dropped_dup"),
        F.sum(dropped_q).cast("bigint").alias("n_dropped_quality"),
        F.sum(kept).cast("bigint").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (label-blocked)
# --------------------------------------------------------------------------
def _emb_cte(dialect: str) -> str:
    if dialect == "spark":
        norm = (
            "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (acc, v) -> acc + v))"
        )
    else:
        norm = (
            "sqrt(list_reduce(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), "
            "(acc, v) -> acc + v))"
        )
    return f"e AS (SELECT vec_id, label, embedding, {norm} AS nrm FROM embeddings)"


def _dot(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}.embedding, {b}.embedding, "
            "(x, y) -> cast(x as double) * cast(y as double)), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(generate_series(1, len({a}.embedding)), "
        f"i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE), (acc, v) -> acc + v)"
    )


# --------------------------------------------------------------------------
# Multi-table random-hyperplane sign-LSH over embeddings (shared by the
# embedding near-dup verify and ann_lsh_topk). Hyperplane weights are a
# deterministic integer lattice w(t,b,i) = ((i*3 + b*5 + t*11) % 7) - 3 so
# both engines derive bit-identical signatures (at production scale you'd
# broadcast genuinely random Gaussian planes; the plan is unchanged).
# --------------------------------------------------------------------------
SIGNLSH_TABLES = 2
SIGNLSH_BITS = 8  # per table → 2×8 = 16 signature bits total


def _plane_dot(dialect: str, t: int, b: int) -> str:
    w = f"(((i*3 + {b}*5 + {t}*11) % 7) - 3)"
    if dialect == "spark":
        return (
            f"aggregate(transform(sequence(1, size(embedding)), "
            f"i -> cast(element_at(embedding, i) as double) * cast({w} as double)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(generate_series(1, len(embedding)), "
        f"i -> embedding[i]::DOUBLE * ({w})::DOUBLE), (acc, v) -> acc + v)"
    )


def signlsh_bucket_sql(dialect: str, t: int, bits: int = SIGNLSH_BITS) -> str:
    """Integer bucket id for table t: `bits` sign bits packed into an int."""
    return "(" + " + ".join(
        f"(CASE WHEN ({_plane_dot(dialect, t, b)}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    ) + ")"


def _embcos_sql(dialect: str) -> str:
    dot = _dot(dialect, "ea", "eb")
    buckets = ", ".join(
        f"{signlsh_bucket_sql(dialect, t)} AS b{t}" for t in range(SIGNLSH_TABLES)
    )
    cand_selects = "\n      UNION\n".join(
        f"      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b\n"
        f"      FROM sigd a JOIN sigd b ON a.b{t} = b.b{t} AND a.vec_id < b.vec_id"
        for t in range(SIGNLSH_TABLES)
    )
    return f"""
    WITH {_emb_cte(dialect)},
    sigd AS (SELECT vec_id, embedding, nrm, {buckets} FROM e),
    cand AS (
{cand_selects}
    )
    SELECT doc_a, doc_b, cos_sim
    FROM (
      SELECT c.doc_a, c.doc_b,
             round(({dot}) / (ea.nrm * eb.nrm), 6) AS cos_sim
      FROM cand c
      JOIN e ea ON ea.vec_id = c.doc_a
      JOIN e eb ON eb.vec_id = c.doc_b
    )
    WHERE cos_sim >= 0.3
    """


def emb_features(spark, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, nrm, b0..b{T-1}) in ONE zero-shuffle Arrow map
    stage.

    r7 OPTIMIZATION (guide §4.2): the SQL form evaluated 16 hyperplane
    projections + the norm per vector through interpreted HOF lambdas
    (aggregate/transform/sequence — ~17 folds x d interpreted steps per
    row). The numpy kernel replicates Spark's strict left-fold IEEE
    addition order column-by-column, so norms and sign bits are
    bit-identical (tests/test_npkernels.py), at vectorized speed."""

    def gen(batches):
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        for batch in batches:
            m = npk.list_to_matrix(batch.column(1))
            arrays = [batch.column(0), batch.column(1), pa.array(npk.leftfold_norm(m))]
            for t in range(SIGNLSH_TABLES):
                arrays.append(pa.array(npk.signlsh_buckets(m, t, SIGNLSH_BITS)))
            yield pa.RecordBatch.from_arrays(
                arrays,
                ["vec_id", "embedding", "nrm"]
                + [f"b{t}" for t in range(SIGNLSH_TABLES)],
            )

    # No spread() here: the feature kernel is cheap even single-core (the
    # embeddings table is narrow), and the expensive downstream stages
    # (bucket groups / pair joins) parallelize via their own shuffle
    # partitioning — an up-front repartition only adds an exchange.
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    schema = "vec_id bigint, embedding array<float>, nrm double" + "".join(
        f", b{t} bigint" for t in range(SIGNLSH_TABLES)
    )
    return e.mapInArrow(gen, schema)


def _pair_cos_gen(id_names: list[str]):
    """mapInArrow generator over (ids..., ea, eb, na, nb) rows computing the
    RAW cosine dot/(na*nb) with the strict left-fold column loop — callers
    apply Spark's round(, 6) so HALF_UP semantics are unchanged."""

    def gen(batches):
        import pyarrow as pa

        from pdf_extractor_scripts_spark.functions import npkernels as npk

        n_ids = len(id_names)
        for batch in batches:
            a = npk.list_to_matrix(batch.column(n_ids))
            b = npk.list_to_matrix(batch.column(n_ids + 1))
            na = batch.column(n_ids + 2).to_numpy(zero_copy_only=False)
            nb = batch.column(n_ids + 3).to_numpy(zero_copy_only=False)
            cos = npk.leftfold_dot(a, b) / (na * nb)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_ids)] + [pa.array(cos)],
                id_names + ["cos_raw"],
            )

    return gen


def _bucket_cos_fn():
    """applyInPandas group kernel: all (vec_id_a < vec_id_b) cosines within
    one sign-LSH bucket, computed as 64 rank-1 updates (one per dimension)
    so every pairwise dot accumulates in the exact left-fold IEEE order.
    Blockwise over rows to bound the m×m accumulator."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        empty = pd.DataFrame(
            {
                "doc_a": np.empty(0, dtype=np.int64),
                "doc_b": np.empty(0, dtype=np.int64),
                "cos_raw": np.empty(0, dtype=np.float64),
            }
        )
        if m < 2:
            return empty
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        e = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        nrm = pdf["nrm"].to_numpy()[order]
        d = e.shape[1]
        out_a, out_b, out_c = [], [], []
        block = 2048
        for i0 in range(0, m - 1, block):
            i1 = min(i0 + block, m)
            acc = np.zeros((i1 - i0, m), dtype=np.float64)
            for j in range(d):
                acc += np.outer(e[i0:i1, j], e[:, j])
            cos = acc / np.outer(nrm[i0:i1], nrm)
            rows, cols = np.nonzero(
                np.arange(m)[None, :] > (i0 + np.arange(i1 - i0))[:, None]
            )
            out_a.append(ids[rows + i0])
            out_b.append(ids[cols])
            out_c.append(cos[rows, cols])
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "cos_raw": np.concatenate(out_c),
            }
        )

    return fn


@register(
    "dedup_embedding_cosine",
    oracle=_embcos_sql("duckdb"),
    doc="Embedding-cosine near-dup as the VERIFY stage over multi-table "
        "sign-LSH candidates (2 tables × 8 hyperplane sign bits): candidates "
        "= same bucket in ANY table (UNION of per-table equi-joins — each a "
        "co-partitioned shuffle join, never an OR-join/BNLJ), then exact "
        "cosine >= 0.3 on candidates only. Replaces the label-blocked "
        "all-pairs self-join, quadratic within hot labels at 100 TB.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 SECOND PASS (guide §8 / §2.3): the candidate bucket equi-joins +
    # per-pair attach joins shipped BOTH embeddings across the Python
    # boundary once per candidate pair — quadratic bytes in bucket size
    # (the pair count itself is the quadratic semantics). Grouping each
    # sign-LSH table by bucket instead moves every vector ONCE per table
    # (a few MB shuffled) and scores all in-bucket pairs vectorized in the
    # group kernel; the union of both tables is distinct-ed on the
    # bit-identical raw cosine, reproducing the SQL's UNION of per-table
    # candidates exactly. Parallelism = #non-empty buckets × tables (the
    # SIGNLSH_BITS knob bounds bucket size at production scale).
    feat = emb_features(spark, sf_dir)
    feat.cache()  # grouped twice (once per sign-LSH table)
    scored = None
    for t in range(SIGNLSH_TABLES):
        g = feat.select("vec_id", "embedding", "nrm", F.col(f"b{t}").alias("bk"))
        s = g.groupBy("bk").applyInPandas(
            _bucket_cos_fn(), "doc_a bigint, doc_b bigint, cos_raw double"
        )
        scored = s if scored is None else scored.union(s)
    return (
        scored.distinct()
        .withColumn("cos_sim", F.round("cos_raw", 6))
        .filter(F.col("cos_sim") >= 0.3)
        .select("doc_a", "doc_b", "cos_sim")
    )
