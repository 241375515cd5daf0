"""Deduplication queries — the training-data-pipeline dedup family: exact
(hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join), SimHash,
blocked n-gram Jaccard, and embedding-cosine near-dup.

The reference deduplicates only within a document (line items keyed on
(line_number, item_code, description[:50]), text_pdf_processor.py:1718-1735);
corpus-level dedup is the capability a 100 TB training-data pipeline adds on
top. All hashes are the engine-portable arithmetic family from
functions/portable.py so the DuckDB oracle reproduces them bit-for-bit.

Scale design: MinHash signatures are one scan + map (no shuffle); LSH banding
turns the quadratic all-pairs problem into an equi-join on (band_id, band_key)
— Spark shuffles both sides on the band key, so each bucket is joined locally.
Candidate pairs are then verified with the full signature. Blocked Jaccard
joins only within (lang, n_chars) blocks; embedding near-dup blocks on the
class label. No operator here ever materializes the O(n²) pair space.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, load_table
from ..functions.portable import (
    MOD_SHINGLE,
    MINHASH_PARAMS,
    SIMHASH_BITS,
    minhash_sql,
    simhash_sql,
    shingle_hashes_sql,
)

_K = 8  # minhash signature width; 2 bands of 4 hashes


def _shingle_rows(spark, sf_dir: str):
    """(doc_id, h) — one row per 3-gram shingle hash, via posexplode of the
    position sequence + a plain column expression for the hash.

    This is the at-scale shape: zero lambda-interpreted HOFs (the hash is
    whole-stage-codegen'd arithmetic), and every downstream signature is a
    map-side-combined hash aggregation on doc_id. The DuckDB oracle keeps
    the list-comprehension formulation — identical arithmetic, different
    physical plan.
    """
    d = load_table(spark, sf_dir, "documents")
    pos = (
        d.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            "text",
            F.explode(F.expr("sequence(1, length(text) - 2)")).alias("i"),
        )
    )
    h = (
        F.ascii(F.expr("substr(text, cast(i as int), 1)")) * 961
        + F.ascii(F.expr("substr(text, cast(i + 1 as int), 1)")) * 31
        + F.ascii(F.expr("substr(text, cast(i + 2 as int), 1)"))
    ) % F.lit(MOD_SHINGLE)
    return pos.select("doc_id", h.cast("bigint").alias("h"))


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
def _minhash_oracle() -> str:
    mh = minhash_sql("text", "duckdb", k=_K)
    sig_cols = ", ".join(f"cast({e} as bigint) AS mh{i}" for i, e in enumerate(mh))
    matches = " + ".join(f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(_K))
    band0 = " AND ".join(f"a.mh{i} = b.mh{i}" for i in range(4))
    band1 = " AND ".join(f"a.mh{i} = b.mh{i}" for i in range(4, 8))
    return f"""
    WITH sig AS (SELECT doc_id, {sig_cols} FROM documents),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ({matches}) / 8.0 AS est
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND (({band0}) OR ({band1}))
    )
    SELECT doc_a, doc_b, round(est, 4) AS est_jaccard
    FROM cand WHERE est >= 0.75
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash (k=8 universal hashes over 3-gram shingles) + LSH banding "
        "(2 bands × 4 rows): explode signatures into band keys, equi-join "
        "buckets (shuffle on band key — never the O(n²) pair space), then "
        "verify candidates with the full signature at est-Jaccard >= 0.75. "
        "The oracle states the same semantics as a predicate join, which "
        "DuckDB can afford at oracle scale.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _shingle_rows(spark, sf_dir)
    sig = rows.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MOD_SHINGLE)).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS[:_K])
        ]
    )
    sig.cache()

    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band_id"),
                    F.concat_ws(",", "mh0", "mh1", "mh2", "mh3").alias("band_key"),
                ),
                F.struct(
                    F.lit(1).alias("band_id"),
                    F.concat_ws(",", "mh4", "mh5", "mh6", "mh7").alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_K)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_K)])
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(_K)
    ) / F.lit(8.0)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= 0.75)
        .select("doc_a", "doc_b", "est_jaccard")
    )


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
    rows = _shingle_rows(spark, sf_dir)
    votes = rows.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    (F.floor(F.col("h") / F.lit(1 << b)).cast("bigint") % 2) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    simhash = sum(
        F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ).cast("bigint")
    s = votes.select("doc_id", simhash.alias("simhash"))
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
    sh = shingle_hashes_sql("text", dialect)
    if dialect == "spark":
        distinct = f"array_distinct({sh})"
        inter = "size(array_intersect(a.s, b.s))"
        union = "size(array_union(a.s, b.s))"
    else:
        distinct = f"list_distinct({sh})"
        inter = "len(list_intersect(a.s, b.s))"
        union = "len(list_distinct(a.s || b.s))"
    return f"""
    WITH sh AS (SELECT doc_id, lang, n_chars, {distinct} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             cast({inter} as double) / {union} AS jac
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, round(jac, 4) AS jaccard
    FROM pairs WHERE jac >= 0.5
    """


@register(
    "dedup_ngram_jaccard",
    oracle=_jaccard_sql("duckdb"),
    doc="Exact 3-gram Jaccard similarity within (lang, n_chars) blocks — "
        "the verification stage that follows LSH candidate generation. "
        "Blocking keys bound each join bucket so the pair space stays "
        "linear-ish; set sizes via array_intersect/array_union (distinct "
        "semantics on both engines).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingle sets via explode + collect_set (codegen'd hash + hash agg)
    # instead of interpreted per-element HOFs; set order is irrelevant to
    # the intersection/union sizes the oracle checks.
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    sh = (
        _shingle_rows(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
        .join(d, "doc_id")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union).alias("jac_raw"),
        )
        .filter(F.col("jac_raw") >= 0.5)  # filter BEFORE rounding (oracle does)
        .select("doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard"))
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


def _embcos_sql(dialect: str) -> str:
    dot = _dot(dialect, "a", "b")
    return f"""
    WITH {_emb_cte(dialect)}
    SELECT doc_a, doc_b, cos_sim
    FROM (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             round(({dot}) / (a.nrm * b.nrm), 6) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    WHERE cos_sim >= 0.3
    """


@register(
    "dedup_embedding_cosine",
    oracle=_embcos_sql("duckdb"),
    doc="Embedding-cosine near-duplicate candidates, blocked by class label "
        "(the ANN-free verification path): sequential-fold dot product over "
        "the float32 vectors cast to double — identical accumulation order "
        "on both engines, rounded to 6 decimals. At scale the label block "
        "is the shuffle key; within-block pairs are partition-local.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_embcos_sql("spark"))
