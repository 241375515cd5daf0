"""Similarity search over the embedding column — brute-force cosine top-k as
the exact baseline, and an LSH-bucketed (random-hyperplane-style sign
signature) variant as the scale path.

Scale design: brute-force broadcasts the (tiny) query set against the corpus —
a map-only pass, no shuffle, then a per-query top-k window. The LSH variant
buckets the corpus by sign signature so each probe only scans its bucket; the
bucket id is the shuffle/cluster key. Both are pure Spark SQL (fold-based dot
products over array<float> cast to double) so the DuckDB oracle matches
bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, load_table
from .dedup import _emb_cte, _dot


# --------------------------------------------------------------------------
# Brute-force cosine top-k
# --------------------------------------------------------------------------
def _bf_sql(dialect: str) -> str:
    dot = _dot(dialect, "q", "c")
    return f"""
    WITH {_emb_cte(dialect)},
    q AS (SELECT * FROM e WHERE vec_id < 8),
    c AS (SELECT * FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(({dot}) / (q.nrm * c.nrm), 6) AS cos_sim
      FROM q JOIN c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, cast(rn as bigint) AS rank
    FROM ranked WHERE rn <= 5
    """


@register(
    "ann_bruteforce_topk",
    oracle=_bf_sql("duckdb"),
    doc="Exact k-NN baseline: 8 query vectors × full corpus cosine, top-5 "
        "per query. In Spark the query side is broadcast (map-only scan of "
        "the corpus); ranking is a per-query window on the rounded score "
        "with a deterministic id tie-break.",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_bf_sql("spark"))


# --------------------------------------------------------------------------
# LSH-bucketed approximate top-k (sign-signature hyperplane buckets)
# --------------------------------------------------------------------------
def _lsh_sql(dialect: str) -> str:
    dot = _dot(dialect, "q", "c")
    if dialect == "spark":
        sig = (
            "(CASE WHEN cast(element_at(embedding, 1) as double) > 0 THEN 4 ELSE 0 END"
            " + CASE WHEN cast(element_at(embedding, 2) as double) > 0 THEN 2 ELSE 0 END"
            " + CASE WHEN cast(element_at(embedding, 3) as double) > 0 THEN 1 ELSE 0 END)"
        )
    else:
        sig = (
            "(CASE WHEN embedding[1]::DOUBLE > 0 THEN 4 ELSE 0 END"
            " + CASE WHEN embedding[2]::DOUBLE > 0 THEN 2 ELSE 0 END"
            " + CASE WHEN embedding[3]::DOUBLE > 0 THEN 1 ELSE 0 END)"
        )
    return f"""
    WITH {_emb_cte(dialect)},
    sigd AS (SELECT vec_id, label, embedding, nrm, {sig} AS bucket FROM e),
    q AS (SELECT * FROM sigd WHERE vec_id < 32),
    c AS (SELECT * FROM sigd),
    scored AS (
      SELECT q.vec_id AS query_id, q.bucket AS bucket, c.vec_id AS neighbor_id,
             round(({dot}) / (q.nrm * c.nrm), 6) AS cos_sim
      FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, bucket, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, bucket, neighbor_id, cos_sim, cast(rn as bigint) AS rank
    FROM ranked WHERE rn <= 3
    """


@register(
    "ann_lsh_topk",
    oracle=_lsh_sql("duckdb"),
    doc="Approximate k-NN: random-hyperplane-style LSH (3 sign bits of the "
        "leading dimensions → 8 buckets), probes only scan their bucket. "
        "The bucket id is the equi-join/shuffle key — at 100 TB each bucket "
        "is a co-partitioned join, not a cross join.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_lsh_sql("spark"))
