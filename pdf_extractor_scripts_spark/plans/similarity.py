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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, load_table
from .dedup import (
    SIGNLSH_TABLES,
    _dot,
    _emb_cte,
    emb_features,
    pair_cosines,
    signlsh_bucket_sql,
)


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
    # r7 (guide §4.2/§3.1): norms + per-pair dots move from interpreted HOF
    # lambdas into the bit-identical left-fold numpy kernel; the tiny query
    # side is broadcast explicitly so the corpus scan stays map-only.
    feat = emb_features(spark, sf_dir)
    feat.cache()  # query side + corpus side + both attach joins
    q = feat.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"))
    c = feat.select(F.col("vec_id").alias("neighbor_id"))
    cand = F.broadcast(q).join(
        c, F.col("query_id") != F.col("neighbor_id")
    )
    scored = pair_cosines(cand, feat, "query_id", "neighbor_id")
    ranked = scored.withColumn("cos_sim", F.round("cos_raw", 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cos_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= 5).select(
        "query_id", "neighbor_id", "cos_sim", F.col("rn").cast("bigint").alias("rank")
    )


# --------------------------------------------------------------------------
# Multi-table sign-LSH approximate top-k (2 tables × 8 hyperplane sign bits)
# --------------------------------------------------------------------------
def _lsh_sql(dialect: str) -> str:
    dot = _dot(dialect, "ea", "eb")
    buckets = ", ".join(
        f"{signlsh_bucket_sql(dialect, t)} AS b{t}" for t in range(SIGNLSH_TABLES)
    )
    cand_selects = "\n      UNION\n".join(
        f"      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id\n"
        f"      FROM q JOIN sigd c ON q.b{t} = c.b{t} AND q.vec_id <> c.vec_id"
        for t in range(SIGNLSH_TABLES)
    )
    return f"""
    WITH {_emb_cte(dialect)},
    sigd AS (SELECT vec_id, embedding, nrm, {buckets} FROM e),
    q AS (SELECT * FROM sigd WHERE vec_id < 32),
    cand AS (
{cand_selects}
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(({dot}) / (ea.nrm * eb.nrm), 6) AS cos_sim
      FROM cand c
      JOIN e ea ON ea.vec_id = c.query_id
      JOIN e eb ON eb.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, cast(rn as bigint) AS rank
    FROM ranked WHERE rn <= 3
    """


@register(
    "ann_lsh_topk",
    oracle=_lsh_sql("duckdb"),
    doc="Approximate k-NN via MULTI-TABLE sign-LSH: 2 independent tables of "
        "8 hyperplane sign bits each (16 signature bits total; deterministic "
        "integer-lattice planes so both engines agree bit-for-bit). Probes "
        "union the per-table bucket equi-joins — each a co-partitioned "
        "shuffle join on its bucket id — then exact-score only the "
        "candidates. At 100 TB a probe touches ~corpus/256 per table, not "
        "corpus/8 as the old single-table 3-bit variant did; recall is "
        "recovered by the second table, the standard LSH recall/cost knob.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: same kernel treatment as ann_bruteforce_topk — bucket bits, norms
    # and candidate cosines all come from the left-fold numpy kernels; the
    # per-table bucket equi-joins and the final per-query rank window keep
    # their r6 plan shape.
    feat = emb_features(spark, sf_dir)
    feat.cache()  # 2 bucket joins × both sides + both attach joins
    q = feat.filter(F.col("vec_id") < 32)
    cand = None
    for t in range(SIGNLSH_TABLES):
        qa = q.select(F.col("vec_id").alias("query_id"), F.col(f"b{t}").alias("bk"))
        cb = feat.select(F.col("vec_id").alias("neighbor_id"), F.col(f"b{t}").alias("bk"))
        c = (
            qa.join(cb, "bk")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        cand = c if cand is None else cand.union(c)
    cand = cand.distinct()
    scored = pair_cosines(cand, feat, "query_id", "neighbor_id")
    ranked = scored.withColumn("cos_sim", F.round("cos_raw", 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cos_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "query_id", "neighbor_id", "cos_sim", F.col("rn").cast("bigint").alias("rank")
    )
