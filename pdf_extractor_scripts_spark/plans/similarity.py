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
    _pair_cos_gen,
    emb_features,
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


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """round(raw, 6) in Spark (HALF_UP), per-query rank window on the
    ROUNDED score with the deterministic neighbor tie-break — the exact
    final SELECT of both oracle twins."""
    ranked = scored.withColumn("cos_sim", F.round("cos_raw", 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cos_sim"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= k).select(
        "query_id", "neighbor_id", "cos_sim", F.col("rn").cast("bigint").alias("rank")
    )


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
    # lambdas into the bit-identical left-fold numpy kernel. The candidate
    # join carries both embeddings directly (the broadcast 8-row query side
    # BNLJ-joins the corpus scan map-side), so there are NO separate attach
    # joins — one feature stage, one pair-scoring stage, one rank window.
    feat = emb_features(spark, sf_dir)
    feat.cache()  # query side + corpus side
    q = feat.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = feat.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    j = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "ea", "eb", "na", "nb")
    )
    scored = j.mapInArrow(
        _pair_cos_gen(["query_id", "neighbor_id"]),
        "query_id bigint, neighbor_id bigint, cos_raw double",
    )
    return _ranked_topk(scored, 5)


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
    # and candidate cosines all come from the left-fold numpy kernels. Each
    # per-table bucket equi-join carries both embeddings (the 32-query side
    # broadcasts, so candidates never shuffle), each table's pairs are
    # scored in one Arrow stage, and the union dedups on the bit-identical
    # raw cosine — reproducing the SQL's UNION-of-candidates + single-score
    # exactly, without the former per-pair attach joins.
    feat = emb_features(spark, sf_dir)
    feat.cache()  # 2 bucket joins × both sides
    q = feat.filter(F.col("vec_id") < 32)
    scored = None
    for t in range(SIGNLSH_TABLES):
        qa = q.select(
            F.col("vec_id").alias("query_id"), F.col(f"b{t}").alias("bk"),
            F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
        )
        cb = feat.select(
            F.col("vec_id").alias("neighbor_id"), F.col(f"b{t}").alias("bk"),
            F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
        )
        j = (
            F.broadcast(qa)
            .join(cb, "bk")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "ea", "eb", "na", "nb")
        )
        s = j.mapInArrow(
            _pair_cos_gen(["query_id", "neighbor_id"]),
            "query_id bigint, neighbor_id bigint, cos_raw double",
        )
        scored = s if scored is None else scored.union(s)
    return _ranked_topk(scored.distinct(), 3)
