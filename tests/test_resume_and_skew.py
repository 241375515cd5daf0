"""Resume tier (kill-after-partition-k, rerun, assert identical + no dupes)
and skew tier (heavy docs isolated by salting) — SURVEY.md §5.2."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from pdf_extractor_scripts_spark.fixtures import corpus_df
from pdf_extractor_scripts_spark.operators.checkpoint import with_partition_key
from pdf_extractor_scripts_spark.operators.skew import with_weight, salted_repartition
from pdf_extractor_scripts_spark.plans.pipeline import run_with_checkpoint

N_DOCS = 60


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="spark_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_resume_is_idempotent_at_bucket_granularity(spark, ckpt_dir):
    docs = corpus_df(spark, n_docs=N_DOCS, seed=42)
    keyed = with_partition_key(docs)

    # "kill after partition k": first run only sees buckets < 32
    partial = keyed.filter(F.col("partition_key") < 32).drop("partition_key")
    n1 = run_with_checkpoint(spark, partial, ckpt_dir, run_id="r1")
    assert 0 < n1 < N_DOCS

    # rerun over the FULL corpus: completed buckets must be skipped
    n2 = run_with_checkpoint(spark, docs, ckpt_dir, run_id="r1")
    assert n1 + n2 == N_DOCS

    out = spark.read.parquet(f"{ckpt_dir}/out_spans")
    assert out.count() == N_DOCS
    assert out.select("doc_id").distinct().count() == N_DOCS  # no duplicates

    # a third run is a no-op
    n3 = run_with_checkpoint(spark, docs, ckpt_dir, run_id="r1")
    assert n3 == 0

    ck = spark.read.parquet(f"{ckpt_dir}/checkpoints")
    assert ck.filter(F.col("status") != "done").count() == 0
    mx = spark.read.parquet(f"{ckpt_dir}/metrics")
    assert mx.filter(F.col("metric") == "docs").agg(F.sum("value")).first()[0] == N_DOCS


def test_checkpoint_key_stable_across_parallelism(spark):
    """Bucket ids must not depend on physical partitioning (SURVEY.md
    §7.3(4)) — same doc_id → same partition_key at any parallelism."""
    docs = corpus_df(spark, n_docs=30, seed=42)
    k1 = {r["doc_id"]: r["partition_key"]
          for r in with_partition_key(docs.repartition(2)).select("doc_id", "partition_key").collect()}
    k2 = {r["doc_id"]: r["partition_key"]
          for r in with_partition_key(docs.repartition(16)).select("doc_id", "partition_key").collect()}
    assert k1 == k2


def test_salting_isolates_heavy_docs(spark):
    docs = corpus_df(spark, n_docs=40, seed=42)
    df = salted_repartition(with_weight(docs, heavy_span_threshold=400), 8)
    pid = df.withColumn("pid", F.spark_partition_id())
    heavy = pid.filter(F.col("is_heavy") == 1).select("pid", "doc_id").collect()
    assert len(heavy) >= 1  # the skew-tail doc exists
    # no physical partition holds two heavy docs
    by_pid: dict[int, int] = {}
    for r in heavy:
        by_pid[r["pid"]] = by_pid.get(r["pid"], 0) + 1
    assert max(by_pid.values()) == 1
