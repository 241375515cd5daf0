"""Resume tier (kill-after-partition-k, rerun, assert identical + no dupes)
and skew tier (heavy docs isolated by salting) — SURVEY.md §5.2."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from pdf_extractor_scripts_spark.fixtures import corpus_df
from pdf_extractor_scripts_spark.operators.checkpoint import (
    committed_metrics,
    committed_outputs,
    with_partition_key,
)
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

    out = committed_outputs(spark, ckpt_dir)
    assert out.count() == N_DOCS
    assert out.select("doc_id").distinct().count() == N_DOCS  # no duplicates

    # a third run is a no-op
    n3 = run_with_checkpoint(spark, docs, ckpt_dir, run_id="r1")
    assert n3 == 0

    ck = spark.read.parquet(f"{ckpt_dir}/checkpoints")
    assert ck.filter(F.col("status") != "done").count() == 0
    mx = committed_metrics(spark, ckpt_dir)
    assert mx.filter(F.col("metric") == "docs").agg(F.sum("value")).first()[0] == N_DOCS


def test_crash_between_data_and_checkpoint_write_is_invisible(spark, ckpt_dir):
    """Manifest-commit semantics: a run that dies AFTER appending out_spans
    but BEFORE its checkpoint rows must leave no visible output, and the
    retry must not double-count anything."""
    from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline

    docs = corpus_df(spark, n_docs=20, seed=42)
    keyed = with_partition_key(docs)
    result = with_partition_key(run_pipeline(keyed.drop("partition_key")))
    result = result.localCheckpoint(eager=True)

    # simulate the crash window: data lands, checkpoint write never happens
    result.select(
        "partition_key", "doc_id", "vendor", "route", "out_spans",
        "validation_failed", "ocr_used", "n_pages", "extraction_confidence",
    ).withColumn("run_id", F.lit("r1")).withColumn(
        "attempt_id", F.lit("dead-attempt")
    ).write.mode("append").partitionBy("partition_key").parquet(f"{ckpt_dir}/out_spans")

    # retry of the same run: resume sees no completed buckets, reprocesses all
    n = run_with_checkpoint(spark, docs, ckpt_dir, run_id="r1")
    assert n == 20

    raw = spark.read.parquet(f"{ckpt_dir}/out_spans")
    assert raw.count() == 40  # physical at-least-once: orphans ARE on disk
    committed = committed_outputs(spark, ckpt_dir)
    assert committed.count() == 20  # ...but the visible table is exactly-once
    assert committed.select("doc_id").distinct().count() == 20
    assert committed.filter(F.col("attempt_id") == "dead-attempt").count() == 0
    mx = committed_metrics(spark, ckpt_dir)
    assert mx.filter(F.col("metric") == "docs").agg(F.sum("value")).first()[0] == 20


def test_backup_sink_snapshots_committed_outputs(spark, ckpt_dir):
    """S9 (output_consolidator.py:412-430): the backup is a self-contained
    snapshot of the COMMITTED outputs — orphan attempts excluded — plus the
    manifest; restoring it reproduces the table."""
    import pyspark.sql.functions as F2

    from pdf_extractor_scripts_spark.operators.checkpoint import (
        backup_outputs,
        restore_backup,
    )

    docs = corpus_df(spark, n_docs=16, seed=42)
    n = run_with_checkpoint(spark, docs, ckpt_dir, run_id="r1")
    assert n == 16
    # plant an orphan attempt that the snapshot must exclude
    out = spark.read.parquet(f"{ckpt_dir}/out_spans")
    out.withColumn("attempt_id", F2.lit("dead")).write.mode("append").partitionBy(
        "partition_key"
    ).parquet(f"{ckpt_dir}/out_spans")

    dest = backup_outputs(spark, ckpt_dir, label="snap_0001")
    back = restore_backup(spark, dest)
    assert back.count() == 16
    assert back.select("doc_id").distinct().count() == 16
    assert back.filter(F2.col("attempt_id") == "dead").count() == 0
    manifest = spark.read.parquet(f"{dest}/manifest")
    assert manifest.count() > 0 and set(manifest.columns) >= {
        "run_id", "partition_key", "attempt_id", "status"}
    # snapshots are immutable: a second backup under the same label refuses
    import pytest as _pytest

    with _pytest.raises(Exception):
        backup_outputs(spark, ckpt_dir, label="snap_0001")


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
