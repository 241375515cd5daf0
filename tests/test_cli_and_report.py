"""CLI tier (the spark-submit entry point's modes) and the operational
quality report over written outputs."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

import pyspark.sql.functions as F

from pdf_extractor_scripts_spark.fixtures import corpus_df, make_corpus
from pdf_extractor_scripts_spark.operators.checkpoint import quality_report
from pdf_extractor_scripts_spark.plans.pipeline import run_with_checkpoint
from pdf_extractor_scripts_spark.sources.spans import write_spans

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_cli_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_quality_report(spark, tmpdir):
    docs = corpus_df(spark, n_docs=60, seed=42)
    run_with_checkpoint(spark, docs, tmpdir, run_id="qr")
    rep = quality_report(spark, tmpdir)
    rows = {(r["vendor"], r["route"]): r for r in rep.collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 60
    for r in rows.values():
        assert 0.0 <= r["avg_confidence"] <= 1.0
        assert r["p10_confidence"] <= r["p90_confidence"]
    # the corrupted-generic docs (ceco-named, empty extraction) must show a
    # 100% validation-failure pocket somewhere
    assert any(r["validation_failure_rate"] == 1.0 for r in rows.values())


def _run_cli(args: list[str], timeout: int = 240) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pdf_extractor_scripts_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )


def test_cli_modes(spark, tmpdir):
    # prepare a bucketed spans table for the file-input modes
    docs = corpus_df(spark, n_docs=24, seed=42)
    src = os.path.join(tmpdir, "corpus")
    write_spans(docs, src, n_buckets=4)
    some_doc = docs.select("doc_id").first()["doc_id"]

    r = _run_cli(["--mode", "analyze", "--input", src])
    assert r.returncode == 0, r.stderr[-1500:]
    assert "vendor" in r.stdout and "route" in r.stdout

    r = _run_cli(["--mode", "single-doc", "--input", src, "--doc-id", some_doc])
    assert r.returncode == 0, r.stderr[-1500:]
    assert "field:" in r.stdout  # extracted spans printed

    out = os.path.join(tmpdir, "out")
    r = _run_cli(["--mode", "batch", "--input", src, "--output", out, "--run-id", "cli"])
    assert r.returncode == 0, r.stderr[-1500:]
    assert "processed 24 documents" in r.stdout
    got = spark.read.parquet(os.path.join(out, "out_spans"))
    assert got.count() == 24
