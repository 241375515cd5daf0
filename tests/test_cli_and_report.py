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


def test_spark_submit_pyfiles_ship(tmpdir):
    """North-rule ship form: `spark-submit --py-files engine.zip job.py`
    from a cwd with NO repo checkout — the engine must come entirely from
    the shipped zip (driver + executors)."""
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    zip_path = os.path.join(str(tmpdir), "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_pyfiles_zip.py"), zip_path],
        check=True, capture_output=True,
    )
    job = os.path.join(str(tmpdir), "job.py")
    with open(job, "w") as f:
        f.write(
            "import sys\n"
            "from pyspark.sql import SparkSession\n"
            "spark = (SparkSession.builder.appName('pyfiles-smoke')"
            ".config('spark.sql.shuffle.partitions','4').getOrCreate())\n"
            "from pdf_extractor_scripts_spark.fixtures import corpus_df\n"
            "from pdf_extractor_scripts_spark.plans.pipeline import run_with_checkpoint\n"
            "docs = corpus_df(spark, n_docs=16, seed=42)\n"
            "n = run_with_checkpoint(spark, docs, sys.argv[1], run_id='submit')\n"
            "print(f'SUBMIT_OK processed={n}')\n"
            "spark.stop()\n"
        )
    out_dir = os.path.join(str(tmpdir), "out")
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path, job, out_dir],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmpdir),  # no repo on sys.path here
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "SUBMIT_OK processed=16" in r.stdout, r.stderr[-2000:]


def test_cli_pdf_ingestion_end_to_end(spark, tmpdir):
    """--input-format pdf: a directory tree of REAL PDF files (both the 1.4
    and 1.5 layouts, vendor subdirs, spaces in names) is byte-parsed,
    vendor-detected on the relative path, and batch-extracted with
    checkpointing — the complete raw-file story through the CLI surface."""
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.sources.pdfparse import spans_to_pdf

    # regex metacharacters + literal '+' in --input must not break the
    # doc_id prefix strip (ADVICE r2: the old regexp-based strip threw or
    # mis-matched, and url_decode's form semantics ate literal '+')
    src = os.path.join(tmpdir, "pdf+s (in)")
    docs = [
        d for d in make_corpus(24, seed=42)
        if not any(s["kind"] in ("media_text", "media_text_alt") for s in d["spans"])
    ]
    for i, d in enumerate(docs):
        path = os.path.join(src, d["doc_id"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(spans_to_pdf(d["spans"], xref_stream=(i % 2 == 0)))

    out = os.path.join(tmpdir, "pdf_out")
    r = _run_cli(["--mode", "batch", "--input", src, "--input-format", "pdf",
                  "--output", out, "--run-id", "pdfcli"])
    assert r.returncode == 0, r.stderr[-1500:]
    assert f"processed {len(docs)} documents" in r.stdout

    got = spark.read.parquet(os.path.join(out, "out_spans"))
    ids = {row["doc_id"] for row in got.select("doc_id").collect()}
    assert ids == {d["doc_id"] for d in docs}  # relative paths, decoded
    # extraction really happened: every text-route doc carries output spans
    assert got.filter("route = 'text' and size(out_spans) > 0").count() > 0


def test_batch_summary_reference_shape(spark, tmpdir):
    """batch_summary mirrors the reference's batch-statistics shape
    (batch_processor.py:321-403): one row of totals + success rate +
    method-vocabulary counts + confidence min/avg/max, over COMMITTED
    outputs only, and internally consistent with quality_report."""
    from pdf_extractor_scripts_spark.operators.checkpoint import batch_summary

    docs = corpus_df(spark, n_docs=60, seed=42)
    run_with_checkpoint(spark, docs, str(tmpdir), run_id="bs")
    row = batch_summary(spark, str(tmpdir)).collect()
    assert len(row) == 1
    s = row[0]
    assert s["total_files"] == 60
    assert s["successful_extractions"] + s["failed_extractions"] == 60
    assert s["success_rate_percent"] == round(
        100.0 * s["successful_extractions"] / 60, 2)
    assert (s["method_text_extraction"] + s["method_ocr"]
            + s["method_hybrid"]) == 60
    assert s["method_text_extraction"] > 0 and s["method_ocr"] > 0
    assert 0.0 <= s["min_confidence_score"] <= s["average_confidence_score"] \
        <= s["max_confidence_score"] <= 1.0
    rep = {(r["vendor"], r["route"]): r for r in quality_report(spark, str(tmpdir)).collect()}
    assert sum(r["n_docs"] for r in rep.values()) == 60


def test_bench_best_records_per_sf(tmp_path, monkeypatch):
    """The bench retry baseline is PER SCALE FACTOR: a smoke run at
    sf0.001 must never clobber the sf0.1 rolling-min table (it did
    once), and the legacy single-sf file shape still reads."""
    import json

    import bench

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    os.makedirs(tmp_path / "BENCH")
    legacy = {"sf": "sf0.1", "queries": {"q1": 1.5, "q2": 2.0}}
    with open(tmp_path / "BENCH" / "best_records.json", "w") as f:
        json.dump(legacy, f)

    assert bench._stored_records() == {"sf0.1": {"q1": 1.5, "q2": 2.0}}

    # an sf0.001 update adds its own table without touching sf0.1
    monkeypatch.setattr(bench, "SF_DIR", "/x/sf0.001")
    bench._update_best_records({}, {"q1": 0.1})
    t = bench._stored_records()
    assert t["sf0.1"] == {"q1": 1.5, "q2": 2.0}
    assert t["sf0.001"] == {"q1": 0.1}

    # an sf0.1 run reads its own records and only improves downward
    monkeypatch.setattr(bench, "SF_DIR", "/x/sf0.1")
    assert bench._best_records() == {"q1": 1.5, "q2": 2.0}
    bench._update_best_records(bench._best_records(), {"q1": 1.8, "q2": 1.2})
    t = bench._stored_records()
    assert t["sf0.1"] == {"q1": 1.5, "q2": 1.2}
    assert t["sf0.001"] == {"q1": 0.1}
