"""Sources tier: bucketed spans round-trip with partition pruning, and the
binaryFile ingestion shape."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pdf_extractor_scripts_spark.fixtures import corpus_df, make_corpus
from pdf_extractor_scripts_spark.sources.spans import (
    write_spans,
    read_spans,
    read_binary_docs,
    parse_binary_to_spans,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_spans_roundtrip_and_bucket_pruning(spark, tmpdir):
    docs = corpus_df(spark, n_docs=50, seed=42)
    write_spans(docs, f"{tmpdir}/corpus", n_buckets=8)

    back = read_spans(spark, f"{tmpdir}/corpus")
    assert back.count() == 50
    orig = {d["doc_id"]: d["spans"] for d in make_corpus(50, seed=42)}
    for r in back.collect():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in orig[r["doc_id"]]]
        assert got == exp, r["doc_id"]

    pruned = read_spans(spark, f"{tmpdir}/corpus", buckets=[0, 1])
    full = read_spans(spark, f"{tmpdir}/corpus")
    assert 0 < pruned.count() < full.count()
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "bucket" in plan


def test_binary_source_shape(spark, tmpdir):
    with open(f"{tmpdir}/a.pdf", "wb") as f:
        f.write(b"%PDF-1.4 fake")
    with open(f"{tmpdir}/b.txt", "wb") as f:
        f.write(b"not a pdf")
    df = read_binary_docs(spark, tmpdir)
    rows = df.collect()
    assert len(rows) == 1  # glob filtered
    assert rows[0]["doc_id"].endswith("a.pdf") and rows[0]["length"] == 13
    with pytest.raises(NotImplementedError):
        parse_binary_to_spans(df)
