"""Streamed extraction over arriving files equals the batch run over their
union, and restarting the stream does not reprocess delivered files."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pdf_extractor_scripts_spark.fixtures import corpus_df, make_corpus
from pdf_extractor_scripts_spark.oracle import extract_document
from pdf_extractor_scripts_spark.streaming.extract_stream import start_extraction_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_xstream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_extraction_matches_oracle(spark, tmpdir):
    n = 48
    docs = corpus_df(spark, n_docs=n, seed=42)
    src = os.path.join(tmpdir, "in")
    docs.repartition(6).write.parquet(src)  # 6 files → several micro-batches

    out = os.path.join(tmpdir, "out")
    ck = os.path.join(tmpdir, "stream_ck")
    q = start_extraction_stream(spark, src, out, stream_checkpoint=ck,
                                max_files_per_trigger=2)
    q.awaitTermination(180)

    got_df = spark.read.parquet(os.path.join(out, "out_spans"))
    got = {r["doc_id"]: r for r in got_df.collect()}
    assert len(got) == n

    for d in make_corpus(n, seed=42):
        exp = extract_document(d["doc_id"], d["spans"])
        g = got[d["doc_id"]]
        exp_spans = [s.as_tuple() for s in exp["out_spans"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"])
                     for s in g["out_spans"]]
        assert got_spans == exp_spans, d["doc_id"]

    # restart with the same stream checkpoint: nothing new → no duplicates
    q2 = start_extraction_stream(spark, src, out, stream_checkpoint=ck,
                                 max_files_per_trigger=2)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "out_spans")).count() == n


def test_pdf_ingest_stream_arrival_driven(spark, tmpdir):
    """Raw-file arrival stream: PDFs landing in two waves are parsed and
    extracted exactly once each (source checkpoint), outputs equal the
    oracle, and a restart with nothing new processes nothing."""
    from pdf_extractor_scripts_spark.sources.pdfparse import spans_to_pdf
    from pdf_extractor_scripts_spark.streaming.extract_stream import (
        start_pdf_ingest_stream,
    )

    docs = [
        d for d in make_corpus(30, seed=42)
        if not any(s["kind"] in ("media_text", "media_text_alt")
                   for s in d["spans"])
    ]
    assert len(docs) >= 10
    src = os.path.join(tmpdir, "landing (pdf+s)")  # metachar-safe strip
    out = os.path.join(tmpdir, "out")
    ck = os.path.join(tmpdir, "pdf_stream_ck")

    def drop(batch):
        for i, d in batch:
            p = os.path.join(src, d["doc_id"])
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(spans_to_pdf(d["spans"], xref_stream=(i % 2 == 0)))

    wave1 = list(enumerate(docs))[: len(docs) // 2]
    wave2 = list(enumerate(docs))[len(docs) // 2:]

    drop(wave1)
    q = start_pdf_ingest_stream(spark, src, out, stream_checkpoint=ck)
    q.awaitTermination(180)
    n1 = spark.read.parquet(os.path.join(out, "out_spans")).count()
    assert n1 == len(wave1)

    drop(wave2)
    q2 = start_pdf_ingest_stream(spark, src, out, stream_checkpoint=ck)
    q2.awaitTermination(180)
    got = {r["doc_id"]: r for r in
           spark.read.parquet(os.path.join(out, "out_spans")).collect()}
    assert len(got) == len(docs)  # wave-1 files NOT reprocessed/duplicated

    for _, d in wave1 + wave2:
        exp = extract_document(d["doc_id"], d["spans"])
        exp_spans = [s.as_tuple() for s in exp["out_spans"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"])
                     for s in got[d["doc_id"]]["out_spans"]]
        assert got_spans == exp_spans, d["doc_id"]

    # restart with nothing new → no extra rows
    q3 = start_pdf_ingest_stream(spark, src, out, stream_checkpoint=ck)
    q3.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "out_spans")).count() == len(docs)
