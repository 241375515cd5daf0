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
