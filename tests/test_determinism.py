"""Determinism tier (SURVEY.md §7.3(1)): the extracted span sequences must be
byte-identical regardless of physical partitioning, salting, or repetition —
collect_list/shuffle nondeterminism must never leak into the contract."""

from __future__ import annotations

from pdf_extractor_scripts_spark.fixtures import corpus_df
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline


def _results(df):
    return {
        r["doc_id"]: (
            r["vendor"], r["route"], r["extraction_confidence"],
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["out_spans"]),
        )
        for r in df.collect()
    }


def test_output_invariant_to_partitioning_and_salt(spark):
    docs = corpus_df(spark, n_docs=60, seed=42)
    base = _results(run_pipeline(docs))
    variants = [
        run_pipeline(docs.coalesce(2)),
        run_pipeline(docs.repartition(16)),
        run_pipeline(docs, salt=True, n_partitions=4),
        run_pipeline(docs, salt=True, n_partitions=16),
    ]
    for i, v in enumerate(variants):
        got = _results(v)
        assert got == base, f"variant {i} diverged"


def test_rerun_is_identical(spark):
    docs = corpus_df(spark, n_docs=40, seed=42)
    a = _results(run_pipeline(docs, salt=True))
    b = _results(run_pipeline(docs, salt=True))
    assert a == b


def test_distributed_generation_equals_driver_generation(spark):
    """corpus_df_dist (mapInPandas, bench path) must produce byte-identical
    documents to corpus_df (driver-side, test path)."""
    from pdf_extractor_scripts_spark.fixtures import corpus_df_dist

    a = {r["doc_id"]: [tuple(s) for s in r["spans"]]
         for r in corpus_df(spark, n_docs=50, seed=42).collect()}
    b = {r["doc_id"]: [tuple(s) for s in r["spans"]]
         for r in corpus_df_dist(spark, n_docs=50, seed=42).collect()}
    assert a == b
