#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the end-to-end
extraction pipeline over the deterministic synthetic spans corpus, and prints
ONE JSON line:

    {"metric": ..., "value": <docs/sec>, "unit": "docs/sec",
     "queries": {name: sec, ...}, "sf": ..., ...}

--scaling mode: the north-rule evidence — the SAME extraction job at two
parallelism levels (local[N] and local[4N], N=$SPARK_GRAFT_SCALE_N default 8)
on the SAME input, reporting throughput at both plus scaling efficiency
eff = thr(4N) / (4 * thr(N)); results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))

# headline query subset: one per operator family, weighted toward the ones
# with real shuffles/joins.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "j4_asof_attribution",
    "j6_order_line_grouping",
    "t3_topk_orders",
    "p3_decision_combine",
    "p6_text_quality",
    "l4_spacing_reconstruct",
    "l8_page_concat",
    "f14_totals_roundtrip",
    "text_token_count",
    "text_fingerprint",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "stream_hourly_window",
]

# synthetic extraction corpus size per sf (docs)
N_DOCS_BY_SF = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 5000}


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_name() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def run_extraction(spark, n_docs: int, warmup: bool = True) -> float:
    """Returns wall seconds for the extraction pipeline over n_docs (corpus
    generation and python-worker warmup excluded)."""
    from pdf_extractor_scripts_spark.fixtures import corpus_df
    from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline

    if warmup:
        w = corpus_df(spark, n_docs=64, seed=7).localCheckpoint(eager=True)
        _force(run_pipeline(w))
    docs = corpus_df(spark, n_docs=n_docs, seed=42).localCheckpoint(eager=True)
    t0 = time.time()
    _force(run_pipeline(docs))
    return time.time() - t0


def main() -> None:
    from pdf_extractor_scripts_spark.plans.registry import all_queries

    sf = _sf_name()
    n_docs = N_DOCS_BY_SF.get(sf, 1000)
    spark = make_session(CPUS)
    qspecs = all_queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _force(qspecs[name].spark(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    ext_sec = run_extraction(spark, n_docs)
    timings["extract_pipeline"] = round(ext_sec, 3)
    docs_per_sec = round(n_docs / ext_sec, 2)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "end-to-end extraction throughput (synthetic interleaved spans corpus) + headline query suite",
                "value": docs_per_sec,
                "unit": "docs/sec",
                "queries": timings,
                "sf": sf,
                "extract_docs": n_docs,
                "query_suite_sec": round(sum(v for k, v in timings.items() if k != "extract_pipeline"), 3),
                "cpus": CPUS,
            }
        )
    )


def scaling() -> None:
    """North-rule scaling evidence: same job, local[N] vs local[4N]."""
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "6000"))
    results = {}
    for cores in (SCALE_N, 4 * SCALE_N):
        spark = make_session(cores)
        sec = run_extraction(spark, n_docs)
        spark.stop()
        results[cores] = {"sec": round(sec, 2), "docs_per_sec": round(n_docs / sec, 1)}

    thr_n = results[SCALE_N]["docs_per_sec"]
    thr_4n = results[4 * SCALE_N]["docs_per_sec"]
    eff = round(thr_4n / (4 * thr_n), 3)
    out = {
        "metric": "scaling efficiency N->4N (extraction pipeline)",
        "value": eff,
        "unit": "efficiency",
        "n_cores": SCALE_N,
        "4n_cores": 4 * SCALE_N,
        "docs": n_docs,
        "throughput": {str(k): v for k, v in results.items()},
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run (docs={n_docs})\n\n"
            f"| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[{SCALE_N}] | {results[SCALE_N]['sec']} | {thr_n} |\n"
            f"| local[{4 * SCALE_N}] | {results[4 * SCALE_N]['sec']} | {thr_4n} |\n\n"
            f"scaling efficiency = thr(4N) / (4 x thr(N)) = **{eff}** "
            f"(target >= 0.8 per BASELINE.json north rule)\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
