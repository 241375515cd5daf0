#!/usr/bin/env python
"""Extra (non-official) per-query benchmarks for optimization work — bench.py
is FROZEN for measurement, so isolated noop-sink timings (guide §1.4) live
here. Times each named query with df.write.format("noop") on
local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR, min of N cache-cleared
passes, and prints one JSON line.

Usage: python bench_extra.py [--passes N] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_profile",
    "p6_text_quality",
    "p3_decision_combine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
]


def main() -> None:
    passes = 2
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--passes"):
            if "=" in a:
                passes = int(a.split("=", 1)[1])
            else:
                i += 1
                passes = int(argv[i])
        else:
            args.append(a)
        i += 1
    names = args or DEFAULT

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    from pdf_extractor_scripts_spark.plans.registry import all_specs

    specs = all_specs()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM/JIT + python workers
    force(specs[names[0]].spark(spark, SF_DIR))
    spark.catalog.clearCache()

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        best = None
        samples[name] = []
        for _ in range(passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            force(specs[name].spark(spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            best = dt if best is None else min(best, dt)
        out[name] = best
    spark.stop()
    print(json.dumps({"sf": os.path.basename(SF_DIR.rstrip("/")), "cpus": CPUS,
                      "queries": out, "samples": samples}))


if __name__ == "__main__":
    main()
