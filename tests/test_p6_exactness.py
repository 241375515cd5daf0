"""Bit-exactness of the r7 vectorized p6_text_quality kernel against the
original Spark SQL formulation (_p6_sql('spark')) — the oracle-fingerprinted
semantics. The SQL's 0.8/0.5/... branch literals are DECIMAL(1,1), so
(i1 + i2) is exact decimal before the double i3 promotes the sum; the
kernel replays that promotion with integer tenths. quality is derived from
the UNROUNDED score, so a one-ulp drift at a 0.7/0.5/0.3 boundary would
flip the string — this test drives hundreds of docs across the indicator
space and requires exact equality on every column."""

from __future__ import annotations

import random

import pytest


def _corpus(n: int = 400) -> list[tuple[int, str, str, str, int]]:
    rng = random.Random(99)
    words = [
        "invoice", "total", "amount", "date", "qty", "the", "data", "row",
        "key", "aaaaaaa", "zzzzzzzzzzzz", "x", "ab", "abc1", "12,345.67",
        "$3.50", "!!!!", "merge", "join", "table",
    ]
    rows = []
    for i in range(n):
        nw = rng.randint(0, 40)
        parts = [rng.choice(words) for _ in range(nw)]
        if rng.random() < 0.3:
            parts.append("q" * rng.randint(5, 30))  # repetitive runs
        if rng.random() < 0.2:
            parts.append("1234567890" * rng.randint(1, 3))  # digit-heavy
        sep = rng.choice([" ", "  ", "\n", "\t "])
        text = sep.join(parts)
        if rng.random() < 0.1:
            text = " " * rng.randint(0, 12) + text + " " * rng.randint(0, 5)
        rows.append((i, text, "en", f"src{i % 5}", len(text)))
    # engineered boundary docs: word-soup tuned to land scores at exactly
    # the HIGH/MEDIUM/LOW thresholds for some indicator combinations
    extra = [
        "invoice total date $1.00 123,456.78 good words here now",
        "the the the the the",
        "",
        "ab",
        " " * 30,
        "aaaaa" * 50,
        "word " * 100,
    ]
    for j, t in enumerate(extra):
        rows.append((n + j, t, "en", "srcx", len(t)))
    return rows


def test_p6_kernel_bit_exact_vs_sql(spark, tmp_path):
    from pdf_extractor_scripts_spark.plans import textops

    rows = _corpus()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    sf_dir = str(tmp_path)
    import os, shutil

    # p6_text_quality loads f"{sf_dir}/documents.parquet"
    got = {
        r["doc_id"]: r
        for r in textops.p6_text_quality(spark, sf_dir).collect()
    }

    spark.read.parquet(path).createOrReplaceTempView("documents")
    want = {
        r["doc_id"]: r for r in spark.sql(textops._p6_sql("spark")).collect()
    }

    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g["quality"] == w["quality"], (k, g, w)
        assert g["qscore"] == w["qscore"], (k, g, w)  # exact, no tolerance
        assert g["alpha_ratio"] == w["alpha_ratio"], (k, g, w)
        assert g["n_words"] == w["n_words"], (k, g, w)
        assert g["lang"] == w["lang"]
