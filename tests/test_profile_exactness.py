"""Exactness of the r7 vectorized text_profile kernel against the original
Spark SQL formulation (_profile_sql('spark')): the kernel counts with RE2
(pyarrow.compute) where the SQL used Java regex — \\b / char-class / simple
alternation patterns where both engines agree — and the fingerprint is the
int64 numpy kernel. All columns are integers/strings, so equality is exact
by construction; this drives adversarial inputs (unicode, odd whitespace,
boundary-adjacent tokens) through both forms."""

from __future__ import annotations

import random


def _corpus(n: int = 300) -> list[tuple[int, str, str, str, int]]:
    rng = random.Random(7)
    words = [
        "the", "them", "theory", "data", "database", "key", "keys", "row",
        "rows", "row,", "the.", "(the)", "a1b2", "UPPER", "résumé", "你好",
        "x_y", "the-row", "3.14", "$5", "", "  ",
    ]
    rows = []
    for i in range(n):
        parts = [rng.choice(words) for _ in range(rng.randint(0, 30))]
        sep = rng.choice([" ", "  ", "\n", "\t", " \n "])
        text = sep.join(parts)
        rows.append((i, text, rng.choice(["en", "de", "zh"]), f"s{i % 4}", len(text)))
    rows.append((n, "the the", "en", "sx", 7))
    rows.append((n + 1, "data data data", "de", "sx", 14))
    rows.append((n + 2, "", "en", "sx", 0))
    return rows


def test_profile_kernel_exact_vs_sql(spark, tmp_path):
    from pdf_extractor_scripts_spark.plans import textops

    df = spark.createDataFrame(
        _corpus(), "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    got = {r["doc_id"]: r for r in textops.text_profile(spark, str(tmp_path)).collect()}
    spark.read.parquet(path).createOrReplaceTempView("documents")
    want = {
        r["doc_id"]: r for r in spark.sql(textops._profile_sql("spark")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        for c in ["lang", "pred_lang", "ws_tokens", "bpe_tokens", "fingerprint"]:
            assert g[c] == w[c], (k, c, g, w)
