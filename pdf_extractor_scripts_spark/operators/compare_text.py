"""Extraction-comparison harness — the engine's form of the reference's
Python-vs-NodeJS comparison tooling (text_extraction_comparison.py:60-199:
difflib similarity, numeric accuracy, spacing preservation; rendered diffs
in visual_text_comparison.py).

Compares two extraction result tables (doc_id, out_spans) span-by-span and
textually: exact span equality, difflib sequence similarity, and extracted-
number overlap. Similarity is a pandas UDF (difflib has no SQL form); the
joins and set arithmetic are native.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType

_SER = "array_join(transform(out_spans, s -> concat(s.kind, '\\u0001', s.text, '\\u0001', s.media_ref)), '\\n')"


@F.pandas_udf(DoubleType())
def _difflib_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    import difflib

    return pd.Series(
        [
            difflib.SequenceMatcher(None, x or "", y or "").ratio()
            for x, y in zip(a, b)
        ],
        index=a.index,
    )


def compare_extractions(a: DataFrame, b: DataFrame) -> DataFrame:
    """Full-outer comparison of two result tables on doc_id.

    Columns: exact (span-sequence equality incl. order), similarity
    (difflib over serialized spans), numeric_recall (fraction of A's
    extracted numbers present in B), n_spans_a/b.
    """
    nums = (
        lambda side: f"array_distinct(regexp_extract_all({side}, '[0-9][0-9,\\\\.]*', 0))"
    )
    sa = a.select(
        "doc_id",
        F.expr(_SER).alias("ser_a"),
        F.expr("out_spans").alias("spans_a"),
    )
    sb = b.select(
        "doc_id",
        F.expr(_SER).alias("ser_b"),
        F.expr("out_spans").alias("spans_b"),
    )
    j = sa.join(sb, "doc_id", "full_outer")
    # One-sided docs (full-outer nulls) must score as mismatches, not NULL:
    # NULL `exact` is silently dropped by sum() in comparison_summary, and
    # size(regexp_extract_all(NULL, ...)) is -1 in Spark, which would turn
    # numeric_recall negative. Coalesce to '' so absent == empty extraction.
    j = j.withColumn("ser_a", F.coalesce("ser_a", F.lit(""))).withColumn(
        "ser_b", F.coalesce("ser_b", F.lit(""))
    )
    return j.select(
        "doc_id",
        (
            (F.col("ser_a") == F.col("ser_b"))
            & F.col("spans_a").isNotNull()
            & F.col("spans_b").isNotNull()
        ).cast("int").alias("exact"),
        F.round(_difflib_ratio(F.col("ser_a"), F.col("ser_b")), 4).alias("similarity"),
        F.expr(
            f"CASE WHEN size({nums('ser_a')}) = 0 THEN 1.0 "
            f"ELSE cast(size(array_intersect({nums('ser_a')}, {nums('ser_b')})) as double)"
            f" / size({nums('ser_a')}) END"
        ).alias("numeric_recall"),
        F.expr("coalesce(size(spans_a), 0)").alias("n_spans_a"),
        F.expr("coalesce(size(spans_b), 0)").alias("n_spans_b"),
    )


def comparison_summary(cmp: DataFrame) -> DataFrame:
    return cmp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("exact").cast("long").alias("n_exact"),
        F.round(F.avg("similarity"), 4).alias("avg_similarity"),
        F.round(F.avg("numeric_recall"), 4).alias("avg_numeric_recall"),
    )


# ---------------------------------------------------------------------------
# The reference's raw-text quality rubric (text_extraction_comparison.py:
# 60-190): spacing preservation, column alignment, numeric accuracy,
# line-item detection, and their 0.25/0.30/0.25/0.20 weighted overall.
# Column alignment needs regex MATCH POSITIONS (neither engine's SQL exposes
# them), so the rubric is an Arrow-batched pandas UDF like _difflib_ratio.
# ---------------------------------------------------------------------------
import re as _re

_Q_NUM = _re.compile(r"\d+\.\d+")
_Q_ITEM_LINE = _re.compile(r"^\s*\d{3}\s+\d+")
_Q_WIDE_GAP = _re.compile(r"\s{3,}")


def ref_text_quality(text: str) -> dict:
    """One document's rubric — mirrors the reference formulas exactly,
    including the quirks: the spacing skip checks 'Invoice'/'Page:' on the
    RAW (unstripped) line case-sensitively (:68); column alignment pairs
    consecutive item lines positionally with a 3-char tolerance (:98-113);
    numeric accuracy's integer branch always scores (the \\d+\\.\\d+
    pattern admits only decimals, so only >6-decimal values fail, :126-133);
    empty text → all zeros (:162-164)."""
    if not text:
        return {"total_characters": 0, "total_lines": 0,
                "spacing_preservation_score": 0.0,
                "column_alignment_score": 0.0,
                "numeric_accuracy_score": 0.0,
                "line_item_detection_score": 0.0,
                "overall_quality_score": 0.0}
    lines = text.split("\n")

    data_lines = [l for l in lines
                  if l.strip() and "Invoice" not in l and "Page:" not in l]
    spacing = (
        100.0 * sum(1 for l in data_lines if _Q_WIDE_GAP.search(l))
        / len(data_lines)
        if data_lines else 0.0
    )

    item_lines = [l for l in lines if _Q_ITEM_LINE.match(l)]
    aligned = total_cols = 0
    for cur, nxt in zip(item_lines, item_lines[1:]):
        cur_pos = [m.start() for m in _Q_NUM.finditer(cur)]
        nxt_pos = [m.start() for m in _Q_NUM.finditer(nxt)]
        for p1, p2 in zip(cur_pos, nxt_pos):
            total_cols += 1
            if abs(p1 - p2) <= 3:
                aligned += 1
    column = 100.0 * aligned / total_cols if total_cols else 0.0

    numbers = _Q_NUM.findall(text)
    numeric = (
        100.0 * sum(1 for n in numbers if len(n.split(".")[1]) <= 6)
        / len(numbers)
        if numbers else 0.0
    )

    complete = sum(1 for l in item_lines if len(_Q_NUM.findall(l)) >= 3)
    line_item = 100.0 * complete / len(item_lines) if item_lines else 0.0

    overall = (spacing * 0.25 + column * 0.30 + numeric * 0.25
               + line_item * 0.20)
    return {"total_characters": len(text), "total_lines": len(lines),
            "spacing_preservation_score": spacing,
            "column_alignment_score": column,
            "numeric_accuracy_score": numeric,
            "line_item_detection_score": line_item,
            "overall_quality_score": overall}


# explicit StructType: a DDL-string returnType would need a live session at
# import time (the module imports before tests create one)
from pyspark.sql.types import LongType, StructField, StructType  # noqa: E402

_QUALITY_SCHEMA = StructType([
    StructField("total_characters", LongType()),
    StructField("total_lines", LongType()),
    StructField("spacing_preservation_score", DoubleType()),
    StructField("column_alignment_score", DoubleType()),
    StructField("numeric_accuracy_score", DoubleType()),
    StructField("line_item_detection_score", DoubleType()),
    StructField("overall_quality_score", DoubleType()),
])


@F.pandas_udf(_QUALITY_SCHEMA)
def _quality_udf(texts: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        [ref_text_quality(t or "") for t in texts], index=texts.index
    )


def with_text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the reference rubric as a `quality` struct column — the
    corpus-scale form of analyze_text_quality: one Arrow round-trip, no
    driver loop, so a 100 TB comparison run stays distributed."""
    return df.withColumn("quality", _quality_udf(F.col(text_col)))


def quality_comparison(a: DataFrame, b: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc side-by-side rubric + the difflib similarity — the engine
    form of compare_extractions (text_extraction_comparison.py:226-262);
    'advantages' are derivable by comparing the paired struct columns."""
    qa = with_text_quality(a, text_col).select(
        "doc_id", F.col("quality").alias("quality_a"),
        F.col(text_col).alias("text_a"))
    qb = with_text_quality(b, text_col).select(
        "doc_id", F.col("quality").alias("quality_b"),
        F.col(text_col).alias("text_b"))
    j = qa.join(qb, "doc_id", "full_outer")
    j = j.withColumn("text_a", F.coalesce("text_a", F.lit(""))).withColumn(
        "text_b", F.coalesce("text_b", F.lit(""))
    )
    # find_key_differences (:201-224): line-item count mismatch + numeric
    # set differences, capped at 5 (the reference caps a SET slice — order
    # nondeterministic there; sorted here so runs are reproducible)
    items = lambda c: f"size(regexp_extract_all({c}, '(?m)^\\\\s*\\\\d{{3}}\\\\s+\\\\d+', 0))"  # noqa: E731
    nums = lambda c: f"array_distinct(regexp_extract_all({c}, '\\\\d+\\\\.\\\\d+', 0))"  # noqa: E731
    diff_items = F.expr(
        f"CASE WHEN {items('text_a')} <> {items('text_b')} THEN "
        f"concat('Line item count: A=', {items('text_a')}, ', B=', {items('text_b')}) END"
    )
    missing = lambda x, y, label: F.expr(  # noqa: E731
        f"CASE WHEN size(array_except({nums(x)}, {nums(y)})) > 0 THEN "
        f"concat('Numbers missing in {label}: ', array_join(slice(array_sort("
        f"array_except({nums(x)}, {nums(y)})), 1, 5), ', ')) END"
    )
    adv = lambda metric, label: F.when(  # noqa: E731
        F.col(f"quality_a.{metric}") > F.col(f"quality_b.{metric}"),
        F.struct(F.lit("a").alias("side"), F.lit(label).alias("advantage")),
    ).otherwise(
        F.struct(F.lit("b").alias("side"), F.lit(label).alias("advantage"))
    )
    return j.select(
        "doc_id", "quality_a", "quality_b",
        F.round(
            _difflib_ratio(F.col("text_a"), F.col("text_b")) * 100, 4
        ).alias("similarity_score"),  # the reference reports 0-100 (:199)
        F.array_compact(
            F.array(diff_items, missing("text_a", "text_b", "B"),
                    missing("text_b", "text_a", "A"))
        ).alias("differences"),
        # the reference's ties-go-to-B quirk (strict > on the A side, :240)
        F.array(
            adv("spacing_preservation_score", "Better spacing preservation"),
            adv("column_alignment_score", "Better column alignment"),
            adv("overall_quality_score", "Higher overall quality"),
        ).alias("advantages"),
    )


def render_side_by_side(
    text_a: str, text_b: str, title: str, lines_to_show: int = 50,
    label_a: str = "EXTRACTION A", label_b: str = "EXTRACTION B",
) -> str:
    """The reference's side-by-side visual diff
    (visual_text_comparison.py:28-55) as a returned string: 120-wide
    banner, 60/60 columns, per-line truncation at 58+'..' — a driver-side
    debugging view over two collected texts (never a distributed op)."""
    out = [
        "=" * 120,
        title.center(120),
        "=" * 120,
        f"{label_a.center(60)} | {label_b.center(60)}",
        f"{'-' * 60} | {'-' * 60}",
    ]
    la = text_a.split("\n")[:lines_to_show]
    lb = text_b.split("\n")[:lines_to_show]
    for i in range(max(len(la), len(lb))):
        a = la[i] if i < len(la) else ""
        b = lb[i] if i < len(lb) else ""
        a = a[:58] + ".." if len(a) > 60 else a
        b = b[:58] + ".." if len(b) > 60 else b
        out.append(f"{a:<60} | {b:<60}")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Structural analyzers (visual_text_comparison.py:52-134) — the reference's
# line-item / spacing / numeric-precision profile, as one JVM-side pass
# ---------------------------------------------------------------------------
# the reference's diagnostic patterns, verbatim grammars:
# line items = `^\s*(\d{3})\s+.*?(d+.d+)\s+(d+.d+)\s*$` per line (:59),
# "significant spacing" = 5+ consecutive spaces (:85),
# numeric precision = every `\d+.\d+` token (:110)
LINE_ITEM_RX = r"(?m)^[ \t]*\d{3}[ \t].*?\d+\.\d+[ \t]+\d+\.\d+[ \t]*$"
SPACED_LINE_RX = r"(?m)^.*[ ]{5,}.*$"
DECIMAL_RX = r"\d+\.\d+"
# inside a SQL string literal the backslashes need their own escaping
_DECIMAL_RX_SQL = DECIMAL_RX.replace("\\", "\\\\")


def structure_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document structural profile: counts of line-item-shaped rows,
    heavily-spaced lines, and decimal-number tokens (+ distinct decimals).
    All regexp_count/JVM-side — the three analyze_* passes of
    visual_text_comparison.py as columns instead of printouts, so two
    extraction variants can be compared with a join."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.regexp_count(t, F.lit(LINE_ITEM_RX)).alias("n_line_items"),
        F.regexp_count(t, F.lit(SPACED_LINE_RX)).alias("n_spaced_lines"),
        F.regexp_count(t, F.lit(DECIMAL_RX)).alias("n_decimals"),
        F.size(F.array_distinct(
            F.expr(f"regexp_extract_all({text_col}, '{_DECIMAL_RX_SQL}', 0)")
        )).alias("n_unique_decimals"),
    )


def structure_comparison(a: DataFrame, b: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """A-vs-B structural diff (the reference's side-by-side analyzer
    output as rows): per-doc count deltas plus the decimal-set difference
    sizes (numbers only in A / only in B — analyze_numeric_precision's
    only_in_python/only_in_nodejs)."""
    pa = structure_profile(a, text_col).alias("pa")
    pb = structure_profile(b, text_col).alias("pb")
    da = a.select("doc_id", F.expr(
        f"array_distinct(regexp_extract_all({text_col}, '{_DECIMAL_RX_SQL}', 0))"
    ).alias("nums_a"))
    db = b.select("doc_id", F.expr(
        f"array_distinct(regexp_extract_all({text_col}, '{_DECIMAL_RX_SQL}', 0))"
    ).alias("nums_b"))
    return (
        pa.join(pb, "doc_id")
        .join(da, "doc_id").join(db, "doc_id")
        .select(
            "doc_id",
            (F.col("pa.n_line_items") - F.col("pb.n_line_items"))
            .alias("d_line_items"),
            (F.col("pa.n_spaced_lines") - F.col("pb.n_spaced_lines"))
            .alias("d_spaced_lines"),
            F.size(F.array_except("nums_a", "nums_b")).alias("n_only_in_a"),
            F.size(F.array_except("nums_b", "nums_a")).alias("n_only_in_b"),
            F.size(F.array_intersect("nums_a", "nums_b")).alias("n_common"),
        )
    )
