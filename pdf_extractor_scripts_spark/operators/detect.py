"""Native-SQL detection + routing operators (P1-P8 of SURVEY.md §2.2).

Everything here is Catalyst-expressible — rlike chains, higher-order
functions over the spans array, CASE maps — so classification of a 10^12-doc
corpus is a single scan with whole-stage codegen and zero Python. The
reference does all of this per-document in Python (vendor_detector.py,
pdf_text_detector.py); the semantics are identical, the execution is
columnar.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .. import config as C


def _joined_expr(kinds: list[str]) -> str:
    cond = " or ".join(f"s.kind = '{k}'" for k in kinds)
    return f"array_join(transform(filter(spans, s -> {cond}), s -> s.text), '\\n')"


def _ocr_qscore_sql(t: str, conf: float) -> str:
    """Native form of the OCR quality score (image_pdf_processor.py:482-538):
    40% confidence, 20% length, 25% invoice keywords, 10% numeric density,
    5% indicators — identical arithmetic to oracle.ocr_quality_score so the
    near-tie branch decision agrees bit-for-bit."""
    kw_arr = "array(" + ",".join(f"'{k}'" for k in C.OCR_QUALITY_KEYWORDS) + ")"
    words = f"size(split(trim({t}), '\\\\s+'))"
    chars = f"length(trim({t}))"
    kws = f"size(filter({kw_arr}, kw -> contains(lower({t}), kw)))"
    nums = f"size(regexp_extract_all({t}, '\\\\d+\\\\.?\\\\d*', 0))"
    ind = (
        f"(CASE WHEN {t} rlike '\\\\d{{2,}}' THEN 20 ELSE 0 END + "
        f"CASE WHEN {t} rlike '[A-Z]{{2,}}' THEN 20 ELSE 0 END + "
        f"CASE WHEN {t} rlike '\\\\$\\\\d+' THEN 30 ELSE 0 END + "
        f"CASE WHEN {t} rlike "
        f"'\\\\d{{1,2}}[/\\\\-]\\\\d{{1,2}}[/\\\\-]\\\\d{{2,4}}' THEN 30 ELSE 0 END)"
    )
    return (
        f"CASE WHEN trim({t}) = '' THEN cast(0.0 as double) ELSE "
        f"least(cast(100.0 as double), "
        f"cast({conf!r} as double) * 0.4 + "
        f"least(cast(100.0 as double), {words} * 5.0 + {chars} * 0.5) * 0.2 + "
        f"least(cast(100.0 as double), {kws} * 10.0) * 0.25 + "
        f"least(cast(100.0 as double), {nums} * 5.0) * 0.1 + "
        f"{ind} * 0.05) END"
    )


def _ocr_line_score_sql(l: str) -> str:
    """Per-line merge score (image_pdf_processor.py:574-599):
    numbers*2 + keywords*3 + words."""
    kw_arr = "array(" + ",".join(f"'{k}'" for k in C.OCR_LINE_KEYWORDS) + ")"
    return (
        f"size(regexp_extract_all({l}, '\\\\d+\\\\.?\\\\d*', 0)) * 2 + "
        f"size(filter({kw_arr}, kw -> contains(lower({l}), kw))) * 3 + "
        f"size(split({l}, '\\\\s+'))"
    )


def _ocr_combine_sql(t1: str, t2: str) -> str:
    """Near-tie line-by-line combine (image_pdf_processor.py:540-572): the
    longer result is the base; a base line is replaced by its aligned alt
    line iff the alt line scores strictly higher; base's tail survives.
    zip_with pads the shorter side with NULL — NULL base rows (alt longer
    than base, impossible by construction) are filtered for safety."""
    lines = lambda t: (
        f"filter(transform(split({t}, '\\n'), x -> trim(x)), x -> x <> '')"
    )
    return f"""
    array_join(
      filter(
        zip_with(
          CASE WHEN size({lines(t1)}) >= size({lines(t2)})
               THEN {lines(t1)} ELSE {lines(t2)} END,
          CASE WHEN size({lines(t1)}) >= size({lines(t2)})
               THEN {lines(t2)} ELSE {lines(t1)} END,
          (b, a) -> CASE
            WHEN b IS NULL THEN NULL
            WHEN a IS NOT NULL AND {_ocr_line_score_sql('a')} > {_ocr_line_score_sql('b')}
            THEN a ELSE b END),
        x -> x IS NOT NULL),
      '\\n')
    """


def with_assembled_text(df: DataFrame) -> DataFrame:
    """Assembly columns via array HOFs — no explode, no shuffle.

    * all_text        — every span's text (detection input)
    * text_route_text — page markers + selectable text lines
      (text_pdf_processor.py:662-670 page-marker concatenation)
    * ocr_route_text  — the SELECTED dual-engine OCR output (O3/O4/O5,
      image_pdf_processor.py:434-599): page markers + media_text sidecar
      (primary engine) vs media_text_alt sidecar (secondary engine) — one
      engine blank → the other; quality scores within 10 → line-by-line
      near-tie merge preferring invoice content; else argmax (primary wins
      ties). All native CASE/HOF expressions — zero Python.
    """
    e1 = _joined_expr(["page_break", "media_text"])
    e2 = _joined_expr(["page_break", "media_text_alt"])

    # CASE is lazily evaluated: docs without a secondary-engine sidecar
    # (the overwhelming majority at scale) never compute the scores.
    # An engine is "blank" when it has no sidecar span with NON-BLANK text —
    # the reference checks text.strip() of the engine output, not mere
    # result presence (image_pdf_processor.py:457-462; audit §7), so an
    # engine that returned only whitespace must lose outright, not be
    # quality-scored against the other.
    has = lambda kind: f"exists(spans, s -> s.kind = '{kind}' and trim(s.text) <> '')"
    select_expr = f"""
    CASE
      WHEN NOT {has("media_text_alt")} THEN ocr_e1
      WHEN NOT {has("media_text")} THEN ocr_e2
      WHEN abs(({_ocr_qscore_sql('ocr_e1', C.OCR_ENGINE_CONF['primary'])}) -
               ({_ocr_qscore_sql('ocr_e2', C.OCR_ENGINE_CONF['secondary'])}))
           < {C.OCR_NEAR_TIE!r} THEN ({_ocr_combine_sql('ocr_e1', 'ocr_e2')})
      WHEN ({_ocr_qscore_sql('ocr_e2', C.OCR_ENGINE_CONF['secondary'])}) >
           ({_ocr_qscore_sql('ocr_e1', C.OCR_ENGINE_CONF['primary'])}) THEN ocr_e2
      ELSE ocr_e1
    END
    """

    # detection text = the two route assemblies concatenated (one fewer full
    # pass over spans than joining everything again; detection is rlike/
    # contains — insensitive to the block ordering). oracle.py builds the
    # identical string.
    return (
        df.withColumn("text_route_text", F.expr(_joined_expr(["page_break", "text"])))
        .withColumn("ocr_e1", F.expr(e1))
        .withColumn("ocr_e2", F.expr(e2))
        .withColumn("ocr_route_text", F.expr(select_expr))
        .drop("ocr_e1", "ocr_e2")
        .withColumn(
            "all_text",
            F.concat_ws("\n", F.col("text_route_text"), F.col("ocr_route_text")),
        )
    )


def _content_score(vendor: str) -> Column:
    """+0.3 per content-pattern hit (re.IGNORECASE), +0.1 per lowercased
    keyword, cap 1.0 (vendor_detector.py:120-143)."""
    hits = sum(
        F.when(F.col("all_text").rlike(f"(?i){p}"), 1).otherwise(0)
        for p in C.CONTENT_PATTERNS[vendor]
    )
    kws = sum(
        F.when(F.lower(F.col("all_text")).contains(k.lower()), 1).otherwise(0)
        for k in C.CONTENT_KEYWORDS[vendor]
    )
    return F.least(F.lit(0.3) * hits + F.lit(0.1) * kws, F.lit(1.0))


def with_vendor(df: DataFrame) -> DataFrame:
    """P1-P3: filename rlike chain + content scoring + combine cascade
    (vendor_detector.py:88-221)."""
    # case-insensitive like the reference (vendor_detector.py:98-104
    # matches the lowercased filename with re.IGNORECASE); full doc_id is
    # our filename analog (the ^vendor/ prefixes need the path)
    file_vendor = F.lit(None).cast("string")
    for vendor, pats in reversed(list(C.FILENAME_PATTERNS.items())):
        cond = F.lit(False)
        for p in pats:
            cond = cond | F.col("doc_id").rlike(f"(?i){p}")
        file_vendor = F.when(cond, F.lit(vendor)).otherwise(file_vendor)
    df = df.withColumn("file_vendor", file_vendor).withColumn(
        "file_conf", F.when(F.col("file_vendor").isNotNull(), 0.8).otherwise(0.0)
    )

    vendors = list(C.CONTENT_PATTERNS.keys())
    for v in vendors:
        df = df.withColumn(f"score_{v}", _content_score(v))
    # argmax with strict-greater (first vendor wins ties) — mirrors the
    # oracle's `if score > best_score` loop.
    best_v, best_s = F.lit(None).cast("string"), F.lit(0.0)
    for v in vendors:
        is_better = F.col(f"score_{v}") > best_s
        best_v = F.when(is_better, F.lit(v)).otherwise(best_v)
        best_s = F.when(is_better, F.col(f"score_{v}")).otherwise(best_s)
    df = df.withColumn("content_vendor", best_v).withColumn("content_conf", best_s)

    vendor = (
        F.when(F.col("content_conf") >= 0.6, F.col("content_vendor"))
        .when((F.col("file_conf") >= 0.5) & F.col("file_vendor").isNotNull(), F.col("file_vendor"))
        .when(F.col("content_conf") > 0, F.col("content_vendor"))
        .otherwise(F.lit("generic"))
    )
    df = df.withColumn("vendor", vendor)
    agree = (
        F.col("file_vendor").isNotNull()
        & (F.col("content_vendor") == F.col("file_vendor"))
        & (F.col("vendor") != "generic")
    )
    base = (
        F.when(F.col("content_conf") >= 0.6, F.col("content_conf"))
        .when((F.col("file_conf") >= 0.5) & F.col("file_vendor").isNotNull(), F.col("file_conf"))
        .when(F.col("content_conf") > 0, F.col("content_conf"))
        .otherwise(F.lit(0.0))
    )
    # agreement: min(filename_conf + content_conf, 1.0) — the reference's
    # formula (vendor_detector.py:195-198), not a flat +0.1 boost
    conf = F.when(
        agree, F.least(F.col("file_conf") + F.col("content_conf"), F.lit(1.0))
    ).otherwise(base)
    drop = [f"score_{v}" for v in vendors]
    return df.withColumn("vendor_conf", F.round(conf, 4)).drop(*drop)


def _vendor_map(mapping: dict[str, float | int]) -> Column:
    c = F.lit(mapping["generic"])
    for v, val in mapping.items():
        if v != "generic":
            c = F.when(F.col("vendor") == v, F.lit(val)).otherwise(c)
    return c


def with_route(df: DataFrame) -> DataFrame:
    """P4/P5/P8: text-density OCR gate with per-vendor thresholds
    (pdf_text_detector.py:77-159, 633-688).

    pages_with_text is computed with a single aggregate() fold over the
    spans array (struct accumulator: current page + set of text pages) —
    one pass, JVM-side, no explode.
    """
    df = df.withColumn(
        "n_text_chars",
        F.expr(
            "aggregate(filter(spans, s -> s.kind = 'text'), 0L, "
            "(acc, s) -> acc + length(s.text))"
        ),
    ).withColumn(
        "n_pages",
        F.expr("greatest(1, size(filter(spans, s -> s.kind = 'page_break')))"),
    ).withColumn(
        "n_text_pages",
        # O(1)-per-element fold: spans arrive in offset order, so "pages with
        # text" is countable with (current page, last counted page, count) —
        # no per-element set union.
        F.expr(
            "aggregate(spans, "
            "named_struct('pg', 0, 'last', -1, 'cnt', 0), "
            "(acc, s) -> CASE WHEN s.kind = 'page_break' "
            "  THEN named_struct('pg', acc.pg + 1, 'last', acc.last, 'cnt', acc.cnt) "
            "WHEN s.kind = 'text' AND acc.last <> acc.pg "
            "  THEN named_struct('pg', acc.pg, 'last', acc.pg, 'cnt', acc.cnt + 1) "
            "ELSE acc END, "
            "acc -> acc.cnt)"
        ),
    )
    thr = _vendor_map(C.TEXT_THRESHOLDS)
    mr = _vendor_map(C.MIN_TEXT_RATIO)
    ratio = F.col("n_text_pages") / F.col("n_pages")
    # Specialized vendors keep the chars/ratio gates — the reference
    # dispatches them to their vendor processors BEFORE the recommended
    # method is consulted (fallback_processor.py:196-209), so the P8
    # cascade is advisory there; our split models the specialized
    # processors' own behavior.
    spec_route = (
        F.when((F.col("n_text_chars") >= thr) & (ratio >= mr), "text")
        .when(F.col("n_text_chars") >= thr, "hybrid")
        .otherwise("ocr")
    )
    df = df.withColumn("g_det", F.expr(_generic_det_fold_sql()))
    df = df.withColumn(
        "g_qscore",
        F.when(F.col("vendor") == "generic", _generic_quality_score()),
    )
    route = F.when(F.col("vendor") != "generic", spec_route).otherwise(
        _generic_route(F.col("g_qscore"))
    )
    df = df.withColumn("route", route)
    # which side a generic hybrid tries FIRST (audit §21): text for the
    # mixed-majority branch, OCR for the low-quality branch
    fbp = F.when(
        (F.col("vendor") == "generic") & (F.col("route") == "hybrid"),
        F.when(
            F.col("g_qscore") >= C.QUALITY_THRESHOLDS["generic"], "text"
        ).otherwise("ocr"),
    )
    return df.withColumn("fb_primary", fbp).drop(
        "g_det", "g_qscore"
    )


def _generic_det_fold_sql() -> str:
    """One fold over spans builds the generic cascade's detection struct
    (audits §20/§24): P4's triple (pdf_text_detector.py:345-371 — per
    page, lines join with '\\n', the page text is whitespace-stripped,
    total_text concatenates stripped page texts with NO separator, tp
    counts pages whose stripped text is STRICTLY longer than the
    threshold, sample = total_text[:200]) plus P7's page classification
    (:453-459 — hybrid = text AND images, text = text only, image = no
    qualifying text; the pre-page segment 0 never classifies)."""
    thr = C.TEXT_THRESHOLDS["generic"]
    strip = lambda x: f"regexp_replace({x}, '^\\\\s+|\\\\s+$', '')"
    has = lambda x: f"(length({strip(x)}) > {thr})"
    classify = (
        f"'tx', acc.tx + CASE WHEN acc.pg > 0 AND {has('acc.cur')} AND NOT acc.media THEN 1 ELSE 0 END, "
        f"'im', acc.im + CASE WHEN acc.pg > 0 AND NOT {has('acc.cur')} THEN 1 ELSE 0 END, "
        f"'hy', acc.hy + CASE WHEN acc.pg > 0 AND {has('acc.cur')} AND acc.media THEN 1 ELSE 0 END"
    )
    keep_counts = "'tx', acc.tx, 'im', acc.im, 'hy', acc.hy"
    return f"""CASE WHEN vendor = 'generic' THEN aggregate(
      spans,
      named_struct('cur', '', 'tot', '', 'tp', 0, 'pg', 0, 'media', false,
                   'tx', 0, 'im', 0, 'hy', 0),
      (acc, s) -> CASE
        WHEN s.kind = 'page_break' THEN named_struct(
          'cur', '',
          'tot', concat(acc.tot, {strip('acc.cur')}),
          'tp', acc.tp + CASE WHEN {has('acc.cur')} THEN 1 ELSE 0 END,
          'pg', acc.pg + 1, 'media', false, {classify})
        WHEN s.kind = 'text' THEN named_struct(
          'cur', CASE WHEN acc.cur = '' THEN s.text
                      ELSE concat(acc.cur, '\\n', s.text) END,
          'tot', acc.tot, 'tp', acc.tp, 'pg', acc.pg, 'media', acc.media,
          {keep_counts})
        WHEN s.kind = 'media' THEN named_struct(
          'cur', acc.cur, 'tot', acc.tot, 'tp', acc.tp, 'pg', acc.pg,
          'media', true, {keep_counts})
        ELSE acc END,
      acc -> named_struct(
        'chars', length(concat(acc.tot, {strip('acc.cur')})),
        'sample', substring(concat(acc.tot, {strip('acc.cur')}), 1, 200),
        'tp', acc.tp + CASE WHEN {has('acc.cur')} THEN 1 ELSE 0 END,
        {classify}))
    END"""


def _generic_quality_score():
    """The LIVE P8 cascade's P6 quality score for generic documents
    (audit §20, pdf_text_detector.py:633-688), natively over the 200-char
    detection sample; the arithmetic mirrors oracle._quality_score
    exactly (left-associated (i1+i2+i3+i4)/4). _generic_route below
    applies it: has_selectable_text = STRICT chars > threshold AND
    per-page-thresholded ratio >= min_ratio (:365-371); the text route
    additionally needs the score to clear the vendor quality threshold
    (tier >= MEDIUM is subsumed — config.QUALITY_THRESHOLDS are all >=
    0.5); an image-page majority in mixed content forces the fallback
    route."""
    sample = F.col("g_det.sample")
    slen = F.length(sample)
    stripped = F.length(F.regexp_replace(sample, r"^\s+|\s+$", ""))
    ar = (slen - F.length(F.regexp_replace(sample, "[A-Za-z]", ""))).cast(
        "double"
    ) / slen
    i1 = (
        F.when((ar >= 0.3) & (ar <= 0.8), 0.8)
        .when(((ar >= 0.1) & (ar < 0.3)) | ((ar > 0.8) & (ar <= 0.95)), 0.5)
        .otherwise(0.1)
    )
    words = F.filter(F.split(sample, r"\s+"), lambda w: w != "")
    nw = F.size(words)
    awl = F.aggregate(
        words, F.lit(0), lambda a, w: a + F.length(w)
    ).cast("double") / nw
    vr = F.size(
        F.filter(
            words,
            lambda w: (F.length(w) >= 2)
            & (F.length(w) <= 20)
            & w.rlike("^[a-zA-Z0-9]+$"),
        )
    ).cast("double") / nw
    i2 = (
        F.when(nw == 0, 0.1)
        .when((awl >= 3) & (awl <= 8) & (vr >= 0.6), 0.9)
        .when((awl >= 2) & (awl <= 12) & (vr >= 0.4), 0.6)
        .otherwise(0.3)
    )
    hits = None
    for p in C.P6_INVOICE_PATTERNS:
        h = F.when(sample.rlike("(?i)" + p), 1).otherwise(0)
        hits = h if hits is None else hits + h
    i3 = F.least(hits.cast("double") / len(C.P6_INVOICE_PATTERNS), F.lit(1.0))
    rr = F.regexp_count(sample, F.lit(r"(.)\1{4,}")).cast("double") / slen
    i4 = F.when(rr < 0.05, 0.8).when(rr < 0.15, 0.5).otherwise(0.2)
    return F.when(sample.isNull() | (stripped < 10), 0.0).otherwise(
        (((i1 + i2) + i3) + i4) / 4
    )


def _generic_route(score):
    gthr = C.TEXT_THRESHOLDS["generic"]
    has_text = (F.col("g_det.chars") > gthr) & (
        F.col("g_det.tp") / F.col("n_pages") >= C.MIN_TEXT_RATIO["generic"]
    )
    # P7 classification (audit §24): mixed iff ANY hybrid page; the
    # image>text comparison uses the EXCLUSIVE per-class counts
    mixed = F.col("g_det.hy") > 0
    return (
        F.when(
            has_text
            & (score >= C.QUALITY_THRESHOLDS["generic"])
            & ~(mixed & (F.col("g_det.im") > F.col("g_det.tx"))),
            "text",
        )
        .when(has_text, "hybrid")
        .otherwise("ocr")
    )
