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
    # layered selects instead of a withColumn chain — one analyzer pass per
    # dependency layer (see colutil module docstring)
    from .colutil import add_cols, replace_cols

    df = add_cols(
        df,
        text_route_text=F.expr(_joined_expr(["page_break", "text"])),
        ocr_e1=F.expr(e1),
        ocr_e2=F.expr(e2),
    )
    df = add_cols(df, ocr_route_text=F.expr(select_expr))
    return replace_cols(
        df,
        drop=("ocr_e1", "ocr_e2"),
        all_text=F.concat_ws("\n", F.col("text_route_text"), F.col("ocr_route_text")),
    )


def _sq(s: str) -> str:
    """Escape a Python string for a Spark SQL '...' literal (backslashes
    are interpreted inside SQL literals, unlike py4j-passed patterns)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _content_score(vendor: str) -> Column:
    """+0.3 per content-pattern hit (re.IGNORECASE), +0.1 per lowercased
    keyword, cap 1.0 (vendor_detector.py:120-143).

    r7: built as ONE SQL string instead of a per-pattern Column loop —
    every fine-grained Column op is a py4j roundtrip, and the detection
    construction made thousands of them per pipeline build (profiled: >1 s
    of every timed run was driver-side construction). D-suffixed literals
    keep the arithmetic DOUBLE exactly like the former F.lit floats
    (Spark parses bare 0.3 as DECIMAL — different arithmetic)."""
    hits = " + ".join(
        f"(CASE WHEN all_text rlike '(?i){_sq(p)}' THEN 1 ELSE 0 END)"
        for p in C.CONTENT_PATTERNS[vendor]
    )
    kws = " + ".join(
        f"(CASE WHEN contains(lower(all_text), '{_sq(k.lower())}') THEN 1 ELSE 0 END)"
        for k in C.CONTENT_KEYWORDS[vendor]
    )
    return F.expr(f"least(0.3D * ({hits}) + 0.1D * ({kws}), 1.0D)")


def with_vendor(df: DataFrame) -> DataFrame:
    """P1-P3: filename rlike chain + content scoring + combine cascade
    (vendor_detector.py:88-221)."""
    # case-insensitive like the reference (vendor_detector.py:98-104
    # matches the lowercased filename with re.IGNORECASE); full doc_id is
    # our filename analog (the ^vendor/ prefixes need the path)
    from .colutil import add_cols, replace_cols

    # first dict entry wins — identical precedence to the former reversed
    # when/otherwise fold, as one parsed CASE instead of a py4j loop (r7)
    fv_branches = " ".join(
        "WHEN ("
        + " OR ".join(f"doc_id rlike '(?i){_sq(p)}'" for p in pats)
        + f") THEN '{vendor}'"
        for vendor, pats in C.FILENAME_PATTERNS.items()
    )
    file_vendor = F.expr(
        f"CASE {fv_branches} ELSE cast(null as string) END"
    )

    vendors = list(C.CONTENT_PATTERNS.keys())
    # layer 1: filename vendor + the independent per-vendor content scores
    df = add_cols(
        df,
        file_vendor=file_vendor,
        **{f"score_{v}": _content_score(v) for v in vendors},
    )
    # argmax with strict-greater (first vendor wins ties) — mirrors the
    # oracle's `if score > best_score` loop.
    best_v, best_s = F.lit(None).cast("string"), F.lit(0.0)
    for v in vendors:
        is_better = F.col(f"score_{v}") > best_s
        best_v = F.when(is_better, F.lit(v)).otherwise(best_v)
        best_s = F.when(is_better, F.col(f"score_{v}")).otherwise(best_s)
    # layer 2: columns over layer 1
    df = add_cols(
        df,
        file_conf=F.when(F.col("file_vendor").isNotNull(), 0.8).otherwise(0.0),
        content_vendor=best_v,
        content_conf=best_s,
    )
    vendor = (
        F.when(F.col("content_conf") >= 0.6, F.col("content_vendor"))
        .when((F.col("file_conf") >= 0.5) & F.col("file_vendor").isNotNull(), F.col("file_vendor"))
        .when(F.col("content_conf") > 0, F.col("content_vendor"))
        .otherwise(F.lit("generic"))
    )
    df = add_cols(df, vendor=vendor)
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
    return replace_cols(
        df,
        drop=tuple(f"score_{v}" for v in vendors),
        vendor_conf=F.round(conf, 4),
    )


def _vendor_map_sql(mapping: dict[str, float | int], float_vals: bool) -> str:
    """Per-vendor constant lookup as one CASE (branches are mutually
    exclusive, so ordering is irrelevant — same values as the former
    when/otherwise fold). Float maps get D-suffixed double literals."""
    sfx = "D" if float_vals else ""
    branches = " ".join(
        f"WHEN '{v}' THEN {val!r}{sfx}"
        for v, val in mapping.items()
        if v != "generic"
    )
    return f"CASE vendor {branches} ELSE {mapping['generic']!r}{sfx} END"


def with_route(df: DataFrame) -> DataFrame:
    """P4/P5/P8: text-density OCR gate with per-vendor thresholds
    (pdf_text_detector.py:77-159, 633-688).

    pages_with_text is computed with a single aggregate() fold over the
    spans array (struct accumulator: current page + set of text pages) —
    one pass, JVM-side, no explode.
    """
    from .colutil import add_cols, replace_cols

    df = add_cols(
        df,
        n_text_chars=F.expr(
            "aggregate(filter(spans, s -> s.kind = 'text'), 0L, "
            "(acc, s) -> acc + length(s.text))"
        ),
        n_pages=F.expr("greatest(1, size(filter(spans, s -> s.kind = 'page_break')))"),
        n_text_pages=
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
    # r7: the per-vendor threshold maps, the spec/generic route cascades
    # and the fallback-side pick are built as SQL text (one parse each)
    # instead of py4j Column chains; numeric semantics unchanged (float
    # thresholds appear only in comparisons, where DECIMAL-vs-DOUBLE
    # literal typing is value-equivalent — D suffixes keep them double
    # anyway).
    thr = _vendor_map_sql(C.TEXT_THRESHOLDS, float_vals=False)
    mr = _vendor_map_sql(C.MIN_TEXT_RATIO, float_vals=True)
    ratio = "(n_text_pages / n_pages)"
    # Specialized vendors keep the chars/ratio gates — the reference
    # dispatches them to their vendor processors BEFORE the recommended
    # method is consulted (fallback_processor.py:196-209), so the P8
    # cascade is advisory there; our split models the specialized
    # processors' own behavior.
    spec_route = (
        f"CASE WHEN n_text_chars >= ({thr}) AND {ratio} >= ({mr}) THEN 'text' "
        f"WHEN n_text_chars >= ({thr}) THEN 'hybrid' ELSE 'ocr' END"
    )
    df = add_cols(df, g_det=F.expr(_generic_det_fold_sql()))
    df = add_cols(
        df,
        g_qscore=F.expr(
            f"CASE WHEN vendor = 'generic' THEN ({_generic_qscore_sql()}) END"
        ),
    )
    gthr = C.TEXT_THRESHOLDS["generic"]
    mr_g = C.MIN_TEXT_RATIO["generic"]
    qthr = C.QUALITY_THRESHOLDS["generic"]
    has_text = f"((g_det.chars > {gthr}) AND (g_det.tp / n_pages >= {mr_g!r}D))"
    mixed = "(g_det.hy > 0)"
    generic_route = (
        f"CASE WHEN {has_text} AND (g_qscore >= {qthr!r}D) "
        f"AND NOT ({mixed} AND (g_det.im > g_det.tx)) THEN 'text' "
        f"WHEN {has_text} THEN 'hybrid' ELSE 'ocr' END"
    )
    df = add_cols(
        df,
        route=F.expr(
            f"CASE WHEN vendor != 'generic' THEN ({spec_route}) "
            f"ELSE ({generic_route}) END"
        ),
    )
    # which side a generic hybrid tries FIRST (audit §21): text for the
    # mixed-majority branch, OCR for the low-quality branch
    fbp = F.expr(
        f"CASE WHEN vendor = 'generic' AND route = 'hybrid' THEN "
        f"(CASE WHEN g_qscore >= {qthr!r}D THEN 'text' ELSE 'ocr' END) END"
    )
    return replace_cols(df, drop=("g_det", "g_qscore"), fb_primary=fbp)


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


def _generic_qscore_sql() -> str:
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
    # r7: one parsed SQL expression instead of ~100 py4j Column calls per
    # build. Every float literal carries the D suffix so the arithmetic
    # stays pure DOUBLE, bit-identical to the former F.lit-based Columns
    # (bare 0.8 would parse as DECIMAL and change the (i1+i2) addition).
    s = "g_det.sample"
    slen = f"length({s})"
    stripped = f"length(regexp_replace({s}, '^\\\\s+|\\\\s+$', ''))"
    ar = f"(cast(({slen} - length(regexp_replace({s}, '[A-Za-z]', ''))) as double) / {slen})"
    i1 = (
        f"CASE WHEN {ar} >= 0.3D AND {ar} <= 0.8D THEN 0.8D "
        f"WHEN ({ar} >= 0.1D AND {ar} < 0.3D) OR ({ar} > 0.8D AND {ar} <= 0.95D) THEN 0.5D "
        f"ELSE 0.1D END"
    )
    words = f"filter(split({s}, '\\\\s+'), w -> w != '')"
    nw = f"size({words})"
    awl = f"(cast(aggregate({words}, 0, (a, w) -> a + length(w)) as double) / {nw})"
    vr = (
        f"(cast(size(filter({words}, w -> length(w) >= 2 AND length(w) <= 20 "
        f"AND w rlike '^[a-zA-Z0-9]+$')) as double) / {nw})"
    )
    i2 = (
        f"CASE WHEN {nw} = 0 THEN 0.1D "
        f"WHEN {awl} >= 3 AND {awl} <= 8 AND {vr} >= 0.6D THEN 0.9D "
        f"WHEN {awl} >= 2 AND {awl} <= 12 AND {vr} >= 0.4D THEN 0.6D "
        f"ELSE 0.3D END"
    )
    hits = " + ".join(
        f"(CASE WHEN {s} rlike '(?i){_sq(p)}' THEN 1 ELSE 0 END)"
        for p in C.P6_INVOICE_PATTERNS
    )
    i3 = f"least(cast(({hits}) as double) / {len(C.P6_INVOICE_PATTERNS)}, 1.0D)"
    rr = f"(cast(regexp_count({s}, '(.)\\\\1{{4,}}') as double) / {slen})"
    i4 = f"CASE WHEN {rr} < 0.05D THEN 0.8D WHEN {rr} < 0.15D THEN 0.5D ELSE 0.2D END"
    return (
        f"CASE WHEN {s} IS NULL OR {stripped} < 10 THEN 0.0D "
        f"ELSE (((({i1}) + ({i2})) + ({i3})) + ({i4})) / 4 END"
    )
