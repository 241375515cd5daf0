"""spark-submit entry point.

The reference's three entry points (batch runner, single-file CLI, vendor
processors — SURVEY.md §3) collapse into one job:

    spark-submit --py-files pdf_extractor_scripts_spark.zip \
        -m pdf_extractor_scripts_spark \
        --mode batch --input /data/spans --output /data/out \
        --run-id r42 [--salt] [--n-buckets 64]

    --mode analyze     detection + routing columns only (no extraction)
    --mode batch       full pipeline + checkpoint/lineage/metrics + resume
    --mode single-doc  one document's extracted spans to stdout (--doc-id)
    --mode synthetic   run over the deterministic fixture corpus (--n-docs)
    --mode media       distributed media decode audit over a document
                       tree (PDF/DOCX/MHTML, container-sniffed): per-codec
                       real pixel decode (DCT/CCITT/JBIG2/JPX/PNG) with
                       decoded/undecoded accounting; --output writes the
                       feature rows as parquet

    --input-format spans   (default) bucketed spans parquet table
    --input-format pdf     a directory of *.pdf files: binaryFile scan →
                           byte-stream parse (sources/pdfparse.py) → spans;
                           doc_id = path relative to --input
    --input-format html    a directory of *.htm(l) files: boilerplate-strip
                           main-content extraction (sources/htmlparse.py)
    --input-format docx    a directory of *.docx office documents: OOXML
                           package parse (sources/docxparse.py), headers/
                           footers excluded as page chrome
    --input-format xlsx    a directory of *.xlsx spreadsheets: one page per
                           worksheet, one text span per row (sources/
                           xlsxparse.py — spreadsheet invoices)
    --input-format odt     a directory of *.odt/*.ods OpenDocument files
                           (sources/odtparse.py — text and spreadsheets)
    --input-format rtf     a directory of *.rtf legacy office documents
                           (sources/rtfparse.py)
    --input-format pptx    a directory of *.pptx slide decks: one page per
                           slide, notes/masters excluded (sources/pptxparse.py)
    --input-format epub    a directory of *.epub books: one page per spine
                           chapter, classifier-off block extraction
                           (sources/epubparse.py)
    --input-format text    a directory of *.txt plain-text documents (the
                           WET-extract form): blank-line paragraphs
    --input-format md      a directory of *.md markdown documents (READMEs,
                           docs sites); images become media spans
    --input-format csv     a directory of *.csv/*.tsv delimited records:
                           one row-coherent span per record
    --input-format feed    a directory of RSS/Atom feeds (*.xml/*.rss/
                           *.atom): one page per entry, escaped-HTML
                           bodies through the block extractor
    --input-format mime    a directory of *.mht(ml) / *.eml MIME documents:
                           MHTML saved pages and mail with document
                           attachments (sources/mimeparse.py)
    --input-format web     a mixed crawl directory: every file, container
                           sniffed per document (PDF, HTML, DOCX or MIME)
    --input-format warc    a directory of *.warc / *.warc.gz web archives
                           (ISO 28500 — the format a crawl corpus ships
                           in): archives explode into per-document rows
                           (sources/warcparse.py), 2xx payloads flow
                           through the same container-sniffed parse
"""

from __future__ import annotations

import argparse
import sys


def _session(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .getOrCreate()
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pdf_extractor_scripts_spark")
    p.add_argument("--mode", choices=["batch", "analyze", "single-doc",
                                      "synthetic", "media"],
                   default="batch")
    p.add_argument("--input", help="spans table path (parquet/Iceberg) or, "
                   "with --input-format pdf/html/web, a directory of raw "
                   "documents")
    p.add_argument("--input-format",
                   choices=["spans", "pdf", "html", "docx", "xlsx", "odt",
                            "rtf", "pptx", "epub", "text", "md", "csv", "feed", "mime",
                            "web", "warc"],
                   default="spans",
                   help="web = a mixed crawl directory: every file, "
                   "container sniffed per document (PDF or HTML); "
                   "warc = a directory of *.warc(.gz) web archives, "
                   "exploded record-wise then container-sniffed")
    p.add_argument("--output", help="output/checkpoint directory")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--doc-id", help="single-doc mode: which document")
    p.add_argument("--n-docs", type=int, default=1000, help="synthetic mode size")
    p.add_argument("--salt", action="store_true",
                   help="enable weight-aware salted repartition (skewed inputs)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--unified-json", metavar="DIR",
                   help="batch mode: also project the COMMITTED results to "
                        "the reference's UnifiedJSONSchema (json_schema.py) "
                        "as JSON-lines under DIR — one structured document "
                        "per line, doc_id in metadata.pdf_path")
    args = p.parse_args(argv)

    spark = _session(f"pdf-extract-{args.mode}")
    from .plans.pipeline import run_pipeline, run_with_checkpoint
    from .operators.detect import with_assembled_text, with_vendor, with_route

    if args.mode == "media":
        # the distributed media path: payload + codec extraction, then
        # per-codec real decode (all four PDF image-codec families) with
        # honest accounting — the pre-OCR image audit a curation run does
        if not args.input:
            p.error("--input (a directory of PDF files) required")
        from .operators.multimodal import decode_pdf_media, media_from_pdfs
        from .sources.spans import read_binary_docs

        feats = decode_pdf_media(
            media_from_pdfs(read_binary_docs(spark, args.input, glob="*"))
        )
        if args.output:
            feats.write.mode("overwrite").parquet(args.output)
            feats = spark.read.parquet(args.output)  # don't decode twice
        feats.groupBy("filter", "decoded").count() \
            .orderBy("filter", "decoded").show(20, truncate=False)
        spark.stop()
        return 0

    if args.mode == "synthetic":
        from .fixtures import corpus_df_dist

        docs = corpus_df_dist(spark, args.n_docs)
    else:
        if not args.input:
            p.error("--input required")
        if args.input_format == "warc":
            from .sources.spans import parse_binary_to_spans
            from .sources.warcparse import read_warc_docs

            warc_errors = spark.sparkContext.accumulator(0)
            exploded = read_warc_docs(spark, args.input,
                                      error_acc=warc_errors)
            # classic crawl-processing filter: framed-clean archives,
            # 2xx responses and bare resource/conversion payloads —
            # column predicates, no re-parse; revisit records are
            # payload-less dedup pointers, not documents
            clean = exploded.filter(
                "archive_error IS NULL AND revisit_of IS NULL AND "
                "(http_status IS NULL OR http_status BETWEEN 200 AND 299)")
            parse_fallbacks = spark.sparkContext.accumulator(0)
            # doc_id is already the WARC-Target-URI — no path stripping;
            # the HTTP Content-Type charset rides along as the
            # transport-layer decode hint for HTML documents
            docs = parse_binary_to_spans(clean, fallback_acc=parse_fallbacks,
                                         container="auto",
                                         ctype_col="content_type")
        elif args.input_format in ("pdf", "html", "docx", "xlsx", "odt",
                                   "rtf", "pptx", "epub", "text", "md",
                                   "csv", "feed", "mime", "web"):
            import pyspark.sql.functions as F

            from .sources.spans import read_binary_docs, parse_binary_to_spans

            glob, container = {
                "pdf": ("*.pdf", "pdf"),
                "html": ("*.htm*", "html"),
                "docx": ("*.docx", "docx"),
                "xlsx": ("*.xlsx", "xlsx"),
                "odt": ("*.{odt,ods}", "odt"),
                "rtf": ("*.rtf", "rtf"),
                "pptx": ("*.pptx", "pptx"),
                "epub": ("*.epub", "epub"),
                "text": ("*.txt", "text"),
                "md": ("*.md", "md"),
                "csv": ("*.{csv,tsv}", "csv"),
                "feed": ("*.{xml,rss,atom}", "feed"),
                "mime": ("*.{mht,mhtml,eml}", "mime"),
                "web": ("*", "auto"),
            }[args.input_format]
            binary = read_binary_docs(spark, args.input, glob=glob)
            parse_fallbacks = spark.sparkContext.accumulator(0)
            parsed = parse_binary_to_spans(binary, fallback_acc=parse_fallbacks,
                                           container=container)
            # logical doc_id = path relative to --input (P1 filename
            # detection runs on it, so vendor path prefixes survive).
            # binaryFile reports URIs (file:/..., hdfs://nn/..., s3a://...)
            # with %20-style escapes; decode, drop the scheme from BOTH the
            # reported path and the resolved base, then strip the base
            # prefix with length arithmetic — no user path ever enters a
            # regex, so metacharacters in --input can't mis-match or throw.
            import os
            import re as _re

            _scheme = r"^[A-Za-z][A-Za-z0-9+.\-]*:(//)?"
            base = args.input.rstrip("/")
            if not _re.match(_scheme, base):
                base = os.path.abspath(base)  # relative local path → file URI path
            prefix = _re.sub(_scheme, "", base) + "/"
            # url_decode is form-decoding (`+` → space); URIs from binaryFile
            # percent-escape everything else, so protect literal `+` first to
            # get pure percent-decoding
            decoded = F.url_decode(F.regexp_replace("doc_id", r"\+", "%2B"))
            path = F.regexp_replace(decoded, _scheme, "")
            docs = parsed.withColumn(
                "doc_id",
                F.when(
                    F.startswith(path, F.lit(prefix)),
                    F.substring(path, len(prefix) + 1, 2**31 - 1),
                ).otherwise(path),
            )
        else:
            from .sources.spans import read_spans

            docs = read_spans(spark, args.input)

    if args.mode == "analyze":
        out = with_route(with_vendor(with_assembled_text(docs))).select(
            "doc_id", "vendor", "vendor_conf", "route", "n_text_chars", "n_pages"
        )
        out.show(50, truncate=False)
    elif args.mode == "single-doc":
        if not args.doc_id:
            p.error("--doc-id required for single-doc mode")
        res = run_pipeline(docs.filter(docs.doc_id == args.doc_id), salt=False)
        for row in res.collect():
            for s in row["out_spans"]:
                print((s["kind"], s["text"], s["media_ref"], s["order"]))
    else:  # batch / synthetic
        if args.output:
            n = run_with_checkpoint(spark, docs, args.output, args.run_id)
            print(f"processed {n} documents (resume-aware, run_id={args.run_id})")
            if args.unified_json:
                from .operators.checkpoint import committed_outputs
                from .plans.unified import to_unified_json

                (
                    to_unified_json(committed_outputs(spark, args.output))
                    .select("unified_json")
                    .write.mode("overwrite")
                    .text(args.unified_json)
                )
                print(f"unified JSON written to {args.unified_json}")
        else:
            res = run_pipeline(docs, salt=args.salt)
            res.write.format("noop").mode("overwrite").save()
            print("pipeline completed (no --output: dry run)")
    if args.mode in ("batch", "analyze") and args.input_format in (
            "pdf", "html", "web", "warc"):
        print(f"parse fallbacks (degraded to empty page): "
              f"{parse_fallbacks.value}")
        if args.input_format == "warc":
            print(f"archives with framing errors (prefix salvaged): "
                  f"{warc_errors.value}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
