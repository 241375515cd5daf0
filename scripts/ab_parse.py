#!/usr/bin/env python
"""Isolated (no-Spark) PDF-parse A/B: time parse_pdf_spans over the
deterministic fixture corpus under two checkouts, interleaved min-of-N —
the only trustworthy perf verdict on this noisy box (see memory).

Usage:
    python scripts/ab_parse.py                 # time THIS checkout once
    python scripts/ab_parse.py --ab PATH_B     # interleave cwd vs PATH_B
                                               # (e.g. a git worktree of a
                                               # prior round), 3 rounds
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("AB_PARSE_DOCS", "400"))
ROUNDS = int(os.environ.get("AB_PARSE_ROUNDS", "3"))


def run_once() -> None:
    sys.path.insert(0, os.getcwd())
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.sources.pdfparse import (
        parse_pdf_spans,
        spans_to_pdf,
    )

    docs = make_corpus(N_DOCS, seed=42)
    pdfs = [
        (d["doc_id"], spans_to_pdf(d["spans"], xref_stream=(i % 2 == 0)))
        for i, d in enumerate(docs)
    ]
    # warmup (JIT-free Python, but page-cache/alloc warm)
    for doc_id, b in pdfs[:40]:
        parse_pdf_spans(b, doc_id)
    t0 = time.time()
    n_spans = 0
    for doc_id, b in pdfs:
        n_spans += len(parse_pdf_spans(b, doc_id))
    dt = time.time() - t0
    print(json.dumps({"docs": N_DOCS, "sec": round(dt, 3),
                      "docs_per_sec": round(N_DOCS / dt, 1),
                      "spans": n_spans}))


def ab(path_b: str) -> None:
    here = os.getcwd()
    results: dict[str, list[float]] = {here: [], path_b: []}
    for _ in range(ROUNDS):
        for path in (here, path_b):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                cwd=path, capture_output=True, text=True,
            )
            line = out.stdout.strip().splitlines()[-1]
            results[path].append(json.loads(line)["sec"])
    a, b = min(results[here]), min(results[path_b])
    print(json.dumps({
        "a": {"path": here, "min_sec": a, "all": results[here]},
        "b": {"path": path_b, "min_sec": b, "all": results[path_b]},
        "a_over_b": round(a / b, 3),
    }, indent=1))


if __name__ == "__main__":
    if "--ab" in sys.argv:
        ab(sys.argv[sys.argv.index("--ab") + 1])
    else:
        run_once()
