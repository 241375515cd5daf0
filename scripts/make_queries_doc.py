#!/usr/bin/env python
"""Regenerate docs/QUERIES.md: the registry index (name, oracle-checked?,
doc) — run after adding queries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pdf_extractor_scripts_spark.plans.registry import all_queries, all_specs

    qs = all_specs()
    gated = set(all_queries())
    os.makedirs("docs", exist_ok=True)
    with open("docs/QUERIES.md", "w") as f:
        f.write(
            "# QUERIES — the driver-contract registry\n\n"
            f"{len(qs)} entries ({len(gated)} gated = exposed through the driver "
            "contract; the rest are locally-checked extras); every one runs "
            "as Spark DataFrame/SQL and (unless marked rows-only) is "
            "hash-compared against its DuckDB oracle at sf0.001 and sf0.01.\n\n"
            "| # | name | gated | oracle | description |\n|---|---|---|---|---|\n"
        )
        for i, (name, spec) in enumerate(sorted(qs.items()), 1):
            oracle = "✓" if spec.oracle else "rows-only"
            g = "✓" if name in gated else "extra"
            doc = " ".join(spec.doc.split()).replace("|", "\\|")
            f.write(f"| {i} | `{name}` | {g} | {oracle} | {doc} |\n")
    print(f"wrote docs/QUERIES.md ({len(qs)} entries)")


if __name__ == "__main__":
    main()
