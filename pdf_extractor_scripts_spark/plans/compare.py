"""Local replica of the driver's correctness gate: run each registered query
on Spark AND its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Used by tests/test_queries_vs_duckdb.py so every entry in
``__spark_entry__.queries()`` is pre-validated before the driver sees it.
"""

from __future__ import annotations

import math
from typing import Optional

import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — mirrors an
    order-insensitive value-hash comparison."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("Int64")
        elif isinstance(s.dtype, object.__class__) or s.dtype == object:
            try:
                import decimal

                if s.map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = s.astype("float64").round(9)
                else:
                    df[c] = s.astype("string")
            except Exception:
                df[c] = s.astype("string")
        else:
            df[c] = s.astype("string")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> Optional[str]:
    """Return None when they match, else a short diagnostic string."""
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        xa, xb = a[c], b[c]
        if pd.api.types.is_float_dtype(xa) and pd.api.types.is_float_dtype(xb):
            ok = [
                (pd.isna(u) and pd.isna(v))
                or (not pd.isna(u) and not pd.isna(v) and math.isclose(u, v, rel_tol=0, abs_tol=1e-9))
                for u, v in zip(xa, xb)
            ]
            if not all(ok):
                i = ok.index(False)
                return f"value mismatch col={c} row={i}: spark={xa[i]!r} oracle={xb[i]!r}"
        else:
            eq = (xa.fillna("<NA>") == xb.fillna("<NA>")) if xa.dtype == xb.dtype else (
                xa.astype("string").fillna("<NA>") == xb.astype("string").fillna("<NA>")
            )
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                return f"value mismatch col={c} row={i}: spark={xa[i]!r} oracle={xb[i]!r}"
    return None


def run_one(spark, con, name: str, sf_dir: str) -> Optional[str]:
    from .registry import all_specs

    spec = all_specs()[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return None if len(sdf) >= 0 else "spark query failed"
    odf = con.sql(spec.oracle).df()
    return compare_frames(sdf, odf)
