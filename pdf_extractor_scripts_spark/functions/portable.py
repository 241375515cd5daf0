"""Engine-portable SQL expression builders.

The correctness gate runs every query twice — once on Spark, once on DuckDB —
and hash-compares the values. Engine-native hash functions (xxhash64, md5 over
differing binary encodings, ...) do NOT agree across engines, so every hash
used in deduplication / fingerprinting / LSH here is plain 64-bit modular
arithmetic over ``ascii()`` codepoints, which both engines evaluate
identically. All helpers return *SQL text* with two dialect spellings:

* ``dialect="spark"``  — uses ``transform`` / ``aggregate`` / ``array_min``
* ``dialect="duckdb"`` — uses ``list_transform`` / ``list_min`` / ``list_sum``

Numbers are kept below 2^31 after every ``%`` so both engines stay in exact
integer arithmetic (no overflow, no float drift).

Semantics modeled on the reference repo's helpers (see SURVEY.md §2.9):
`_safe_float_convert` (text_pdf_processor.py:2566-2572) and the char-class
ratio checks (pdf_text_detector.py:231-247).
"""

from __future__ import annotations

# Modulus for shingle hashes: prime < 2^20 so a*h+b stays < 2^63 comfortably.
MOD_SHINGLE = 1048573

# (a, b) pairs for the universal-hash family h_i(x) = (a*x + b) % MOD_SHINGLE.
# Fixed constants — determinism is part of the contract (FIXTURES.md preamble).
MINHASH_PARAMS = [
    (769, 12289), (1543, 24593), (3079, 49157), (6151, 98317),
    (12289, 196613), (24593, 393241), (49157, 786433), (98317, 1572869),
    (196613, 3145739), (393241, 6291469), (786433, 12582917), (1572869, 25165843),
    (3145739, 50331653), (6291469, 100663319), (12582917, 201326611), (25165843, 402653189),
]

SIMHASH_BITS = 16

# Sentinel minhash value for texts shorter than one shingle.
_EMPTY_MIN = MOD_SHINGLE


def _seq(dialect: str, lo: str, hi: str) -> str:
    if dialect == "spark":
        return f"sequence({lo}, {hi})"
    return f"generate_series({lo}, {hi})"


def _xform(dialect: str, arr: str, lam: str) -> str:
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({arr}, {lam})"


def _amin(dialect: str, arr: str) -> str:
    fn = "array_min" if dialect == "spark" else "list_min"
    return f"{fn}({arr})"


def _asum(dialect: str, arr: str) -> str:
    if dialect == "spark":
        return f"aggregate({arr}, cast(0 as bigint), (acc, x) -> acc + cast(x as bigint))"
    return f"coalesce(list_sum({arr}), 0)"


def _idx_cast(dialect: str, i: str) -> str:
    # Spark's substr() index argument must be INT, sequence() yields BIGINT.
    return f"cast({i} as int)" if dialect == "spark" else i


def shingle_hashes_sql(col: str, dialect: str, n: int = 3) -> str:
    """Array of polynomial hashes of all character ``n``-grams of ``col``.

    hash(c1..c3) = (ascii(c1)*31^2 + ascii(c2)*31 + ascii(c3)) % MOD_SHINGLE.
    Returns an empty array for texts shorter than ``n``.
    """
    assert n == 3, "only 3-gram shingles wired up"
    i = "i"
    ic = _idx_cast(dialect, i)
    ic1 = _idx_cast(dialect, f"{i}+1")
    ic2 = _idx_cast(dialect, f"{i}+2")
    body = (
        f"(ascii(substr({col}, {ic}, 1))*961 "
        f"+ ascii(substr({col}, {ic1}, 1))*31 "
        f"+ ascii(substr({col}, {ic2}, 1))) % {MOD_SHINGLE}"
    )
    seq = _seq(dialect, "1", f"length({col})-2")
    arr = _xform(dialect, seq, f"{i} -> {body}")
    # Guard: length < 3 → empty array (sequence(1,0) errors in neither engine,
    # but Spark sequence(1, -1) yields a descending sequence — guard explicitly).
    if dialect == "spark":
        return f"CASE WHEN length({col}) >= 3 THEN {arr} ELSE array() END"
    return f"CASE WHEN length({col}) >= 3 THEN {arr} ELSE [] END"


def minhash_sql(col: str, dialect: str, k: int = 8) -> list[str]:
    """``k`` minhash expressions over the 3-gram shingle hashes of ``col``.

    MinHash+LSH dedup per the classic Broder construction; both dialects
    produce bit-identical signatures (pure integer arithmetic).
    """
    sh = shingle_hashes_sql(col, dialect)
    out = []
    for a, b in MINHASH_PARAMS[:k]:
        # cast h to bigint: a*h exceeds int32 and Spark 4 runs ANSI mode.
        mapped = _xform(dialect, sh, f"h -> (({a}*cast(h as bigint) + {b}) % {MOD_SHINGLE})")
        m = _amin(dialect, mapped)
        out.append(f"coalesce({m}, {_EMPTY_MIN})")
    return out


def simhash_sql(col: str, dialect: str, bits: int = SIMHASH_BITS) -> str:
    """``bits``-wide SimHash of ``col`` over 3-gram shingle hashes.

    bit b set iff sum over shingles of (2*((h>>b)&1) - 1) > 0.
    """
    sh = shingle_hashes_sql(col, dialect)
    terms = []
    for b in range(bits):
        # Integer division spelled portably: Spark lacks `//`, DuckDB lacks
        # `div`; floor(h / 2^b) on positive ints is exact in both.
        bit = f"(cast(floor(h / {1 << b}) as bigint) % 2)"
        votes = _xform(dialect, sh, f"h -> (2 * {bit} - 1)")
        s = _asum(dialect, votes)
        terms.append(f"(CASE WHEN {s} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def fingerprint_sql(col: str, dialect: str) -> str:
    """Order-sensitive rolling-hash document fingerprint.

    fp = sum_i ascii(char_i) * (i % 97 + 1)  (mod 2^31-1) — cheap, portable,
    order-sensitive (a permutation of the text changes it). Stands in for the
    reference's raw-text identity artifacts (text_pdf_processor.py:406-418).
    """
    i = "i"
    ic = _idx_cast(dialect, i)
    seq = _seq(dialect, "1", f"length({col})")
    arr = _xform(dialect, seq, f"{i} -> ascii(substr({col}, {ic}, 1)) * (({i} % 97) + 1)")
    expr = f"({_asum(dialect, arr)} % 2147483647)"
    # DuckDB's list_sum yields HUGEINT → pandas float; pin to BIGINT.
    return f"cast({expr} as bigint)"


def safe_float(col: str, dialect: str) -> str:
    """Reference `_safe_float_convert` (text_pdf_processor.py:2566-2572):
    strip commas/$ then cast, default 0.0 on failure."""
    flags = ", 'g'" if dialect == "duckdb" else ""
    cleaned = f"regexp_replace({col}, '[,$]', ''{flags})"
    return f"coalesce(try_cast({cleaned} as double), cast(0.0 as double))"


def char_ratio(col: str, char_class: str, dialect: str) -> str:
    """Fraction of characters of ``col`` in regex class ``char_class``
    (pdf_text_detector.py:231-247 semantics)."""
    flags = ", 'g'" if dialect == "duckdb" else ""
    kept = f"length(regexp_replace({col}, '[^{char_class}]', ''{flags}))"
    return f"(cast({kept} as double) / cast(greatest(length({col}), 1) as double))"
