from .portable import (
    MOD_SHINGLE,
    MINHASH_PARAMS,
    SIMHASH_BITS,
    shingle_hashes_sql,
    minhash_sql,
    simhash_sql,
    fingerprint_sql,
    safe_float,
    char_ratio,
)

__all__ = [
    "MOD_SHINGLE",
    "MINHASH_PARAMS",
    "SIMHASH_BITS",
    "shingle_hashes_sql",
    "minhash_sql",
    "simhash_sql",
    "fingerprint_sql",
    "safe_float",
    "char_ratio",
]
