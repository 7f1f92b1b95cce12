"""Hash-expression helpers (SURVEY.md §3.2 hash-portability rule).

Production uses Spark-native ``xxhash64`` (JVM, codegen'd). For the
driver's DuckDB cross-check, ``hash_fn='md5'`` swaps in an
md5-derived 60-bit integer that is hex-identical in both engines:
``conv(substring(md5(x),1,15),16,10)``. Multi-arg hashes in md5 mode
concat with '|' — same formula on the DuckDB side.
"""

from __future__ import annotations

from miekki.config import DedupConfig


def hash1_sql(arg_sql: str, cfg: DedupConfig) -> str:
    """64-bit hash of ONE string/long SQL expression → bigint."""
    if cfg.hash_fn == "xxhash64":
        return f"xxhash64({arg_sql})"
    return f"cast(conv(substring(md5(cast({arg_sql} as string)), 1, 15), 16, 10) as bigint)"


def hash_multi_sql(args_sql: list[str], cfg: DedupConfig) -> str:
    """Chained multi-argument hash → bigint (band hashes)."""
    if cfg.hash_fn == "xxhash64":
        return f"xxhash64({', '.join(args_sql)})"
    joined = ", ".join(f"cast({a} as string)" for a in args_sql)
    return (f"cast(conv(substring(md5(concat_ws('|', {joined})), 1, 15), 16, 10)"
            " as bigint)")


def md5_hash1_py(value) -> int:
    """Python twin of hash1_sql in md5 mode (oracle use)."""
    import hashlib

    return int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)
