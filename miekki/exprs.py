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


def doc_id_sql(url_sql: str, cfg: DedupConfig) -> str:
    """doc-id expression (O4). 64-bit: hash1_sql (bigint). 128-bit:
    hi||lo packed into BINARY(16) via hex/unhex — hi is exactly the
    64-bit id (lpad: hex() drops leading zeros on bigint), so the two
    modes agree on identity up to the collision rescue."""
    if cfg.id_bits == 64:
        return hash1_sql(url_sql, cfg)
    hi = hash1_sql(url_sql, cfg)
    lo = hash1_sql(f"reverse({url_sql})", cfg)
    return (f"unhex(concat(lpad(hex({hi}), 16, '0'),"
            f" lpad(hex({lo}), 16, '0')))")


def id_spark_type(cfg: DedupConfig) -> str:
    """DDL type of doc_id-valued columns (Arrow kernel schemas are
    built with this so binary ids pass through untouched)."""
    return "long" if cfg.id_bits == 64 else "binary"


def md5_hash1_py(value) -> int:
    """Python twin of hash1_sql in md5 mode (oracle use)."""
    import hashlib

    return int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)


def zip_word_grams(words, n: int):
    """Word n-grams of a split-words array Column by CHAINED zip_with
    over n-1 shifted whole-array slices — identical values to
    transform(sequence, i -> concat_ws(' ', slice(words, i, n))) but
    ~8x faster (measured mult=16: the per-gram lambda + per-gram
    slice also keeps the surrounding projection out of whole-stage
    codegen). Docs shorter than n words yield ONE gram = the whole
    text (the shingling short-doc convention, SURVEY.md §2.1); split()
    never yields NULL elements so the concat chain is NULL-safe."""
    from pyspark.sql import functions as F

    size = F.size(words)
    m = size - (n - 1)                     # number of full n-grams
    g = F.slice(words, 1, m)
    for j in range(1, n):
        g = F.zip_with(g, F.slice(words, 1 + j, m),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(size >= n, g).otherwise(
        F.array(F.concat_ws(" ", words)))
