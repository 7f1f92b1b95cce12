"""Generate tests/golden/xxhash64_vectors.json FROM Spark (FIXTURES.md F3).

Run once at M0; the golden file pins oracle.xxh64 against Spark's
F.xxhash64 forever after. Also sanity-checks the oracle inline.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, types as T

from oracle.xxh64 import spark_xxhash64

spark = (
    SparkSession.builder.master("local[4]")
    .appName("gen_xxhash_vectors")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

strings = ["", "a", "ab", "abc", "abcd", "hello world", "x" * 31, "x" * 32,
           "x" * 33, "y" * 100, "中文字符串", "mixed 中文 and ascii",
           "tab\tnewline\ncr\r", "quick brown fox jumps over the lazy dog " * 5]
longs = [0, 1, -1, 42, -42, 2**62, -(2**62), 2**63 - 1, -(2**63), 1234567890123456789]

rows = [(s, None) for s in strings] + [(None, v) for v in longs]
df = spark.createDataFrame(rows, T.StructType([
    T.StructField("s", T.StringType()),
    T.StructField("l", T.LongType()),
]))

out = df.select(
    "s", "l",
    F.xxhash64("s").alias("h_s"),
    F.xxhash64("l").alias("h_l"),
    F.xxhash64("s", "l").alias("h_sl"),
    F.xxhash64("l", "s").alias("h_ls"),
    F.xxhash64("l", "l", "l").alias("h_lll"),
).collect()

vectors = []
bad = 0
for r in out:
    rec = {"s": r.s, "l": r.l, "h_s": r.h_s, "h_l": r.h_l,
           "h_sl": r.h_sl, "h_ls": r.h_ls, "h_lll": r.h_lll}
    vectors.append(rec)
    if r.s is not None:
        got = spark_xxhash64(r.s)
        if got != r.h_s:
            print(f"MISMATCH str {r.s!r}: spark={r.h_s} py={got}")
            bad += 1
    if r.l is not None:
        got = spark_xxhash64(r.l)
        if got != r.h_l:
            print(f"MISMATCH long {r.l}: spark={r.h_l} py={got}")
            bad += 1
        got3 = spark_xxhash64(r.l, r.l, r.l)
        if got3 != r.h_lll:
            print(f"MISMATCH lll {r.l}: spark={r.h_lll} py={got3}")
            bad += 1

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "golden", "xxhash64_vectors.json")
with open(path, "w") as f:
    json.dump(vectors, f, indent=1)
print(f"wrote {len(vectors)} vectors to {path}; mismatches={bad}")
spark.stop()
sys.exit(1 if bad else 0)
