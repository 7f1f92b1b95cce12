"""Pin oracle.xxh64 against Spark-generated golden vectors
(FIXTURES.md F3; SURVEY.md §7 M0 hard-part #3)."""

import json
import os

from oracle.xxh64 import spark_xxhash64

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "xxhash64_vectors.json")


def test_golden_vectors():
    with open(GOLDEN) as f:
        vectors = json.load(f)
    assert len(vectors) >= 20
    for v in vectors:
        if v["s"] is not None:
            assert spark_xxhash64(v["s"]) == v["h_s"], v
        if v["l"] is not None:
            assert spark_xxhash64(v["l"]) == v["h_l"], v
            assert spark_xxhash64(v["l"], v["l"], v["l"]) == v["h_lll"], v
        if v["s"] is not None and v["l"] is not None:
            assert spark_xxhash64(v["s"], v["l"]) == v["h_sl"], v
            assert spark_xxhash64(v["l"], v["s"]) == v["h_ls"], v


def test_signed_range():
    h = spark_xxhash64("anything")
    assert -(2**63) <= h < 2**63
