"""Spark-free kernel tests: the mapInArrow numpy kernel vs the
plain-loop oracle, plus MinHash statistical properties
(SURVEY.md §5.1/§5.2). hypothesis drives random shingle sets.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from miekki.config import DedupConfig, perm_coeffs
from miekki.kernels import make_signature_kernel
from oracle.sketches import (est_jaccard, minhash_signature,
                             simhash_fingerprint)

CFG = DedupConfig()

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
shingle_sets = st.lists(i64, min_size=1, max_size=200, unique=True)


def run_kernel(rows):
    """rows: list of shingle-hash lists -> (minhash rows, simhash rows)"""
    kernel = make_signature_kernel(CFG)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(range(len(rows))), type=pa.int64()),
         pa.array(rows, type=pa.list_(pa.int64()))],
        names=["doc_id", "shingles"],
    )
    out = list(kernel(iter([batch])))
    assert len(out) == 1
    return (out[0].column("minhash").to_pylist(),
            out[0].column("simhash").to_pylist())


@settings(max_examples=50, deadline=None)
@given(st.lists(shingle_sets, min_size=1, max_size=8))
def test_kernel_matches_oracle(rows):
    mhs, fps = run_kernel(rows)
    for row, mh, fp in zip(rows, mhs, fps):
        assert mh == list(minhash_signature(row, CFG))
        assert fp == simhash_fingerprint(row, CFG)


def test_kernel_chunking_boundary():
    # force the row-chunk governor: rows bigger than _MAX_CHUNK_VALUES/2
    rng = np.random.Generator(np.random.PCG64(7))
    rows = [list(np.unique(rng.integers(-(2**62), 2**62, size=n)))
            for n in (150_000, 120_000, 3, 1, 99_000)]
    mhs, fps = run_kernel(rows)
    for row, mh, fp in zip(rows, mhs, fps):
        assert mh == list(minhash_signature(row, CFG))
        assert fp == simhash_fingerprint(row, CFG)


def test_perm_bijectivity():
    """Odd-A affine maps are injective on sampled uint64 inputs
    (SURVEY.md §5.2)."""
    a, b = perm_coeffs(CFG.n_perm, CFG.perm_seed)
    assert np.all(a % 2 == 1)
    rng = np.random.Generator(np.random.PCG64(3))
    h = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    for i in (0, 63, 127):
        p = a[i] * h + b[i]
        assert len(np.unique(p)) == len(np.unique(h))


def test_minhash_estimator_unbiased():
    """|est_J - true_J| small at 128 perms on seeded random set pairs
    (statistical bound: 4 sigma with sigma = sqrt(J(1-J)/128))."""
    rng = np.random.Generator(np.random.PCG64(11))
    for _ in range(10):
        n_common = int(rng.integers(50, 400))
        n_a = int(rng.integers(0, 200))
        n_b = int(rng.integers(0, 200))
        pool = np.unique(rng.integers(-(2**62), 2**62, size=n_common + n_a + n_b))
        common, rest = pool[:n_common], pool[n_common:]
        sa = np.concatenate([common, rest[: len(rest) // 2]])
        sb = np.concatenate([common, rest[len(rest) // 2:]])
        true_j = len(common) / len(np.union1d(sa, sb))
        est = est_jaccard(minhash_signature(sa.tolist(), CFG),
                          minhash_signature(sb.tolist(), CFG))
        sigma = max(np.sqrt(true_j * (1 - true_j) / CFG.n_perm), 1e-3)
        assert abs(est - true_j) < 4 * sigma + 0.02, (true_j, est)


def test_simhash_close_for_similar_sets():
    rng = np.random.Generator(np.random.PCG64(13))
    base = np.unique(rng.integers(-(2**62), 2**62, size=500)).tolist()
    variant = base[:-5] + rng.integers(-(2**62), 2**62, size=5).tolist()
    fa = simhash_fingerprint(base, CFG)
    fb = simhash_fingerprint(variant, CFG)
    ham = bin((fa ^ fb) & (2**64 - 1)).count("1")
    assert ham <= 8  # 1% feature churn stays within a few bits


# --- fused text->signature kernel (r2) --------------------------------

def test_xxh64_fixed_matches_oracle():
    """Vectorized XXH64 vs the golden-pinned scalar oracle across all
    lane paths: empty, byte tail, dword, word loop, >=32B stripes."""
    from miekki.kernels import xxh64_fixed
    from oracle.xxh64 import xxh64_bytes

    rng = np.random.Generator(np.random.PCG64(7))
    for L in [0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 15, 16, 20, 31, 32, 33,
              40, 63, 64, 71]:
        n = 17
        mat = rng.integers(0, 256, size=(n, L), dtype=np.uint8)
        got = xxh64_fixed(mat, 42)
        want = np.array([xxh64_bytes(bytes(mat[i]), 42) for i in range(n)],
                        dtype=np.uint64)
        assert (got == want).all(), f"L={L}"


def test_shingle_hash_rows_matches_sql_semantics():
    """Pure-numpy shingle pass vs the Python oracle shingle set
    (char k-grams of UTF-8 text, whole-text window when shorter
    than k, empty text hashes b'')."""
    from miekki.kernels import _shingle_hash_rows
    from miekki.textproc import char_shingles
    from oracle.xxh64 import xxh64_bytes

    texts = ["hello world test", "中文测试文档", "emoji 🎉🎊 mix",
             "ab", "", "x", "ñandú ñandú ñandú", "aaaaaaaa"]
    k = CFG.shingle_k
    data = np.frombuffer("".join(texts).encode("utf-8"), dtype=np.uint8)
    rel = np.cumsum([0] + [len(t.encode("utf-8")) for t in texts]).astype(np.int64)
    values, starts, counts = _shingle_hash_rows(data, rel, k)
    for i, t in enumerate(texts):
        got = set(values[starts[i]: starts[i] + counts[i]].tolist())
        want = {xxh64_bytes(s.encode("utf-8"), 42)
                for s in char_shingles(t, k)} or {xxh64_bytes(b"", 42)}
        assert got == want, t
        assert counts[i] == len(want)


def test_payload_hashes_trailing_empty_row():
    """A batch whose LAST row is an empty payload indexes the inverse
    power table at n — sized n+1 so the whole Arrow task doesn't die
    (it crashed before r4's fix whenever an empty doc landed last)."""
    import numpy as np

    from miekki.substr_kernels import payload_hashes

    data = np.frombuffer(b"abc", dtype=np.uint8)
    trail = payload_hashes(data, np.array([0, 3, 3], dtype=np.int64))
    lead = payload_hashes(data, np.array([0, 0, 3], dtype=np.int64))
    # same content hashes regardless of where the empty row sits
    assert trail[0] == lead[1] and trail[1] == lead[0]


def test_utf8_view_large_string_offsets():
    """large_string carries int64 offsets; reading them as int32
    silently hashes the wrong bytes into every signature (the
    _bin_view guard, applied to the text view)."""
    import pyarrow as pa

    from miekki.kernels import _utf8_view

    for t in (pa.string(), pa.large_string()):
        data, offs = _utf8_view(pa.array(["hello", "world"], type=t))
        assert list(offs) == [0, 5, 10], t
        assert bytes(data[:5]) == b"hello", t


def test_md5_mode_signatures_consistent(spark):
    """DedupConfig(hash_fn='md5') must route signatures_from_text
    through the SQL shingle path: the fused kernel only speaks xxh64,
    and silently using it would mix md5 doc ids with xxh64 shingle
    hashes (matches neither oracle)."""
    from miekki.config import DedupConfig
    from miekki.stages.normalize import with_shingles
    from miekki.stages.signatures import (compute_signatures,
                                          signatures_from_text)

    cfg = DedupConfig(hash_fn="md5")
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "lorem ipsum dolor sit amet " * 3)
         for i in range(20)], ["doc_id", "norm_text"])
    fused = {r["doc_id"]: r for r in
             signatures_from_text(docs, cfg).collect()}
    two_step = {r["doc_id"]: r for r in
                compute_signatures(with_shingles(docs, cfg), cfg).collect()}
    assert set(fused) == set(two_step)
    for i in fused:
        assert fused[i]["minhash"] == two_step[i]["minhash"]
        assert fused[i]["simhash"] == two_step[i]["simhash"]
        assert fused[i]["n_shingles"] > 0
