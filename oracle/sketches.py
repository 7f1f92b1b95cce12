"""Oracle MinHash / SimHash kernels — straightforward numpy, written
independently of the Spark pUDF kernels (which are batch-vectorized);
tests assert bit-for-bit equality (SURVEY.md §5.1).
"""

from __future__ import annotations

import numpy as np

from miekki.config import DedupConfig, perm_coeffs
from miekki.textproc import char_shingles, normalize_text
from oracle.xxh64 import spark_xxhash64, to_u64

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def shingle_hashes(text: str, cfg: DedupConfig = DedupConfig()) -> list[int]:
    """Distinct k-shingle xxhash64 values (signed int64, Spark order
    irrelevant — treated as a set downstream)."""
    norm = normalize_text(text)
    return sorted({spark_xxhash64(s) for s in char_shingles(norm, cfg.shingle_k)})


def minhash_signature(hashes_i64, cfg: DedupConfig = DedupConfig()) -> np.ndarray:
    """128-long MinHash signature over a shingle-hash set.

    sig[i] = min_h (A_i*h + B_i mod 2^64), reinterpreted int64
    (SURVEY.md §2.3). ``hashes_i64``: iterable of signed 64-bit ints.
    """
    a, b = perm_coeffs(cfg.n_perm, cfg.perm_seed)
    h = np.array([to_u64(x) for x in hashes_i64], dtype=np.uint64)
    if h.size == 0:
        raise ValueError("empty shingle set (shingling guarantees >=1)")
    # (n_perm, n) affine permutations with uint64 wraparound
    p = a[:, None] * h[None, :] + b[:, None]
    return p.min(axis=1).view(np.int64)


def simhash_fingerprint(hashes_i64, cfg: DedupConfig = DedupConfig()) -> int:
    """64-bit SimHash over distinct shingle hashes, weight 1 each.

    Bit j of the fingerprint = 1 iff sum over features of
    (2*bit_j(h) - 1) > 0 (ties -> 0; pinned in SURVEY.md §2.1).
    Returns signed int64.
    """
    h = np.array([to_u64(x) for x in hashes_i64], dtype=np.uint64)
    # '<u8' pins little-endian byte order: a bare .view(uint8) on a
    # big-endian host would emit most-significant bytes first and
    # bit_j(h) would no longer be column j — the oracle would diverge
    # from the Spark kernel and every golden file
    bits = np.unpackbits(h.astype("<u8").view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(h)  # sum of +/-1 per bit
    fp_bits = (votes > 0).astype(np.uint64)
    fp = np.uint64(0)
    for j in range(cfg.simhash_bits):
        fp |= fp_bits[j] << np.uint64(j)
    return int(fp.view(np.int64))


def hamming64(a_i64: int, b_i64: int) -> int:
    return bin((a_i64 ^ b_i64) & 0xFFFFFFFFFFFFFFFF).count("1")


def band_hashes(sig_i64: np.ndarray, cfg: DedupConfig = DedupConfig()) -> list[tuple[int, int]]:
    """LSH band hashes: (band_id, xxhash64(band_id, sig[4b:4b+4]...))
    — multi-arg chained xxhash64, band_id hashed as long
    (SURVEY.md §2.1)."""
    out = []
    r = cfg.rows_per_band
    for b in range(cfg.bands):
        args = [b] + [int(sig_i64[b * r + j]) for j in range(r)]
        out.append((b, spark_xxhash64(*args)))
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Signature-estimated Jaccard = mean positionwise equality."""
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))


def true_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(char_shingles(normalize_text(text_a), k))
    sb = set(char_shingles(normalize_text(text_b), k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
