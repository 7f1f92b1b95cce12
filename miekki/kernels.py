"""Arrow-vectorized kernels — the ONLY Python that touches row data
(BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python) throughout"; row-at-a-time F.udf is banned).

The MinHash/SimHash kernel (SURVEY.md §2.3) runs over mapInArrow:
one Arrow batch in, the ListArray's flat int64 value buffer + offsets
out, numpy does the (n_perm x n_shingles) affine-permutation min with
uint64 wraparound — no per-row Python objects anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from miekki.config import DedupConfig, perm_coeffs
from miekki.textproc import extract_text

SIG_SCHEMA = "doc_id long, minhash array<bigint>, simhash bigint"

# memory governor for the permutation matrix: perm-block x value-chunk
# x 8B stays ~50 MB per python worker (SURVEY.md §4.3)
_PERM_BLOCK = 32
_MAX_CHUNK_VALUES = 200_000


def _row_chunks(offsets: np.ndarray, max_values: int) -> Iterator[tuple[int, int]]:
    """Yield (row_start, row_end) slices whose flat value count stays
    under max_values (always >= 1 row per slice)."""
    n_rows = len(offsets) - 1
    start = 0
    while start < n_rows:
        end = start + 1
        while end < n_rows and offsets[end + 1] - offsets[start] <= max_values:
            end += 1
        yield start, end
        start = end


def _minhash_simhash_chunk(values_u64: np.ndarray, starts: np.ndarray,
                           a: np.ndarray, b: np.ndarray, n_perm: int,
                           scratch: np.ndarray):
    """values_u64: flat shingle hashes; starts: row start offsets into
    it (strictly increasing — shingling guarantees >=1 per row).
    ``scratch``: reused uint64 buffer >= len(values_u64) — fresh large
    allocations per chunk are page-fault-bound (~50x slower than the
    arithmetic itself, measured) so all hot ops write into it.
    Returns (sig (rows, n_perm) int64, fp (rows,) int64)."""
    n_rows = len(starts)
    n = len(values_u64)
    buf = scratch[:n]
    sig = np.empty((n_rows, n_perm), dtype=np.uint64)
    for i in range(n_perm):
        # uint64 wraparound multiply-add == (a*h + b) mod 2^64
        np.multiply(values_u64, a[i], out=buf)
        buf += b[i]
        sig[:, i] = np.minimum.reduceat(buf, starts)

    # SimHash rides the same flat buffer: unpack bits little-endian,
    # per-row vote = 2*ones - n, fingerprint bit = vote > 0 (ties -> 0)
    bits = np.unpackbits(values_u64.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int32)
    counts = np.diff(np.append(starts, n)).astype(np.int64)   # (rows,)
    votes = 2 * ones.astype(np.int64) - counts[:, None]
    shifts = np.arange(64, dtype=np.uint64)
    fp = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64)
    return sig.view(np.int64), fp.view(np.int64)


def make_signature_kernel(cfg: DedupConfig):
    """mapInArrow function: (doc_id, shingles:array<long>) batches →
    (doc_id, minhash:array<long>[n_perm], simhash:long) batches."""
    n_perm = cfg.n_perm
    a, b = perm_coeffs(n_perm, cfg.perm_seed)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        scratch = np.empty(_MAX_CHUNK_VALUES, dtype=np.uint64)
        for batch in batches:
            doc_id = batch.column("doc_id")
            lst = batch.column("shingles")
            if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
                lst = lst.combine_chunks()
            offsets = lst.offsets.to_numpy().astype(np.int64)
            values = lst.values.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            # account for a non-zero buffer offset (sliced arrays)
            if offsets[0] != 0:
                values = values[: offsets[-1]]
            if np.any(np.diff(offsets) <= 0):
                raise ValueError("empty shingle set — shingling must yield >=1")

            n_rows = len(offsets) - 1
            sig = np.empty((n_rows, n_perm), dtype=np.int64)
            fp = np.empty(n_rows, dtype=np.int64)
            for rs, re_ in _row_chunks(offsets, _MAX_CHUNK_VALUES):
                vals = values[offsets[rs]: offsets[re_]]
                starts = offsets[rs:re_] - offsets[rs]
                scr = scratch if len(vals) <= len(scratch) else \
                    np.empty(len(vals), dtype=np.uint64)  # one giant row
                s, f = _minhash_simhash_chunk(vals, starts, a, b, n_perm, scr)
                sig[rs:re_] = s
                fp[rs:re_] = f

            mh = pa.ListArray.from_arrays(
                pa.array(np.arange(n_rows + 1, dtype=np.int32) * n_perm),
                pa.array(sig.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [doc_id, mh, pa.array(fp)],
                names=["doc_id", "minhash", "simhash"],
            )

    return kernel


def extract_text_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow: (url, html:binary) → (url, text:string).

    HTML parsing is inherently per-string work; it still moves data in
    Arrow batches (one IPC round-trip per 2048 rows), never per-row
    serde (SURVEY.md O2)."""
    for batch in batches:
        html = batch.column("html")
        texts = pa.array([extract_text(h.as_py()) for h in html], type=pa.string())
        yield pa.RecordBatch.from_arrays([batch.column("url"), texts],
                                         names=["url", "text"])


EXTRACT_SCHEMA = "url string, text string"
