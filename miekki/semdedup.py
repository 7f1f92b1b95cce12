"""X31 — SemDeDup-style semantic deduplication (Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023 — the public design this derives from).

Unlike X9 (embedding near-dup EDGES via sign-LSH buckets, which
unions into the edge table), SemDeDup is a KEEP/DROP decision: the
corpus is partitioned into k-means cells, and inside each cell every
pair is compared; of any group of semantic duplicates exactly one
survivor is kept. The paper's pinned keep-policy variant here:
order cell members by (cos_to_centroid ASC, id ASC) — the member
LEAST typical of the cell first — and flag a doc as a duplicate iff
some EARLIER-ordered doc in the same cell has cosine >= tau with it.
The survivor of each duplicate group is therefore its lowest-
centroid-cosine member (the paper's "keep low similarity to
centroid" choice), deterministically tie-broken by id.

Scale shape (the 10^12-vector story):
  * The quantizer is fit driver-side on a bounded deterministic
    sample and broadcast (embeddings.kmeans_centroids — the same
    trade the IVF path documents); ASSIGNMENT is distributed, one
    (batch, dim) @ (dim, k) matmul per Arrow batch with the cell's
    centroid-cosine falling out of the same product — zero per-row
    Python (flat-buffer densify, kernels.py pattern).
  * The pairwise stage shuffles ONCE on cell id and is applyInArrow
    per cell. Per-cell work is O(m^2) dot products but memory is
    O(block * m): the gram matrix is computed in row blocks against
    the already-ordered prefix, never materialized whole. n_cells is
    the knob that bounds m — the paper runs 50k cells for 100M docs;
    at 10^12 docs n_cells ~ 10^7 keeps cells ~10^5 rows (~3 GB of
    fp32 at dim 768, block-streamed). Hot cells are a data property
    (a mode in embedding space), not a hash artifact — the mitigation
    is raising n_cells, which this implementation takes as a
    parameter rather than hiding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from miekki.embeddings import _densify, kmeans_centroids

_BLOCK = 1024          # pairwise gram-matrix row-block (memory bound)


def _with_cell_cos(df: DataFrame, vec_col: str, centroids: np.ndarray,
                   id_col: str) -> DataFrame:
    """Append (cell:int, cent_cos:double) via ONE matmul per Arrow
    batch: cell = argmax_j cos(v, c_j), cent_cos = that max. The
    vector column rides along in the same batch (no join-back to
    re-attach it for the pairwise stage). Centroids are unit-norm
    (kmeans_centroids), so cos = (v . c_j) / |v|."""
    import pyarrow as pa

    from pyspark.sql.types import DoubleType, IntegerType, StructField

    ct = centroids.astype(np.float64).T          # (dim, k)
    out_schema = type(df.schema)(
        df.schema.fields + [StructField("cell", IntegerType()),
                            StructField("cent_cos", DoubleType())])

    def mapper(batches):
        for b in batches:
            m = _densify(b.column(b.schema.get_field_index(vec_col)))
            if m.shape[0] == 0:
                cell = np.empty(0, dtype=np.int32)
                cos = np.empty(0, dtype=np.float64)
            else:
                norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
                sims = (m @ ct) / norms[:, None]
                cell = sims.argmax(axis=1).astype(np.int32)
                cos = sims[np.arange(len(cell)), cell]
            b = b.append_column("cell", pa.array(cell, pa.int32()))
            yield b.append_column("cent_cos", pa.array(cos, pa.float64()))

    return df.mapInArrow(mapper, out_schema)


def _cell_dedup_fn(id_col: str, vec_col: str, threshold: float,
                   block: int = _BLOCK):
    """applyInArrow per-cell kernel: order members, block-stream the
    gram matrix against the ordered prefix, flag duplicates. ``block``
    is captured by value in the closure (a module global would reset
    to its default when executor workers re-import the module)."""
    import pyarrow as pa

    _block = int(block)

    def fn(table: pa.Table) -> pa.Table:
        ids = table.column(id_col).to_numpy(zero_copy_only=False)
        cos = table.column("cent_cos").to_numpy(zero_copy_only=False)
        cell = table.column("cell").to_numpy(zero_copy_only=False)
        m = _densify(table.column(vec_col))
        order = np.lexsort((ids, cos))           # (cent_cos, id) ASC
        m = m[order]
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(order)
        dup = np.zeros(n, dtype=bool)
        for lo in range(1, n, _block):
            hi = min(lo + _block, n)
            sims = m[lo:hi] @ m[:hi].T           # block vs full prefix
            # row i (global lo+i) may only match strictly earlier rows
            mask = np.tri(hi - lo, hi, k=lo - 1, dtype=bool)
            dup[lo:hi] = np.logical_and(sims >= threshold, mask).any(axis=1)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cell": pa.array(cell.astype(np.int32), pa.int32()),
            "cent_cos": pa.array(
                np.round(cos.astype(np.float64), 6), pa.float64()),
            "is_semantic_dup": pa.array(dup[inv]),
        })

    return fn


def semantic_dedup(vectors: DataFrame, n_cells: int = 32,
                   threshold: float = 0.95,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   block: int = _BLOCK) -> DataFrame:
    """(id, cell, cent_cos, is_semantic_dup) — every input row comes
    back exactly once; survivors are rows with is_semantic_dup =
    false (keep decision, not a filter: X24's never-discard-silently
    rule).

    id_col must be a 64-bit integer column (the repo's doc_id/vec_id
    convention): the Arrow kernel emits it as int64. Validated here
    so a string-id caller fails at plan time with a clear message,
    not executor-side in pa.array()."""
    id_type = vectors.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "long"):
        raise ValueError(
            f"semantic_dedup requires a 64-bit integer {id_col!r}"
            f" (got {id_type}); hash string ids first (exprs.doc_id_sql)")
    cents = kmeans_centroids(vectors, n_cells,
                             id_col=id_col, vec_col=vec_col)
    slim = vectors.select(id_col, vec_col)
    assigned = _with_cell_cos(slim, vec_col, cents, id_col)
    out_schema = ("{} long, cell int, cent_cos double,"
                  " is_semantic_dup boolean".format(id_col))
    return (assigned.groupBy("cell")
            .applyInArrow(_cell_dedup_fn(id_col, vec_col, threshold,
                                         block),
                          out_schema))
