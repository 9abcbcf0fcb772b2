"""Global top-k WITHOUT a global sort — per-batch partial top-k, then
one tiny merge block.

``ds.sort(...).limit(k)`` moves every row through an all-to-all
exchange to keep k of them; at 100 TB that is the textbook shuffle
bottleneck.  The combiner shape: each batch keeps only its own top-k
(vectorized ``np.argpartition`` — O(rows) not O(rows·log rows)), so at
most k rows per batch reach the single merge block, which re-selects
the global top-k.  Exchange volume is #batches × k rows, independent
of corpus size.

Deterministic total order (value DESC, doc_id ASC) so the gate query
hash-matches the SQL ``ORDER BY ... LIMIT k`` exactly, ties included.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOPK_DOCS = 20


def _topk_table(ids: np.ndarray, vals: np.ndarray, k: int) -> pa.Table:
    if len(ids) > k:
        # kth-largest value via O(n) select; rows ABOVE it are all in,
        # rows AT it fill the remainder smallest-doc_id-first — a plain
        # argpartition on value alone could keep the WRONG tied row at
        # the k boundary (the total order tie-breaks on doc_id ASC)
        vk = np.partition(vals, len(vals) - k)[len(vals) - k]
        above = vals > vk
        need = k - int(above.sum())
        tie_ids = np.sort(ids[vals == vk])[:need]
        keep = above | ((vals == vk) & np.isin(ids, tie_ids))
        ids, vals = ids[keep], vals[keep]
    order = np.lexsort((ids, -vals))  # value DESC, doc_id ASC
    return pa.Table.from_arrays(
        [pa.array(ids[order], pa.int64()),
         pa.array(vals[order], pa.int64())],
        names=["doc_id", "n_chars"])


def longest_docs(sf_dir: str, k: int = TOPK_DOCS):
    """Gate query: the k longest documents (by n_chars, doc_id
    tie-break)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_table(
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("n_chars").to_numpy(zero_copy_only=False), k)

    def merge(batch: pa.Table) -> pa.Table:
        return _topk_table(
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("n_chars").to_numpy(zero_copy_only=False), k)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow"))


def longest_docs_sql(k: int = TOPK_DOCS) -> str:
    return (f"SELECT doc_id, n_chars FROM documents "
            f"ORDER BY n_chars DESC, doc_id LIMIT {k}")


def register(q: dict, o: dict | None = None) -> None:
    q["longest_docs"] = longest_docs
    if o is not None:
        o["longest_docs"] = longest_docs_sql()
