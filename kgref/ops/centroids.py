"""Per-label embedding centroids — the vectorized groupby-mean over a
``list<float>`` column (cluster prototypes / class means for curriculum
or coreset selection).

Combiner shape: each batch reduces to (label, dim, partial_sum,
partial_n) with ONE numpy pass (stack → fixed-point int64 →
np.add.at on label codes), so the exchange carries #labels × dim rows
per batch — corpus-size-independent — and the final groupby runs over
a label×dim-sized table.  Sums are exact int64 fixed-point (1e-4), so
accumulation order can't flip the result and the mean hash-matches the
SQL oracle (same floor(sum/n + 0.5) finish on both sides).

At 100 TB the same shape holds: the all-to-all moves KBs per batch,
and no stage ever materializes the embedding matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def label_centroids(sf_dir: str):
    """Gate query: per-label mean embedding, long form
    (label, dim, value) with value fixed-point-rounded to 4 decimals."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n, d = len(emb), 0
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int32()), pa.array([], pa.int32()),
                 pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["label", "dim", "sum_fx", "n"])
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n
        # exact fixed-point per element, THEN sum (int64: no float
        # accumulation-order dependence)
        fx = np.floor(flat.astype(np.float64) * 10000 + 0.5).astype(
            np.int64).reshape(n, d)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        codes, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(codes), d), dtype=np.int64)
        np.add.at(sums, inv, fx)
        counts = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        g = len(codes)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(codes.astype(np.int32), d)),
             pa.array(np.tile(np.arange(1, d + 1, dtype=np.int32), g)),
             pa.array(sums.reshape(-1)),
             pa.array(np.repeat(counts, d))],
            names=["label", "dim", "sum_fx", "n"])

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_fx").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        val = np.floor(s.astype(np.float64) / n + 0.5) / 10000.0
        return pa.Table.from_arrays(
            [batch.column("label"), batch.column("dim"),
             pa.array(val, pa.float64())],
            names=["label", "dim", "value"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["label", "dim"])
            .aggregate(Sum("sum_fx", alias_name="sum_fx"),
                       Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pyarrow"))


def label_centroids_sql() -> str:
    return """
WITH x AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
              AS BIGINT) AS fx
  FROM embeddings)
SELECT CAST(label AS INTEGER) AS label, dim,
       floor(sum(fx) * 1.0 / count(*) + 0.5) / 10000 AS value
FROM x GROUP BY label, dim
"""


def register(q: dict, o: dict | None = None) -> None:
    q["label_centroids"] = label_centroids
    if o is not None:
        o["label_centroids"] = label_centroids_sql()
