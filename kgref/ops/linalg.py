"""Distributed exact Gram matrix (Xᵀ X) over the embedding column —
linear algebra as a combiner: each batch reduces to ONE d×d partial
product (a single int64 matmul), so the all-to-all carries d(d+1)/2
rows per batch regardless of corpus size, and the final groupby runs
over a d²-sized table.  This is the prologue every spectral method
needs at scale (PCA / whitening / least squares: eigendecompose the
d×d result on the driver — d is 64 here, 1–4k in production, always
driver-sized even when X is 100 TB).

Exactness: elements are fixed-point int64 (1e-4, the label_centroids
convention), so the partial matmul and the global Sum are exact
integers — accumulation order cannot flip the driver's value hash, and
the DuckDB twin (self-join on vec_id over the unnested vectors, HUGEINT
sum) is bit-identical.  Overflow bound (documented, not silent): with
|x| ≤ 6.5 the per-element product is < 2²⁷·2⁷⁰⁻⁷⁰… concretely
fx_i·fx_j ≤ 4.2e9, so int64 holds the exact global sum up to ~2×10⁹
corpus rows per (i, j) cell; past that, split the fx products hi/lo
(the ops/m61.py decomposition) or drop to 1e-3 fixed point.

At 100 TB the same shape holds: no stage materializes the embedding
matrix, the exchange is KBs per batch, and the d×d result is the only
thing the driver ever sees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FX = 10_000


def embed_gram(sf_dir: str):
    """Gate query: upper-triangle Gram matrix of the fixed-point
    embeddings, long form (i, j, gram_fx) with 1-based dims, i ≤ j."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int32()), pa.array([], pa.int32()),
                 pa.array([], pa.int64())],
                names=["i", "j", "gram_fx"])
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n
        fx = np.floor(flat.astype(np.float64) * _FX + 0.5).astype(
            np.int64).reshape(n, d)
        g = fx.T @ fx  # ONE exact int64 matmul: the whole batch → d×d
        iu, ju = np.triu_indices(d)
        return pa.Table.from_arrays(
            [pa.array((iu + 1).astype(np.int32)),
             pa.array((ju + 1).astype(np.int32)),
             pa.array(g[iu, ju])],
            names=["i", "j", "gram_fx"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"])
            .aggregate(Sum("gram_fx", alias_name="gram_fx")))


def embed_gram_sql() -> str:
    return f"""
WITH x AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_FX} + 0.5)
              AS BIGINT) AS fx
  FROM embeddings)
SELECT a.dim AS i, b.dim AS j,
       CAST(sum(a.fx * b.fx) AS BIGINT) AS gram_fx
FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""


def register(q: dict, o: dict | None = None) -> None:
    q["embed_gram"] = embed_gram
    if o is not None:
        o["embed_gram"] = embed_gram_sql()
