"""Embedding int8 quantization — the storage/bandwidth-reduction stage
of an embedding pipeline (symmetric per-vector absmax scaling, the
standard int8 scheme).  One ``map_batches`` pass, no shuffle; at 100 TB
this is a pure streaming map whose output is ~4× smaller than its
input.

The gate query emits per-vector audit stats rather than the int8
payload itself (scale, exact integer sum of the quantized codes, max
reconstruction error) so the DuckDB oracle can replicate every number:
all float work is IEEE double with the same operation order on both
sides (cast-to-double → x/scale*127 → floor(+0.5) → q*scale/127), and
the comparisons ship as half-up fixed-point ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embed_quantize(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding").combine_chunks()
        n = len(batch)
        dims = np.diff(emb.offsets.to_numpy())
        # fixed-width corpus → one (n, d) view, float32 → exact double
        d = int(dims[0]) if n else 0
        assert n == 0 or (dims == d).all()
        m = emb.flatten().to_numpy().astype(np.float64).reshape(n, d)
        scale = np.abs(m).max(axis=1)
        # all-zero vector → scale 0: divide by 1 instead so q = 0 and
        # the int casts stay defined (mirrored in the SQL twin's CASE;
        # ADVICE r3 — x/0 NaN/inf would cast to garbage)
        safe = np.where(scale == 0, 1.0, scale)
        q = np.floor(m / safe[:, None] * 127 + 0.5)
        err = np.abs(m - q * scale[:, None] / 127).max(axis=1)
        return pa.Table.from_arrays(
            [batch.column("vec_id"),
             pa.array(np.full(n, d, dtype=np.int64)),
             pa.array(np.floor(scale * 10_000 + 0.5).astype(np.int64)),
             pa.array(q.sum(axis=1).astype(np.int64)),
             pa.array(np.floor(err * 1_000_000 + 0.5).astype(np.int64))],
            names=["vec_id", "n_dims", "scale4", "sum_q", "max_err6"])

    return ds.map_batches(quant, batch_format="pyarrow")


def embed_quantize_sql() -> str:
    return """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> floor(
             x / (CASE WHEN scale = 0 THEN 1 ELSE scale END)
             * 127 + 0.5)) AS qv
  FROM s)
SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
       CAST(floor(scale * 10000 + 0.5) AS BIGINT) AS scale4,
       CAST(list_sum(qv) AS BIGINT) AS sum_q,
       CAST(floor(list_max(list_transform(range(1, len(v) + 1),
              i -> abs(v[i] - qv[i] * scale / 127))) * 1000000 + 0.5)
            AS BIGINT) AS max_err6
FROM q
"""


def register(q: dict, o: dict | None = None) -> None:
    q["embed_quantize"] = embed_quantize
    if o is not None:
        o["embed_quantize"] = embed_quantize_sql()
