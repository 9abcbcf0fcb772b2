"""Inverted-index construction: token → sorted posting list of doc ids.

The index-build shape every retrieval / contamination / dedup system
needs at corpus scale.  Two stages, both vectorized:

1. ``map_batches``: tokenize (single-space split — the shared corpus
   convention, cf. ops/vocab.py) and reduce each batch to DISTINCT
   (token, doc_id) pairs with one np.unique over a packed
   (token_code, doc) key — the exchange then carries one row per
   distinct pair per batch, never one per occurrence.
2. Hash-bucket tokens (M61 fold % num_buckets) and ``groupby(bucket)``
   — a COARSE partition, the repo-wide pattern for avoiding per-key
   map_groups — then ONE lexsort + run-boundary pass per bucket builds
   every posting list in that bucket at once.  With ``out_dir`` each
   bucket group writes its ``postings-<bucket>.parquet`` shard
   worker-side (token, df, postings list<int64>) — the resumable
   artifact layout; nothing index-sized ever lands on the driver.

The gate query returns the integer PROJECTION of each posting list
(df, sum/min/max of doc ids) — exact, order-insensitive, and a plain
DISTINCT-pairs GROUP BY in DuckDB — so the index content is value-gated
while the artifact keeps its nested layout (the media_features /
annotations_nested convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

INDEX_BUCKETS = 32


def _distinct_pairs(batch: pa.Table) -> pa.Table:
    """One row per DISTINCT (token, doc_id) in the batch."""
    texts = batch.column("text")
    toks = pc.split_pattern(texts, " ").combine_chunks()
    doc = batch.column("doc_id").to_numpy()
    reps = np.diff(toks.offsets.to_numpy().astype(np.int64))
    docs = np.repeat(doc, reps)
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    code = enc.indices.to_numpy().astype(np.int64)
    # pack (token_code, doc) into one int64 key for a single np.unique;
    # doc ids are non-negative and < 2^32 by the corpus contract
    key = code * np.int64(1 << 32) + docs
    uniq = np.unique(key)
    return pa.Table.from_arrays(
        [enc.dictionary.take(pa.array(uniq >> 32)),
         pa.array(uniq & np.int64((1 << 32) - 1))],
        names=["token", "doc_id"])


def _bucketize(batch: pa.Table, num_buckets: int) -> pa.Table:
    from .m61 import fold_m61_many

    enc = batch.column("token").combine_chunks().dictionary_encode()
    lut = pa.array((fold_m61_many(enc.dictionary.to_pylist())
                    % np.uint64(num_buckets)).astype(np.int32))
    return batch.append_column("bucket", lut.take(enc.indices))


def _build_bucket(df, out_dir: str | None):
    """One token bucket → (token, df, doc_sum, doc_min, doc_max) rows;
    with ``out_dir``, also the posting-list parquet shard.  One lexsort
    + run boundaries — no per-token grouping."""
    import pandas as pd

    tok = df["token"].to_numpy()
    doc = df["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((doc, tok))
    tok, doc = tok[order], doc[order]
    starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
    ends = np.r_[starts[1:], len(tok)]
    dfreq = (ends - starts).astype(np.int64)
    csum = np.r_[0, np.cumsum(doc)]
    dsum = csum[ends] - csum[starts]
    tokens = tok[starts]
    if out_dir is not None and len(tokens):
        import os

        import pyarrow.parquet as pq

        shard = pa.Table.from_arrays(
            [pa.array(tokens), pa.array(dfreq),
             pa.ListArray.from_arrays(
                 pa.array(np.r_[starts, len(tok)], pa.int32()),
                 pa.array(doc))],
            names=["token", "df", "postings"])
        bid = int(df["bucket"].iloc[0])
        tmp = os.path.join(out_dir, f".postings-{bid:04d}.tmp")
        pq.write_table(shard, tmp)
        os.rename(tmp,
                  os.path.join(out_dir, f"postings-{bid:04d}.parquet"))
    return pd.DataFrame({
        "token": tokens,
        "df": dfreq,
        "doc_sum": dsum,
        "doc_min": doc[starts],
        "doc_max": doc[ends - 1]})


def inverted_index(sf_dir: str, num_buckets: int = INDEX_BUCKETS,
                   out_dir: str | None = None):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    if out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)
    return (ds.map_batches(_distinct_pairs, batch_format="pyarrow")
            .map_batches(lambda b: _bucketize(b, num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _build_bucket(g, out_dir),
                        batch_format="pandas"))


def inverted_index_sql() -> str:
    return """
WITH p AS (
  SELECT DISTINCT w AS token, doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents))
SELECT token, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(doc_id) AS BIGINT) AS doc_sum,
       CAST(min(doc_id) AS BIGINT) AS doc_min,
       CAST(max(doc_id) AS BIGINT) AS doc_max
FROM p GROUP BY token
"""


def register(q: dict, o: dict | None = None) -> None:
    q["inverted_index"] = inverted_index
    if o is not None:
        o["inverted_index"] = inverted_index_sql()
