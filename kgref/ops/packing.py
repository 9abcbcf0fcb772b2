"""Sequence packing — assign every document a global token offset and a
fixed-token-budget chunk id, the manifest a training dataloader needs to
pack documents into constant-length batches deterministically.

This is the one beyond-the-reference op whose semantics are inherently
GLOBAL-ORDER (a running token count over the doc_id order), which Ray
Data cannot express as a single groupby — so it is built as the classic
**distributed prefix sum**:

1. one streaming pass computes per-document token counts and reduces
   them to per-RANGE partial sums (range = ``doc_id // W``, an ordered,
   disjoint cover of the id space; ~``n_parts`` ranges),
2. the tiny range-sum table (n_parts rows, KB even at 2^19 parts) comes
   to the driver, where an exclusive scan turns it into per-range start
   offsets,
3. a second pass — ``groupby(range).map_groups`` — computes the
   within-range exclusive cumsum and adds the broadcast range offset;
   ``chunk_id = token_start // budget``.

The intermediate (doc_id, n_tokens, part) dataset is ints-only
(~20 B/doc — at 10^10 docs that is ~200 GB, object-store-spillable) and
is ``materialize()``d deliberately so pass 2 does not re-read and
re-tokenize the 100-TB text corpus; this is the documented exception to
the no-mid-pipeline-materialize rule: the materialized set is the
REDUCED manifest, 3–4 orders of magnitude smaller than the input.

No reference counterpart (the reference is request-scoped; SURVEY §2.9)
— registered as a first-class training-data op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_BUDGET = 512  # tokens per packed chunk


def _max_doc_id(path: str) -> int:
    """Max doc_id from parquet footer column statistics — no data read."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (sorted(glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    mx = -1
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is not None and st.has_min_max:
                mx = max(mx, int(st.max))
    if mx < 0:
        raise ValueError(f"no doc_id statistics in {path}")
    return mx


def pack_sequences(sf_dir: str, budget: int = TOKEN_BUDGET,
                   n_parts: int | None = None):
    """(doc_id, n_tokens, token_start, chunk_id) packing manifest under
    whitespace tokenization, doc_id order, exclusive running offset."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .pairs import n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts or n_parts_for(path)
    width = -(-(_max_doc_id(path) + 1) // np_parts)  # ceil: ranges cover ids

    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def tok_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        ids = batch.column("doc_id").to_numpy()
        part = pa.array((ids // width).astype(np.int32))
        return pa.Table.from_arrays([batch.column("doc_id"), n, part],
                                    names=["doc_id", "n_tokens", "part"])

    counts = ds.map_batches(tok_counts, batch_format="pyarrow").materialize()

    # tiny range-sum table → driver → exclusive scan over ordered ranges
    partials = counts.groupby("part").aggregate(
        Sum("n_tokens", alias_name="s"))
    sums = np.zeros(np_parts, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        sums[b.column("part").to_numpy()] = b.column("s").to_numpy()
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    def within_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable")
        n = df["n_tokens"].to_numpy()
        start = offsets[int(df["part"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": n.astype(np.int32),
            "token_start": start,
            "chunk_id": start // budget,
        })

    return counts.groupby("part").map_groups(within_range,
                                             batch_format="pandas")


def pack_sequences_sql(budget: int = TOKEN_BUDGET) -> str:
    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
c AS (SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
               AS token_start
      FROM t)
SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
       CAST(token_start AS BIGINT) AS token_start,
       CAST(token_start // {budget} AS BIGINT) AS chunk_id
FROM c
"""


def register(q: dict, o: dict | None = None) -> None:
    q["pack_sequences"] = pack_sequences
    if o is not None:
        o["pack_sequences"] = pack_sequences_sql()
