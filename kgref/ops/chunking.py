"""Document chunking — fixed-size token windows with overlap, the
standard pre-tokenization step for long-document training and for
RAG-style retrieval indexing.

Vectorization shape: a per-CHUNK-INDEX loop (data-independent, ≤
ceil(max_tokens/stride) iterations per batch) where each iteration is
all Arrow C kernels over the whole batch — ``list_slice`` +
``binary_join`` + a filter mask — never a per-document Python loop.
One map, no shuffle, no state; at 100 TB this is embarrassingly
parallel and the fan-out (~n_tokens/stride rows per doc) streams
through the object store block by block.

Window/stride semantics: chunk k covers tokens [k·stride, k·stride +
window); chunks are emitted while k·stride < n_tokens, so the last
chunk may be short (but never empty) and consecutive chunks overlap by
window − stride tokens.  Identical arithmetic on the SQL side via
``generate_series(0, len-1, stride)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

WINDOW = 64
STRIDE = 48


def chunk_batch(doc_ids: pa.Array, texts, window: int = WINDOW,
                stride: int = STRIDE) -> pa.Table:
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks)
    max_n = pc.max(n).as_py() if len(toks) else None
    ids_out, idx_out, txt_out, ntk_out = [], [], [], []
    k = 0
    while max_n is not None and (k == 0 or k * stride < max_n):
        mask = pc.greater(n, k * stride)
        sub_ids = doc_ids.filter(mask)
        if len(sub_ids) == 0:
            break
        sl = pc.list_slice(toks.filter(mask), start=k * stride,
                           stop=k * stride + window)
        ids_out.append(sub_ids)
        idx_out.append(pa.array([k] * len(sub_ids), pa.int32()))
        txt_out.append(pc.binary_join(sl, " "))
        ntk_out.append(pc.list_value_length(sl))
        k += 1
    if not ids_out:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int32()),
             pa.array([], pa.string()), pa.array([], pa.int32())],
            names=["doc_id", "chunk_idx", "chunk_text", "n_tokens"])
    concat = lambda parts: pa.concat_arrays(  # noqa: E731
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts])
    return pa.Table.from_arrays(
        [concat(ids_out), concat(idx_out), concat(txt_out),
         concat(ntk_out)],
        names=["doc_id", "chunk_idx", "chunk_text", "n_tokens"])


def chunk_docs(sf_dir: str, window: int = WINDOW, stride: int = STRIDE):
    """Gate query: overlapping token windows over documents."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_batch(b.column("doc_id").combine_chunks(),
                              b.column("text"), window, stride),
        batch_format="pyarrow")


def chunk_docs_sql(window: int = WINDOW, stride: int = STRIDE) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w,
             unnest(generate_series(0, len(w) - 1, {stride})) AS p
      FROM t)
SELECT doc_id,
       CAST(p / {stride} AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(w, p + 1, p + {window}), ' ')
         AS chunk_text,
       CAST(least({window}, len(w) - p) AS INTEGER) AS n_tokens
FROM s
"""


def register(q: dict, o: dict | None = None) -> None:
    q["chunk_docs"] = chunk_docs
    if o is not None:
        o["chunk_docs"] = chunk_docs_sql()
