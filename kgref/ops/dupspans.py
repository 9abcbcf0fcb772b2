"""Span-level duplicate-text detection — the substring/ngram-span half
of the dedup family (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": duplicated SPANS inside otherwise-unique
documents are the dominant duplication mode at web scale; doc-level
dedup — kgref.ops.dedup — cannot see them).

Token-gram granularity: a span is ``DUP_GRAM_N`` consecutive tokens
whose exact token sequence occurs in ≥ ``DUP_MIN_DOCS`` distinct
documents corpus-wide.  Two queries:

- ``dup_spans``: every qualifying (doc, position) occurrence with char
  offsets, the gram text, and its corpus document frequency.
- ``dup_span_coverage``: per-document roll-up — span count and the
  UNION size of covered token positions (overlapping spans merged),
  i.e. how many tokens a span-removal pass would cut.

Scale design (two streaming passes, one combiner-shrunk exchange):

1. Pass A: per-batch Arrow kernel flattens every document's tokens into
   ONE global token array (split_pattern → list_flatten), builds all
   window grams with a single n-way binary_join_element_wise, reduces
   to distinct (gram, doc) pairs and pre-counts per gram IN the batch —
   the exchange then moves one row per distinct gram per batch (the
   §2.5 combiner pattern), never per occurrence.  A Sum-groupby +
   threshold yields the heavy-gram table.
2. Pass B: re-scan the corpus with the same gram kernel and semi-join
   each batch against the broadcast heavy set (pc.index_in — one
   object-store copy via ray.put, read per actor, never re-shipped).

Driver/broadcast materialization is HEAVY-GRAM-dimension bounded (the
op's own output dimension: grams over the document-frequency
threshold), like contamination's benchmark set — not corpus bounded.
If that dimension ever outgrew worker heaps the semi-join flips to the
hash-bucketed native join (ops/relational.py machinery); the streaming
passes are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

DUP_GRAM_N = 8
DUP_MIN_DOCS = 2
_BUCKETS = 64


def _gram_arrays(batch: pa.Table, n: int):
    """All n-token window grams of a batch, fully Arrow/numpy: returns
    (doc_id, p_1b, from_1b, to_1b, gram) arrays.  One split, one
    flatten, n takes, one join — no per-document Python."""
    texts = batch.column("text").cast(pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks_list = pc.split_pattern(texts, " ")
    flat = toks_list.flatten()
    off = np.asarray(toks_list.offsets, np.int64)
    counts = np.diff(off)
    L = len(flat)
    empty = (pa.array([], pa.int64()), pa.array([], pa.int32()),
             pa.array([], pa.int32()), pa.array([], pa.int32()),
             pa.array([], pa.string()))
    if L < n:
        return empty
    tlen = np.asarray(pc.utf8_length(flat), np.int64)
    excl = np.concatenate(([0], np.cumsum(tlen)))
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    g = np.arange(L - n + 1, dtype=np.int64)
    valid = doc_of[g] == doc_of[g + n - 1]
    g = g[valid]
    if len(g) == 0:
        return empty
    start = off[doc_of[g]]
    p_1b = g - start + 1
    # each prior token in the doc contributes len+1 chars (token+space)
    from_1b = (excl[g] - excl[start]) + (g - start) + 1
    gram_len = (excl[g + n] - excl[g]) + (n - 1)
    parts = [flat.take(pa.array(g + i)) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    doc = batch.column("doc_id").take(pa.array(doc_of[g]))
    return (doc, pa.array(p_1b.astype(np.int32)),
            pa.array(from_1b.astype(np.int32)),
            pa.array((from_1b + gram_len - 1).astype(np.int32)), grams)


def _heavy_grams(sf_dir: str, n: int, min_docs: int):
    """Pass A → (grams: pa.Array, n_docs: np.ndarray), threshold-filtered."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        doc, _, _, _, grams = _gram_arrays(batch, n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        key = pc.binary_join_element_wise(
            grams, pc.cast(doc, pa.string()), "\x1f")
        enc = pc.dictionary_encode(key)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        pair_gram = pc.list_element(
            pc.split_pattern(enc.dictionary, "\x1f"), 0)
        genc = pc.dictionary_encode(pair_gram)
        if isinstance(genc, pa.ChunkedArray):
            genc = genc.combine_chunks()
        counts = pc.value_counts(genc.indices)
        return pa.table({
            "gram": genc.dictionary.take(counts.field("values")),
            "n": pc.cast(counts.field("counts"), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("gram").aggregate(Sum("n", alias_name="n_docs")))
    # heavy-gram-dimension-bounded materialization (module docstring)
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    keep = pc.greater_equal(t.column("n_docs"), min_docs)
    t = t.filter(keep)
    return (t.column("gram").combine_chunks(),
            np.asarray(t.column("n_docs"), np.int64))


class _MarkHeavy:
    """Pass-B actor: broadcast heavy-gram set read once in __init__."""

    def __init__(self, heavy_ref, n: int):
        grams, n_docs = ray.get(heavy_ref)
        self.heavy = grams
        self.n_docs = pa.array(n_docs)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc, p, from_, to, grams = _gram_arrays(batch, self.n)
        idx = pc.index_in(grams, value_set=self.heavy)
        sel = pc.is_valid(idx)
        nd = self.n_docs.take(pc.cast(idx.filter(sel), pa.int64()))
        return pa.table({
            "doc_id": pc.cast(doc.filter(sel), pa.int64()),
            "p": p.filter(sel),
            "from_1b": from_.filter(sel),
            "to_1b": to.filter(sel),
            "gram": grams.filter(sel),
            "n_docs": nd,
        })


def dup_spans(sf_dir: str, n: int = DUP_GRAM_N,
              min_docs: int = DUP_MIN_DOCS) -> rd.Dataset:
    grams, n_docs = _heavy_grams(sf_dir, n, min_docs)
    heavy_ref = ray.put((grams, n_docs))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(_MarkHeavy, fn_constructor_args=(heavy_ref, n),
                          batch_format="pyarrow", concurrency=2)


def dup_span_coverage(sf_dir: str, n: int = DUP_GRAM_N,
                      min_docs: int = DUP_MIN_DOCS) -> rd.Dataset:
    """Per-doc span count + merged coverage: sorted span starts within a
    doc contribute min(n, gap-to-previous) covered tokens each — the
    interval-union size without materializing positions."""
    import pandas as pd

    spans = dup_spans(sf_dir, n, min_docs).select_columns(["doc_id", "p"])

    def bucketize(b: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(b.column("doc_id"), _BUCKETS - 1), pa.int32())
        return b.append_column("bucket", bucket)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "p"], kind="mergesort")
        p = df["p"].to_numpy(np.int64)
        doc = df["doc_id"].to_numpy(np.int64)
        first = np.ones(len(df), bool)
        first[1:] = doc[1:] != doc[:-1]
        gap = np.empty(len(df), np.int64)
        gap[0] = n
        gap[1:] = p[1:] - p[:-1]
        contrib = np.where(first, n, np.minimum(n, gap))
        out = pd.DataFrame({"doc_id": doc, "contrib": contrib})
        res = out.groupby("doc_id", sort=False).agg(
            n_spans=("contrib", "size"),
            dup_tokens=("contrib", "sum")).reset_index()
        return res

    return (spans.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda df: per_bucket(df.drop(columns=["bucket"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# DuckDB twins — same spec, independent derivation (string grouping, no
# hashing anywhere on either side, so parity is exact).


def _gram_ctes(n: int, min_docs: int) -> str:
    return f"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - {n} + 1)) AS p
        FROM t WHERE len(w) >= {n}),
g AS (SELECT doc_id, CAST(p AS INTEGER) AS p,
             array_to_string(list_slice(w, p, p + {n} - 1), ' ') AS gram,
             CAST(CASE WHEN p = 1 THEN 1
                  ELSE length(array_to_string(list_slice(w, 1, p - 1), ' ')) + 2
                  END AS INTEGER) AS from_1b
      FROM tok),
hv AS (SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram
       HAVING COUNT(DISTINCT doc_id) >= {min_docs})"""


def dup_spans_sql(n: int = DUP_GRAM_N, min_docs: int = DUP_MIN_DOCS) -> str:
    return f"""
WITH {_gram_ctes(n, min_docs)}
SELECT g.doc_id, g.p, g.from_1b,
       CAST(g.from_1b + length(g.gram) - 1 AS INTEGER) AS to_1b,
       g.gram, hv.n_docs
FROM g JOIN hv USING (gram)
"""


def dup_span_coverage_sql(n: int = DUP_GRAM_N,
                          min_docs: int = DUP_MIN_DOCS) -> str:
    return f"""
WITH {_gram_ctes(n, min_docs)},
spans AS (SELECT g.doc_id, g.p FROM g JOIN hv USING (gram)),
cov AS (SELECT DISTINCT s.doc_id, s.p + u.generate_series AS q
        FROM spans s, generate_series(0, {n} - 1) u)
SELECT a.doc_id, a.n_spans, b.dup_tokens
FROM (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id) a
JOIN (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id) b
USING (doc_id)
"""


def register(q: dict, o: dict | None = None) -> None:
    q["dup_spans"] = dup_spans
    q["dup_span_coverage"] = dup_span_coverage
    if o is not None:
        o["dup_spans"] = dup_spans_sql()
        o["dup_span_coverage"] = dup_span_coverage_sql()
