"""BIO sequence-labeling export — the bridge from the annotator to NER
training data: every document rendered as (token_idx, token, tag) rows
with ``B-<ontology>`` / ``I-<ontology>`` tags derived from the direct
annotation spans (longest_only matching, the canonical NER-prep
configuration) and ``O`` elsewhere.  This is the dataset shape a
sequence-labeling trainer consumes, emitted straight from the flagship
triples.

Shape: spans (pred = annotated_with, char offsets parsed at emit time)
and document text co-locate on ONE doc-bucket exchange; the per-bucket
kernel is a single numpy pass — global token-boundary coordinates per
bucket (doc ordinal ⋅ 2³² + char offset), span→token mapping via one
searchsorted, per-token winner selection via one lexsort (longest span
first, then from, then class URI — the deterministic rule the DuckDB
twin reproduces with a row_number window).  Output is corpus×token
rows: exactly the training-set volume, written not collected.

Tag-wellformedness note: per-token winner selection can in principle
orphan an ``I-`` tag when two same-length spans stagger-overlap; with
longest_only matching the fixtures never produce this (pinned by
test_bio_tags_wellformed), and the rule stays exact/deterministic —
which the oracle gate needs — rather than greedy-stateful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BUCKETS = 32
_SHIFT = np.int64(1) << 32


def bio_tags(sf_dir: str):
    """Gate query: (doc_id, token_idx, token, tag) for every token of
    every document; token_idx is 1-based."""
    import ray
    import ray.data as rd

    from .. import docdict
    from ..queries import _annotate_ds
    from ..schemas import AnnotateOptions

    tpc = docdict.TURNS_PER_CONV
    uri_to_ont = {docdict._uri(n): o
                  for n, o, *_rest in docdict.CLASS_DEFS}
    ont_ref = ray.put(uri_to_ont)

    tri = _annotate_ds(sf_dir, AnnotateOptions(longest_only=True))

    def span_rows(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("pred"), pa.scalar("annotated_with"))
        k = t.filter(m)
        conv = pc.utf8_slice_codeunits(
            k.column("conv_id").cast(pa.string()), 5, 2**31 - 1)
        doc_id = pc.add(
            pc.multiply(pc.cast(conv, pa.int64()),
                        pa.scalar(tpc, pa.int64())),
            k.column("turn_idx").cast(pa.int64()))
        onts = ray.get(ont_ref)
        objs = k.column("obj").cast(pa.string()).to_pylist()
        return pa.Table.from_arrays(
            [doc_id,
             pa.array(np.asarray(doc_id) % _BUCKETS, pa.int64()),
             k.column("from_1b").cast(pa.int64()),
             k.column("to_1b").cast(pa.int64()),
             pa.array(objs, pa.string()),
             pa.array([onts[u] for u in objs], pa.string()),
             pa.nulls(len(k), pa.string())],
            names=["doc_id", "bucket", "from_1b", "to_1b", "obj", "ont",
                   "text"])

    def doc_rows(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").cast(pa.int64())
        n = len(t)
        return pa.Table.from_arrays(
            [doc_id,
             pa.array(np.asarray(doc_id) % _BUCKETS, pa.int64()),
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.int64()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.string()),
             t.column("text").cast(pa.string())],
            names=["doc_id", "bucket", "from_1b", "to_1b", "obj", "ont",
                   "text"])

    spans = tri.map_batches(span_rows, batch_format="pyarrow")
    docs = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(doc_rows, batch_format="pyarrow"))

    def tag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dd = (df[df["text"].notna()]
              .sort_values("doc_id").reset_index(drop=True))
        sp = df[df["text"].isna()]
        # one global coordinate system for the whole bucket:
        # doc ORDINAL (dense, sorted) * 2^32 + 1-based char offset;
        # tokenization + lengths are single Arrow kernels, no per-row
        # Python
        tok_list = pc.split_pattern(
            pa.array(dd["text"], pa.string()), " ")
        ntok = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        flat_arr = tok_list.flatten()
        flat = flat_arr.to_numpy(zero_copy_only=False)
        tok_doc = np.repeat(np.arange(len(dd), dtype=np.int64), ntok)
        tok_len = pc.utf8_length(flat_arr).to_numpy().astype(np.int64)
        # token start char (1-based) within its doc: a GLOBAL running
        # boundary over the concatenated stream, re-based at each doc's
        # first token (tokens are space-joined, so boundary = len + 1)
        first_idx = np.zeros(len(dd), np.int64)
        if len(ntok):
            first_idx[1:] = np.cumsum(ntok)[:-1]
        if len(flat):
            bound = np.cumsum(tok_len + 1)
            prev_bound = np.concatenate([[0], bound[:-1]])
            doc_base = np.repeat(prev_bound[first_idx], ntok)
            starts = prev_bound - doc_base + 1
        else:
            starts = np.array([], np.int64)
        g_start = tok_doc * _SHIFT + starts
        tags = np.full(len(flat), "O", dtype=object)

        if len(sp) and len(flat):
            ord_of = pd.Series(np.arange(len(dd), dtype=np.int64),
                               index=dd["doc_id"].to_numpy())
            s_doc = ord_of.loc[sp["doc_id"].to_numpy()].to_numpy()
            s_from = sp["from_1b"].to_numpy(np.int64)
            s_to = sp["to_1b"].to_numpy(np.int64)
            # whole-word spans start exactly on a token boundary
            t0 = np.searchsorted(g_start, s_doc * _SHIFT + s_from)
            t1 = np.searchsorted(g_start, s_doc * _SHIFT + s_to,
                                 side="right") - 1
            length = s_to - s_from
            obj_rank = pd.factorize(sp["obj"], sort=True)[0]
            onts = sp["ont"].to_numpy(dtype=object)
            # expand spans to covered tokens, pick the winner per token
            reps = (t1 - t0 + 1).astype(np.int64)
            cov_tok = np.repeat(t0, reps) + _ranges(reps)
            cov_span = np.repeat(np.arange(len(sp)), reps)
            order = np.lexsort((obj_rank[cov_span],
                                s_from[cov_span],
                                -length[cov_span],
                                cov_tok))
            ct, cs = cov_tok[order], cov_span[order]
            first = np.ones(len(ct), dtype=bool)
            first[1:] = ct[1:] != ct[:-1]
            wt, ws = ct[first], cs[first]
            is_b = g_start[wt] == s_doc[ws] * _SHIFT + s_from[ws]
            tags[wt] = np.where(is_b, "B-", "I-").astype(object) \
                + onts[ws]

        tok_idx = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(first_idx, ntok) + 1)
        return pd.DataFrame({
            "doc_id": dd["doc_id"].to_numpy()[tok_doc],
            "token_idx": tok_idx.astype(np.int32),
            "token": flat,
            "tag": tags,
        })

    return (spans.union(docs)
            .groupby("bucket")
            .map_groups(lambda df: tag_bucket(df.drop(columns=["bucket"])),
                        batch_format="pandas"))


def _ranges(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]), [0..reps[1]), … concatenated (vectorized).
    Every rep is ≥ 1 here (a span covers at least one token)."""
    if len(reps) == 0:
        return np.array([], np.int64)
    out = np.ones(int(reps.sum()), np.int64)
    out[0] = 0
    ends = np.cumsum(reps)[:-1]
    out[ends] = 1 - reps[:-1]
    return np.cumsum(out)


def bio_tags_sql() -> str:
    from .. import docdict
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions(longest_only=True))
    tpc = docdict.TURNS_PER_CONV
    return f"""
WITH tri AS ({tri}),
spans AS (SELECT DISTINCT
            CAST(substr(conv_id, 6) AS BIGINT) * {tpc} + turn_idx AS doc_id,
            from_1b, to_1b, obj
          FROM tri WHERE pred = 'annotated_with'),
{docdict.sql_classes_cte()},
sp AS (SELECT s.*, c.ontology AS ont FROM spans s
       JOIN cls c ON c.class_uri = s.obj),
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, p, w[p] AS token,
          CAST(CASE WHEN p = 1 THEN 1
               ELSE length(array_to_string(list_slice(w, 1, p - 1), ' ')) + 2
               END AS BIGINT) AS from_tok,
          CAST(CASE WHEN p = 1 THEN 1
               ELSE length(array_to_string(list_slice(w, 1, p - 1), ' ')) + 2
               END + length(w[p]) - 1 AS BIGINT) AS to_tok
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p
              FROM t)),
best AS (SELECT tok.doc_id, tok.p, sp.from_1b, sp.ont,
           row_number() OVER (PARTITION BY tok.doc_id, tok.p
             ORDER BY (sp.to_1b - sp.from_1b) DESC, sp.from_1b, sp.obj)
             AS rn,
           tok.from_tok
         FROM tok JOIN sp ON sp.doc_id = tok.doc_id
           AND sp.from_1b <= tok.from_tok AND sp.to_1b >= tok.to_tok)
SELECT tok.doc_id, CAST(tok.p AS INTEGER) AS token_idx, tok.token,
       coalesce(CASE WHEN b.from_1b = b.from_tok THEN 'B-' || b.ont
                     ELSE 'I-' || b.ont END, 'O') AS tag
FROM tok LEFT JOIN best b
  ON b.doc_id = tok.doc_id AND b.p = tok.p AND b.rn = 1
"""


def register(q: dict, o: dict | None = None) -> None:
    q["bio_tags"] = bio_tags
    if o is not None:
        o["bio_tags"] = bio_tags_sql()
