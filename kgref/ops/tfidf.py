"""TF-IDF top-terms per document — the classic two-pass broadcast-stats
shape: a corpus-wide document-frequency table is built with the combiner
pattern (per-batch partial DF counts, one vocabulary-sized groupby),
broadcast to the scoring pass, and each document's terms are scored and
ranked with one vectorized numpy pass per batch.

Scale: the DF table is vocabulary-sized (10^6–10^8 rows at web scale —
broadcastable; cap at a top-M vocabulary if not), so the 100-TB corpus
is never joined against itself.  Scores are fixed-point
(``floor(tf·idf·10^6 + 0.5)``) so ranking — and the driver's value-hash
gate — cannot flip on accumulation-order float noise; idf is the
smoothed sklearn convention ``ln((1+N)/(1+df)) + 1``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOP_K = 3
_FX = 1_000_000


def _doc_count(path: str) -> int:
    import glob
    import os

    import pyarrow.parquet as pq

    files = (sorted(glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    return sum(pq.read_metadata(f).num_rows for f in files)


def _doc_term_runs(batch: pa.Table):
    """(parents, codes, tf, dictionary) for one batch: lexsorted
    first-in-run aggregation of per-(doc, token) counts — the same
    vectorized trick as textstats.n_distinct."""
    toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    parents = np.repeat(np.arange(len(batch)),
                        pc.list_value_length(toks).to_numpy())
    order = np.lexsort((codes, parents))
    ps, cs = parents[order], codes[order]
    first = np.ones(len(ps), dtype=bool)
    first[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.append(starts, len(ps)))
    return ps[starts], cs[starts], tf, enc.dictionary


def tfidf_top_terms(sf_dir: str, top_k: int = TOP_K):
    """(doc_id, rank, term, tfidf): each document's top_k terms by
    fixed-point tf·idf, ties broken by term ascending."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    n_docs = _doc_count(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    # pass 1 (combiner): per-batch partial DF → vocabulary-sized groupby
    def partial_df(batch: pa.Table) -> pa.Table:
        ps, cs, _tf, vocab = _doc_term_runs(batch)
        counts = np.bincount(cs, minlength=len(vocab))
        nz = np.flatnonzero(counts)
        return pa.Table.from_arrays(
            [vocab.take(pa.array(nz)),
             pa.array(counts[nz].astype(np.int64))],
            names=["term", "df"])

    df_rows = (ds.map_batches(partial_df, batch_format="pyarrow")
               .groupby("term").aggregate(Sum("df", alias_name="df_total")))
    df_map: dict[str, int] = {}
    for b in df_rows.iter_batches(batch_format="pyarrow"):
        for t, d in zip(b.column("term").to_pylist(),
                        b.column("df_total").to_pylist()):
            df_map[t] = int(d)
    df_ref = ray.put(df_map)

    # pass 2: score + per-doc top-k, vectorized per batch
    def score(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        ps, cs, tf, vocab = _doc_term_runs(batch)
        terms = vocab.to_pylist()
        idf = np.array([np.log((1.0 + n_docs) / (1.0 + dfm[t])) + 1.0
                        for t in terms])
        score_fx = np.floor(tf * idf[cs] * _FX + 0.5).astype(np.int64)
        # tie-break by term ascending: code → lexicographic rank
        lexrank = np.empty(len(terms), dtype=np.int64)
        lexrank[np.argsort(np.array(terms, dtype=object))] = np.arange(
            len(terms))
        order = np.lexsort((lexrank[cs], -score_fx, ps))
        ps, cs, score_fx = ps[order], cs[order], score_fx[order]
        first = np.ones(len(ps), dtype=bool)
        first[1:] = ps[1:] != ps[:-1]
        rank = np.arange(len(ps)) - np.flatnonzero(first)[
            np.cumsum(first) - 1] + 1
        keep = rank <= top_k
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.Table.from_arrays(
            [pa.array(doc_ids[ps[keep]]),
             pa.array(rank[keep].astype(np.int32)),
             vocab.take(pa.array(cs[keep])),
             pa.array(score_fx[keep] / _FX)],
            names=["doc_id", "rank", "term", "tfidf"])

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms_sql(top_k: int = TOP_K) -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             CAST(floor(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0)
                        * {_FX} + 0.5) AS BIGINT) AS score_fx
      FROM tf JOIN df USING (term), n),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score_fx DESC, term) AS rank
      FROM s)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term,
       score_fx / {_FX}.0 AS tfidf
FROM r WHERE rank <= {top_k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["tfidf_top_terms"] = tfidf_top_terms
    if o is not None:
        o["tfidf_top_terms"] = tfidf_top_terms_sql()
