"""BM25 top-k retrieval over the document corpus — the hard-negative
mining / decontamination-adjacent ranking op every retrieval-augmented
training pipeline runs: score every document against a query term set
and keep the global top-k.

Shape: two passes sharing one corpus read each.
  Pass 1 (combiner): per-batch partial document frequencies PLUS a
  sentinel total-token row fold into ONE vocabulary-sized groupby —
  exactly the tfidf_top_terms DF pass.  The query is data-derived and
  deterministic: the Q mid-frequency terms (df·2 ≤ N) ranked by
  (df desc, term asc) — a vocabulary-sized sort, never corpus-sized.
  Pass 2: per-batch vectorized scoring (the tfidf run-length kernel)
  against the BROADCAST query table, then a per-batch partial top-k so
  the final sort/limit sees ≤ k rows per batch, not the corpus.

Exactness: BM25 with k1 = 6/5 and b = 3/4 is rational once idf is
fixed-pointed, so each (doc, term) score is ONE exact integer floor
division — ``(idf_fx·tf·22·avgdl_fx) // (10·avgdl_fx·tf + 3·avgdl_fx
+ 9000·len)`` with ``avgdl_fx = floor(1000·L/N + 0.5)`` — and the
per-doc sum over query terms is an int64 sum (order-independent).
idf_fx uses the same double-precision ``ln`` floor convention as
ops/tfidf.py (bit-identical between numpy and DuckDB's libm).  Rows
whose numerator would overflow int64 (idf_fx·tf·22·avgdl_fx ≥ 2⁶³ —
needs pathological tf·avgdl products) fall back to exact Python ints,
the ops/kgraph.class_lift pattern; the HUGEINT SQL twin needs no
guard.

At 100 TB: the DF table is vocabulary-sized (broadcastable), the query
table is Q rows, the exchange after scoring is ≤ k rows per batch, and
no stage joins the corpus against itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tfidf import _doc_count, _doc_term_runs

TOP_K = 20
N_QUERY_TERMS = 8
_FX = 1_000_000
_I64 = 2**63 - 1
_TOTAL = "\x00TOTAL_TOKENS"


def _query_table(sf_dir: str):
    """(terms, idf_fx, avgdl_fx): the deterministic mid-frequency query
    set with fixed-point idf, plus the corpus average doc length."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    n_docs = _doc_count(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def partial_df(batch: pa.Table) -> pa.Table:
        ps, cs, tf, vocab = _doc_term_runs(batch)
        counts = np.bincount(cs, minlength=len(vocab))
        nz = np.flatnonzero(counts)
        terms = vocab.take(pa.array(nz)).cast(pa.string())
        dfs = counts[nz].astype(np.int64)
        return pa.Table.from_arrays(
            [pa.concat_arrays([terms, pa.array([_TOTAL], pa.string())]),
             pa.array(np.append(dfs, int(tf.sum())))],
            names=["term", "df"])

    df_rows = (ds.map_batches(partial_df, batch_format="pyarrow")
               .groupby("term").aggregate(Sum("df", alias_name="df")))

    def mid_freq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(
            pc.less_equal(pc.multiply(t.column("df"), pa.scalar(2, pa.int64())),
                          pa.scalar(n_docs, pa.int64())),
            pc.not_equal(t.column("term"), pa.scalar(_TOTAL)))
        return t.filter(keep)

    import pyarrow.compute as pc
    total_len = int(df_rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("term"), pa.scalar(_TOTAL))),
        batch_format="pyarrow").take_all()[0]["df"])
    cand = (df_rows.map_batches(mid_freq, batch_format="pyarrow")
            .sort(["df", "term"], descending=[True, False])
            .limit(N_QUERY_TERMS).take_all())
    terms = [r["term"] for r in cand]
    dfs = np.array([r["df"] for r in cand], dtype=np.float64)
    idf_fx = np.floor(
        _FX * np.log(1.0 + (n_docs - dfs + 0.5) / (dfs + 0.5)) + 0.5
    ).astype(np.int64)
    avgdl_fx = int(np.floor(1000.0 * total_len / n_docs + 0.5))
    return terms, idf_fx, avgdl_fx


def bm25_topk(sf_dir: str, top_k: int = TOP_K):
    """Gate query: (doc_id, score_fx) — the global top_k documents by
    exact fixed-point BM25 against the derived query set, ties broken
    by doc_id ascending.  score_fx carries 1e6 idf units."""
    import ray
    import ray.data as rd

    terms, idf_fx, avgdl_fx = _query_table(sf_dir)
    qref = ray.put((terms, idf_fx, avgdl_fx))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        qterms, qidf, avgdl = ray.get(qref)
        ps, cs, tf, vocab = _doc_term_runs(batch)
        # doc lengths: total token count per doc from the runs
        n = len(batch)
        lens = np.zeros(n, dtype=np.int64)
        np.add.at(lens, ps, tf)
        # map batch vocab codes → query index (or -1): one searchsorted
        # against the sorted Q-term array, no per-term Python probe
        vnp = vocab.to_numpy(zero_copy_only=False).astype(np.str_)
        qarr = np.asarray(qterms, dtype=np.str_)
        if len(qarr):
            qorder = np.argsort(qarr, kind="stable")
            pos = np.searchsorted(qarr[qorder], vnp)
            pos = np.clip(pos, 0, len(qarr) - 1)
            hit_q = qarr[qorder][pos] == vnp
            code_to_q = np.where(hit_q, qorder[pos], -1).astype(np.int64)
        else:  # degenerate corpus: no qualifying query terms
            code_to_q = np.full(len(vnp), -1, np.int64)
        qi = code_to_q[cs]
        hit = qi >= 0
        ph, tfh, qih = ps[hit], tf[hit].astype(np.int64), qi[hit]
        idf = qidf[qih]
        num = idf * tfh * (22 * avgdl)
        den = 10 * avgdl * tfh + 3 * avgdl + 9000 * lens[ph]
        ok = (idf <= _I64 // (22 * avgdl)) if tfh.size else np.array([], bool)
        ok = ok & (tfh <= np.where(idf > 0, _I64 // np.maximum(
            idf * (22 * avgdl), 1), _I64))
        sfx = np.where(ok, num // np.maximum(den, 1), 0)
        for i in np.flatnonzero(~ok):  # exact Python-int fallback
            sfx[i] = (int(idf[i]) * int(tfh[i]) * 22 * avgdl) // int(den[i])
        scores = np.zeros(n, dtype=np.int64)
        np.add.at(scores, ph, sfx)
        # partial top-k: ≤ top_k rows leave this batch
        nz = np.flatnonzero(scores > 0)
        doc_ids = batch.column("doc_id").to_numpy()[nz]
        sc = scores[nz]
        order = np.lexsort((doc_ids, -sc))[:top_k]
        return pa.Table.from_arrays(
            [pa.array(doc_ids[order]), pa.array(sc[order])],
            names=["doc_id", "score_fx"])

    # the k-th boundary is deterministic (ties broken by doc_id in the
    # sort), so the returned SET is exact; the driver hash is
    # order-insensitive, so no rank stamp is needed
    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["score_fx", "doc_id"], descending=[True, False])
            .limit(top_k))


def bm25_topk_sql(top_k: int = TOP_K) -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks
       GROUP BY doc_id),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
l AS (SELECT CAST(count(*) AS BIGINT) AS l FROM toks),
avg AS (SELECT CAST(floor(1000.0 * l.l / n.n + 0.5) AS HUGEINT) AS avgdl
        FROM l, n),
q AS (SELECT term,
             CAST(floor({_FX} * ln(1.0 + (n.n - df + 0.5) / (df + 0.5))
                        + 0.5) AS HUGEINT) AS idf_fx
      FROM df, n WHERE df * 2 <= n.n
      ORDER BY df DESC, term LIMIT {N_QUERY_TERMS}),
s AS (SELECT tf.doc_id,
             CAST(sum((q.idf_fx * tf.tf * 22 * avg.avgdl)
                      // (10 * avg.avgdl * tf.tf + 3 * avg.avgdl
                          + 9000 * dl.len)) AS BIGINT) AS score_fx
      FROM tf JOIN q USING (term) JOIN dl USING (doc_id), avg
      GROUP BY tf.doc_id),
r AS (SELECT *, row_number() OVER
        (ORDER BY score_fx DESC, doc_id) AS rank
      FROM s WHERE score_fx > 0)
SELECT doc_id, score_fx
FROM r WHERE rank <= {top_k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["bm25_topk"] = bm25_topk
    if o is not None:
        o["bm25_topk"] = bm25_topk_sql()
