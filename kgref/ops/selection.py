"""Exact distributed order-statistic selection WITHOUT a global sort —
the percentile-threshold filter a perplexity-curation run needs: keep
every document whose per-token LM surprisal is at or below the exact
p75 value of the corpus.

ops/quantiles.py handles quantiles over BOUNDED domains with one exact
histogram combiner; per-token surprisal lives in [0, 10⁹], far past a
single histogram.  This op extends the trick to two levels, the
classic radix-selection shape:

  pass A: histogram of the HIGH 16 bits (≤ ~15k buckets — a
          bounded-domain combiner again) → locate the bucket holding
          the k-th smallest (k = ceil(3N/4)) from cumulative counts;
  pass B: histogram of the LOW 16 bits INSIDE that one bucket
          (≤ 65 536 rows) → the exact k-th value T;
  pass C: broadcast T, keep rows with value ≤ T.

Driver-resident state is ≤ 80k histogram rows regardless of corpus
size; the doc-count-sized (doc_id, value) table is materialized ONCE
and streamed three times — the corpus TEXT is read only by the
underlying lm_surprisal passes.  All arithmetic is exact int64
(value = surprisal // n_tokens, the ops/lm.py convention), so the
threshold — and the kept SET — matches the DuckDB twin (ORDER BY /
OFFSET k-1) bit-for-bit, ties included: every doc with value ≤ T is
kept, which is the deterministic closure of "the lowest 75%".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PCT_NUM, PCT_DEN = 3, 4  # keep the lowest 3/4 (closed under ties)
_LO_BITS = 16
_LO_MASK = (1 << _LO_BITS) - 1


def _hist(ds, column: str, transform):
    """Distributed exact histogram: per-batch bincount partials on
    ``transform(values)`` → one key-sized Sum → driver dict."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = transform(t.column(column).to_numpy(zero_copy_only=False))
        if len(v) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["k", "n"])
        keys, counts = np.unique(v, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(counts.astype(np.int64))],
            names=["k", "n"])

    df = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("k").aggregate(Sum("n", alias_name="n"))
          .to_pandas())  # ≤ 2^16-ish rows: documented small side
    return (df["k"].to_numpy(np.int64), df["n"].to_numpy(np.int64))


def surprisal_filter(sf_dir: str):
    """Gate query: (doc_id, surprisal_per_tok) — documents whose exact
    per-token surprisal is ≤ the exact p75 corpus value."""
    import ray

    from .lm import lm_surprisal

    def per_tok(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.divide(t.column("surprisal").cast(pa.int64()),
                      t.column("n_tokens").cast(pa.int64()))
        return pa.Table.from_arrays(
            [t.column("doc_id"), s], names=["doc_id", "v"])

    sds = (lm_surprisal(sf_dir)
           .map_batches(per_tok, batch_format="pyarrow")
           .materialize())  # (doc_id, int64) — 16 B/row, spillable
    n = sds.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_id", "surprisal_per_tok"]))
    k = -((-PCT_NUM * n) // PCT_DEN)  # ceil(3N/4), 1-indexed rank

    # pass A: high bits
    hk, hn = _hist(sds, "v", lambda v: v >> _LO_BITS)
    order = np.argsort(hk)
    hk, hn = hk[order], hn[order]
    cum = np.cumsum(hn)
    hi_idx = int(np.searchsorted(cum, k))
    hb = int(hk[hi_idx])
    k2 = k - (int(cum[hi_idx - 1]) if hi_idx else 0)

    # pass B: low bits inside the hb bucket
    def low_in_bucket(v: np.ndarray) -> np.ndarray:
        return (v & _LO_MASK)[(v >> _LO_BITS) == hb]

    lk, ln = _hist(sds, "v", low_in_bucket)
    order = np.argsort(lk)
    lk, ln = lk[order], ln[order]
    lo = int(lk[int(np.searchsorted(np.cumsum(ln), k2))])
    threshold = (hb << _LO_BITS) | lo

    # pass C: broadcast threshold, keep value ≤ T
    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.less_equal(t.column("v"), pa.scalar(threshold, pa.int64()))
        kept = t.filter(m)
        return kept.rename_columns(["doc_id", "surprisal_per_tok"])

    return sds.map_batches(keep, batch_format="pyarrow")


def surprisal_filter_sql() -> str:
    from .lm import lm_surprisal_sql

    base = lm_surprisal_sql()
    return f"""
WITH s AS ({base}),
v AS (SELECT doc_id,
             CAST(surprisal // n_tokens AS BIGINT) AS surprisal_per_tok
      FROM s),
n AS (SELECT count(*) AS n FROM v),
r AS (SELECT surprisal_per_tok AS thr,
             row_number() OVER (ORDER BY surprisal_per_tok) AS rn
      FROM v),
t AS (SELECT thr FROM r, n
      WHERE rn = ({PCT_NUM} * n.n + {PCT_DEN} - 1) // {PCT_DEN})
SELECT v.doc_id, v.surprisal_per_tok
FROM v, t WHERE v.surprisal_per_tok <= t.thr
"""


def register(q: dict, o: dict | None = None) -> None:
    q["surprisal_filter"] = surprisal_filter
    if o is not None:
        o["surprisal_filter"] = surprisal_filter_sql()
