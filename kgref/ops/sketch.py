"""KMV (k-minimum-values) distinct-cardinality sketch — approximate
COUNT(DISTINCT) for streams too large to hold the value set.

Unlike HyperLogLog, KMV is fully DETERMINISTIC given the hash: the
sketch is simply the k smallest distinct hash values, so (a) partials
merge by union+min (per-batch k-truncated uniques, one k·#batches-row
exchange, a single k-sized finish block — the same shape as
ops.topk), and (b) a SQL oracle can replicate the ENTIRE result bit
for bit: the text hash is a polynomial codepoint fold mod M61
(HUGEINT list_reduce, cf. ops.textstats.doc_fingerprint) and the
estimator ((k−1)·M) // kth_min is integer division.  Estimator:
Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002.

Gate corpus sanity: 500 distinct texts, k=64 → estimate within the
expected ~1/√(k−2) ≈ 13% relative error band (the pytest asserts it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KMV_K = 64
_B = 1_000_003
_M = (1 << 61) - 1


def _text_hash(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _B + ord(ch)) % _M
    return h


def distinct_estimate(sf_dir: str, k: int = KMV_K):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from .m61 import fold_m61_many

        hs = np.unique(fold_m61_many(
            batch.column("text").to_pylist()).astype(np.int64))[:k]
        return pa.Table.from_arrays([pa.array(hs)], names=["h"])

    def finish(batch: pa.Table) -> pa.Table:
        hs = np.unique(batch.column("h").to_numpy())[:k]
        if len(hs) < k:
            est = len(hs)  # fewer distinct values than k: exact
        else:
            est = ((k - 1) * _M) // int(hs[-1])
        return pa.Table.from_arrays(
            [pa.array([k], pa.int64()),
             pa.array([int(hs[-1]) if len(hs) else 0], pa.int64()),
             pa.array([int(est)], pa.int64())],
            names=["k", "kth_min", "est_distinct"])

    # batch_size=None → the finish fn sees the whole repartition(1)
    # block as ONE batch; the default (1024) would split >16 read
    # batches' worth of partials into several finish calls, each
    # emitting a bogus non-global row (ADVICE r3).
    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


def distinct_estimate_sql(k: int = KMV_K) -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS HUGEINT),
           list_transform(range(1, len(text) + 1),
                          i -> CAST(ascii(text[i]) AS HUGEINT))),
           (a, b) -> (a * {_B} + b) % {_M}) AS h
  FROM documents),
km AS (SELECT h FROM h ORDER BY h LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(max(h) AS BIGINT) AS kth_min,
       CASE WHEN count(*) < {k} THEN count(*)
            ELSE CAST((({k} - 1) * CAST({_M} AS HUGEINT)) // max(h)
                      AS BIGINT) END AS est_distinct
FROM km
"""


def register(q: dict, o: dict | None = None) -> None:
    q["distinct_estimate"] = distinct_estimate
    if o is not None:
        o["distinct_estimate"] = distinct_estimate_sql()
