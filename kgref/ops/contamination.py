"""Benchmark-contamination detection — flag training documents that
share word n-grams with a held-out evaluation set.

The standard decontamination step of an LLM data pipeline (e.g. the
13-gram overlap filters described for GPT-3/PaLM training sets), scaled
the Ray-Data way: the benchmark side is SMALL by definition (eval sets
are 10^3–10^5 docs), so its distinct shingle set is collected once on
the driver, ``ray.put`` into the object store, and every map_batches
task tests membership against the broadcast set — no join shuffle of
the 100-TB training side.  The training corpus streams through exactly
once.

Benchmark membership here is deterministic (``doc_id % BENCH_MOD == 0``
plays the role of "is in the eval set") so the oracle can reconstruct
the same split in SQL.  At real scale the benchmark shingles come from
a separate small table; the plumbing is identical.

Per-document output: the number of DISTINCT benchmark n-grams the doc
contains (its contamination evidence), for every non-benchmark doc.
The per-doc shingle loop is token-level Python, same budget as the
dedup shingle paths ([[kgref.ops.dedup]]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NGRAM = 5
BENCH_MOD = 101  # doc_id % 101 == 0 → "benchmark" doc


def _shingle_list(text: str, k: int) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def contamination(sf_dir: str, k: int = NGRAM, bench_mod: int = BENCH_MOD):
    """(doc_id, n_contaminated) over non-benchmark documents."""
    import ray
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    # pass 1: distinct shingles of the (small) benchmark side.  Each
    # batch emits its deduped shingles; the driver unions them — volume
    # is O(benchmark vocab), independent of corpus size.
    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        mask = ids % bench_mod == 0
        out: set[str] = set()
        for t in batch.column("text").take(
                pa.array(np.flatnonzero(mask))).to_pylist():
            out.update(_shingle_list(t, k))
        return pa.Table.from_arrays([pa.array(sorted(out), pa.string())],
                                    names=["s"])

    bench: set[str] = set()
    for b in ds.map_batches(bench_shingles,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow"):
        bench.update(b.column("s").to_pylist())
    bench_ref = ray.put(frozenset(bench))

    # pass 2: stream the training side against the broadcast set (the
    # ObjectRef is resolved once per task, not re-shipped per batch)
    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = batch.column("doc_id").to_numpy()
        keep = np.flatnonzero(ids % bench_mod != 0)
        texts = batch.column("text").take(pa.array(keep)).to_pylist()
        n_hit = np.fromiter(
            (len(frozenset(_shingle_list(t, k)) & bset) for t in texts),
            dtype=np.int32, count=len(texts))
        return pa.Table.from_arrays(
            [batch.column("doc_id").take(pa.array(keep)), pa.array(n_hit)],
            names=["doc_id", "n_contaminated"])

    return ds.map_batches(flag, batch_format="pyarrow")


def contamination_sql(k: int = NGRAM, bench_mod: int = BENCH_MOD) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < {k} THEN array_to_string(t, ' ')
              ELSE array_to_string(t[i:i+{k - 1}], ' ') END AS s
  FROM toks,
       UNNEST(range(1, CASE WHEN len(t) < {k} THEN 2
                            ELSE len(t) - {k - 1} + 1 END)) AS u(i)),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT d.doc_id, count(DISTINCT b.s) AS n
  FROM (SELECT DISTINCT doc_id, s FROM sh
        WHERE doc_id % {bench_mod} <> 0) d
  JOIN bench b USING (s)
  GROUP BY d.doc_id)
SELECT t.doc_id,
       CAST(coalesce(h.n, 0) AS INTEGER) AS n_contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
WHERE t.doc_id % {bench_mod} <> 0
"""


def register(q: dict, o: dict | None = None) -> None:
    q["contamination"] = contamination
    if o is not None:
        o["contamination"] = contamination_sql()
