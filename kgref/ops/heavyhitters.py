"""Frequent-items (heavy hitters) without a full-vocabulary shuffle.

``vocab_topk`` (ops/vocab.py) shuffles one row per distinct token per
batch — fine when you want the whole frequency table.  When you only
want the items above a frequency THRESHOLD (the usual case at corpus
scale: boilerplate detection, stop-list induction, hot-key discovery
before a groupby), the Misra–Gries observation bounds the work far
tighter: a token with global frequency > N/k must be LOCALLY heavy
(freq_b > N_b/k) in at least one batch — otherwise summing the
per-batch bounds gives freq ≤ N/k.  So per-batch exact counts filtered
to the < k locally-heavy tokens form a candidate superset of every
global heavy hitter, and an exact recount restricted to that candidate
set (broadcast, dimension-sized) yields the EXACT answer — two linear
passes, zero full-vocab exchange.

Scale shape: phase-1 emits ≤ k candidate rows + 1 total-row per batch
(KB-sized exchange); the distinct-candidate table is bounded by
k × #batches in theory and by "tokens locally heavy anywhere" in
practice — it is collected on the driver and broadcast via ``ray.put``
for the recount, the documented small-side-broadcast pattern.  Phase-2
partials are candidate-bounded.  The output is deterministic and exact
(every token with count·k > N, full count), so the DuckDB twin is an
ordinary GROUP BY ... HAVING — no sketch-tolerance gymnastics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HH_K = 50  # threshold denominator: report tokens with freq > N/k

# sentinel key for the per-batch token-total row (tokens come from a
# single-space split, so a NUL byte can never collide with a real token)
_TOTAL = "\x00total"


def _batch_counts(batch: pa.Table) -> tuple[pa.StringArray, np.ndarray]:
    toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    counts = pc.value_counts(enc.indices)
    return (enc.dictionary.take(counts.field("values")),
            counts.field("counts").to_numpy().astype(np.int64))


def heavy_hitters(sf_dir: str, k: int = HH_K):
    """All tokens with corpus frequency strictly above N/k, with exact
    counts, ordered (n_total desc, token asc)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"

    def candidates(batch: pa.Table) -> pa.Table:
        toks, n = _batch_counts(batch)
        nb = int(n.sum())
        keep = n * k > nb  # locally heavy: freq_b > N_b/k  (< k tokens)
        return pa.Table.from_arrays(
            [pa.concat_arrays([toks.filter(pa.array(keep)),
                               pa.array([_TOTAL])]),
             pa.array(np.concatenate([n[keep], [nb]]))],
            names=["token", "n"])

    ds = rd.read_parquet(path, columns=["text"])
    summary = (ds.map_batches(candidates, batch_format="pyarrow")
               .groupby("token").aggregate(Sum("n", alias_name="n"))
               .take_all())  # bounded: <= k+1 rows per input batch,
    # deduped to "tokens locally heavy in >= 1 batch" (the documented
    # driver-side small side; the recount below treats the CORPUS as
    # the big side)
    total = next(r["n"] for r in summary if r["token"] == _TOTAL)
    cand = ray.put(pa.array(sorted(
        r["token"] for r in summary if r["token"] != _TOTAL)))

    def recount(batch: pa.Table) -> pa.Table:
        toks, n = _batch_counts(batch)
        keep = pc.is_in(toks, value_set=ray.get(cand))
        return pa.Table.from_arrays(
            [toks.filter(keep),
             pa.array(n[keep.to_numpy(zero_copy_only=False)])],
            names=["token", "n"])

    def threshold(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(pc.multiply(batch.column("n_total"),
                                   pa.scalar(k, pa.int64())),
                       pa.scalar(total, pa.int64())))

    return (rd.read_parquet(path, columns=["text"])
            .map_batches(recount, batch_format="pyarrow")
            .groupby("token").aggregate(Sum("n", alias_name="n_total"))
            .map_batches(threshold, batch_format="pyarrow")
            .sort(["n_total", "token"], descending=[True, False]))


def heavy_hitters_sql(k: int = HH_K) -> str:
    return f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
tot AS (SELECT count(*) AS n FROM t)
SELECT w AS token, count(*) AS n_total
FROM t GROUP BY w
HAVING count(*) * {k} > (SELECT n FROM tot)
ORDER BY n_total DESC, token
"""


def register(q: dict, o: dict | None = None) -> None:
    q["heavy_hitters"] = heavy_hitters
    if o is not None:
        o["heavy_hitters"] = heavy_hitters_sql()
