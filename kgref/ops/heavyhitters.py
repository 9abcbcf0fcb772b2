"""Frequent-items (heavy hitters) without a full-vocabulary shuffle.

``vocab_topk`` (ops/vocab.py) shuffles one row per distinct token per
batch — fine when you want the whole frequency table.  When you only
want the items above a frequency THRESHOLD (the usual case at corpus
scale: boilerplate detection, stop-list induction, hot-key discovery
before a groupby), the Misra–Gries bound does far better.  This is the
r5 refinement of the two-pass design (VERDICT r4 Next #4 — the old
phase-1 candidate union was bounded by k·#batches on the driver):

Phase 1 emits, per batch, the RESIDUAL counts against a denominator of
``m = 2k``: r_b(t) = freq_b(t) − ⌊N_b/m⌋ for the (< m) tokens where
that is positive, plus one batch-total row.  Per token the distributed
Sum R(t) = Σ r_b(t) satisfies

    true(t) ≤ R(t) + Σ_b ⌊N_b/m⌋ ≤ R(t) + N/m,

so a true heavy hitter (true(t)·k > N) must have R(t)·m > N
(R·m ≥ true·m − N = 2·true·k − N > N) — and because residuals sum to
at most N (Σ_t R(t) ≤ Σ_b N_b), FEWER THAN m = 2k tokens can pass that
filter.  The surviving candidate set is therefore corpus-size-
INDEPENDENT: < 2k rows land on the driver regardless of batch count,
then broadcast for the exact recount (two linear passes, zero
full-vocab exchange, exact output — every token with count·k > N).
The aggregated residual table itself stays a distributed Dataset
(materialized once; scanned twice for the total row and the filter).

The output is deterministic and exact, so the DuckDB twin is an
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
    m = 2 * k  # internal residual denominator: see module docstring

    def residuals(batch: pa.Table) -> pa.Table:
        toks, n = _batch_counts(batch)
        nb = int(n.sum())
        r = n - nb // m
        keep = r > 0  # < m tokens per batch by construction
        return pa.Table.from_arrays(
            [pa.concat_arrays([toks.filter(pa.array(keep)),
                               pa.array([_TOTAL])]),
             pa.array(np.concatenate([r[keep], [nb]]))],
            names=["token", "n"])

    ds = rd.read_parquet(path, columns=["text"])
    # distributed residual merge — stays a Dataset (positive-residual
    # vocabulary sized), materialized once for its two cheap scans
    resid = (ds.map_batches(residuals, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .materialize())

    def total_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("token"), _TOTAL))

    total = int(resid.map_batches(total_only, batch_format="pyarrow")
                .take_all()[0]["n"])

    def survivors(t: pa.Table) -> pa.Table:
        rm = pc.multiply(t.column("n").cast(pa.int64()),
                         pa.scalar(m, pa.int64()))
        keep = pc.and_(pc.greater(rm, pa.scalar(total, pa.int64())),
                       pc.not_equal(t.column("token"), _TOTAL))
        return t.filter(keep)

    surv = (resid.map_batches(survivors, batch_format="pyarrow")
            .take_all())  # < 2k rows: corpus-size-INDEPENDENT bound
    cand = ray.put(pa.array(sorted(r["token"] for r in surv)))

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
