"""Exact distributed quantiles over a bounded-domain numeric column —
corpus length statistics without an approximate sketch.

The classic scale trick for integer-ish columns (lengths, token
counts, scores quantized to fixed-point): quantiles need global order,
but the HISTOGRAM of a bounded-domain column is tiny regardless of
corpus size.  So: per-batch ``value_counts`` (combiner — the exchange
moves one row per DISTINCT value per batch), a Sum groupby to merge,
then one single-block pass converts the histogram into exact
continuous quantiles (cumsum + searchsorted + linear interpolation —
numpy/DuckDB ``quantile_cont`` semantics).  No sort of the data, no
all-to-all over rows, and the result is EXACT, so it hash-matches a
SQL oracle, unlike t-digest/KLL sketches.

At 100 TB: shuffle volume is #batches × #distinct-lengths (KBs); the
final stage touches one histogram-sized block.  For unbounded/float
domains, quantize to fixed-point first (the repo's 1e-4 convention)
or fall back to a sketch — documented, not silently approximate.

Values are reported fixed-point-rounded (4 decimals, half-up) on both
sides so interpolation can't flip a hash on float formatting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QS = (("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p90", 0.90),
      ("p99", 0.99))


def _histogram_quantiles(values: np.ndarray, counts: np.ndarray,
                         qs=QS) -> list[tuple[str, float]]:
    """Exact continuous quantiles from a (value, count) histogram.
    quantile_cont semantics: rank pos = (n-1)·q, linear interpolation
    between the values at ranks floor(pos) and floor(pos)+1."""
    order = np.argsort(values, kind="stable")
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for label, q in qs:
        if n == 0:
            out.append((label, float("nan")))
            continue
        pos = (n - 1) * q
        i = int(np.floor(pos))
        frac = pos - i
        # value at 0-based rank r = first v whose cum > r
        lo = v[np.searchsorted(cum, i, side="right")]
        hi = v[np.searchsorted(cum, min(i + 1, n - 1), side="right")]
        x = lo + frac * (hi - lo)
        out.append((label, float(np.floor(x * 10000 + 0.5) / 10000)))
    return out


def length_quantiles(sf_dir: str):
    """Gate query: exact p25/p50/p75/p90/p99 of documents.n_chars."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("n_chars").combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["v", "c"])

    def finish(batch: pa.Table) -> pa.Table:
        rows = _histogram_quantiles(
            batch.column("v").to_numpy(zero_copy_only=False),
            batch.column("c").to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [pa.array([r[0] for r in rows], pa.string()),
             pa.array([r[1] for r in rows], pa.float64())],
            names=["quantile", "value"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow"))


def length_quantiles_sql() -> str:
    parts = [
        f"SELECT '{label}' AS quantile, "
        f"floor(quantile_cont(n_chars, {q}) * 10000 + 0.5) / 10000 "
        f"AS value FROM documents"
        for label, q in QS
    ]
    return " UNION ALL ".join(parts)


def length_quantiles_by_lang(sf_dir: str):
    """GROUPED exact quantiles: the same bounded-domain histogram
    trick, keyed — partials are (lang, value, count) rows, the merge
    groupby is on (lang, value), and each language's histogram turns
    into quantiles in one languages-sized finish pass.  Shuffle volume
    is #batches × #langs × #distinct-values — still KBs at 100 TB."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby(["lang", "n_chars"], sort=False)
             .size().reset_index(name="c"))
        return pa.Table.from_pandas(
            g.rename(columns={"n_chars": "v"}), preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lang = df["lang"].iloc[0]
        rows = _histogram_quantiles(df["v"].to_numpy(),
                                    df["c"].to_numpy())
        return pd.DataFrame({"lang": lang,
                             "quantile": [r[0] for r in rows],
                             "value": [r[1] for r in rows]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "v"]).aggregate(Sum("c", alias_name="c"))
            .groupby("lang").map_groups(finish, batch_format="pandas"))


def length_quantiles_by_lang_sql() -> str:
    parts = [
        f"SELECT lang, '{label}' AS quantile, "
        f"floor(quantile_cont(n_chars, {q}) * 10000 + 0.5) / 10000 "
        f"AS value FROM documents GROUP BY lang"
        for label, q in QS
    ]
    return " UNION ALL ".join(parts)


def length_rank(sf_dir: str):
    """GLOBAL window function without a global sort: every document's
    corpus-wide rank by n_chars (SQL ``rank() OVER (ORDER BY
    n_chars)`` — ties take the min rank).

    The naive shape is a full corpus sort (an all-to-all over every
    row); for a bounded-domain column the histogram is enough:
    rank(x) = 1 + Σ_{v<x} count(v).  Pass 1 builds the histogram with
    the value_counts combiner (KB-sized exchange), the driver turns it
    into a cumulative table (histogram-sized), and pass 2 broadcasts
    it and ranks every row with one ``np.searchsorted`` per batch —
    zero data-sized shuffles, exact SQL window semantics."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("n_chars").combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["v", "c"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c")).take_all())
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cs = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    below = np.concatenate([[0], np.cumsum(cs)[:-1]])  # Σ counts < v
    ref = ray.put((vs, below))

    class Rank:
        def __init__(self, ref):
            self.vs, self.below = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = batch.column("n_chars").to_numpy()
            idx = np.searchsorted(self.vs, x)  # exact match guaranteed
            return pa.Table.from_arrays(
                [batch.column("doc_id"), batch.column("n_chars"),
                 pa.array(self.below[idx] + 1)],
                names=["doc_id", "n_chars", "rnk"])

    from .pairs import default_pool_size

    return ds.map_batches(Rank, fn_constructor_args=(ref,),
                          batch_format="pyarrow",
                          concurrency=default_pool_size())


def length_rank_sql() -> str:
    return ("SELECT doc_id, n_chars,"
            " CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS rnk"
            " FROM documents")


RANGE_PARTS = 8


def range_partition(sf_dir: str):
    """(partition_id, n_docs, min_len, max_len) — balanced RANGE
    partitioning by exact histogram quantile boundaries: the planning
    step a 100-TB distributed sort runs before moving any data.

    Boundary ``B_i`` (i = 1..P−1) is the smallest value whose cumulative
    count satisfies ``cum·P ≥ i·n`` (pure integer comparison — no float
    quantile in sight), computed from the same value_counts-combiner
    histogram as ``length_quantiles`` (KB-sized exchange regardless of
    corpus size).  ``partition_id(x) = #{i : B_i ≤ x}`` — one
    ``np.searchsorted`` per batch against the broadcast 7-value boundary
    array; equal keys always land in one partition.  The output is the
    per-partition audit (count, min, max) a planner uses to validate
    balance before launching the actual exchange.  SQL twin reproduces
    the boundary rule with a window cumsum and the same integer
    predicate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("n_chars").combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["v", "c"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c")).take_all())
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cs = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    cum = np.cumsum(cs)
    n = int(cum[-1]) if len(cum) else 0
    bounds = (np.empty(0, np.int64) if n == 0 else np.array(
        [vs[np.searchsorted(cum * RANGE_PARTS, i * n, side="left")]
         for i in range(1, RANGE_PARTS)], dtype=np.int64))
    ref = ray.put(bounds)

    class Assign:
        def __init__(self, ref):
            self.bounds = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = batch.column("n_chars").to_numpy()
            pid = np.searchsorted(self.bounds, x, side="right")
            return pa.Table.from_arrays(
                [pa.array(pid.astype(np.int64)),
                 batch.column("n_chars").cast(pa.int64())],
                names=["partition_id", "len"])

    from .pairs import default_pool_size

    return (ds.map_batches(Assign, fn_constructor_args=(ref,),
                           batch_format="pyarrow",
                           concurrency=default_pool_size())
            .groupby("partition_id")
            .aggregate(Count(alias_name="n_docs"),
                       Min("len", alias_name="min_len"),
                       Max("len", alias_name="max_len")))


def range_partition_sql() -> str:
    p = RANGE_PARTS
    return f"""
WITH hist AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY n_chars),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hist),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
bounds AS (
  SELECT i, (SELECT min(v) FROM cum, tot WHERE cum * {p} >= i * n) AS bv
  FROM (SELECT unnest(range(1, {p})) AS i)),
pid AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bounds b
          WHERE b.bv <= d.n_chars) AS partition_id,
         CAST(d.n_chars AS BIGINT) AS len
  FROM documents d)
SELECT partition_id, CAST(count(*) AS BIGINT) AS n_docs,
       min(len) AS min_len, max(len) AS max_len
FROM pid GROUP BY partition_id
"""


def register(q: dict, o: dict | None = None) -> None:
    q["length_quantiles"] = length_quantiles
    q["length_quantiles_by_lang"] = length_quantiles_by_lang
    q["length_rank"] = length_rank
    q["range_partition"] = range_partition
    if o is not None:
        o["length_quantiles"] = length_quantiles_sql()
        o["length_quantiles_by_lang"] = length_quantiles_by_lang_sql()
        o["length_rank"] = length_rank_sql()
        o["range_partition"] = range_partition_sql()
