"""Table profiling — the ANALYZE/statistics-collection pass a query
planner (and a data-quality audit) runs over a corpus table: per
column, row count, null count, EXACT distinct count, and min/max.

Scale shape: one streaming pass computes per-batch partials for the
scalar stats (count/nulls/min/max — column-dimension-sized exchange),
and the exact distinct counts ride the combiner pattern: per-batch
``pc.unique`` per column shrinks the (column, value) exchange to
distinct-values-per-batch, one groupby dedups globally, a per-batch
count partial + tiny Sum finishes.  Values cross the wire as their
native type per profile (numeric vs string) so min/max semantics match
SQL (numeric compare for numerics, lexicographic for strings); the
public output renders everything as strings AFTER aggregation.

The driver never holds more than (#columns) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_COLS = ("doc_id", "n_chars")
STR_COLS = ("lang", "source")


def profile_documents(sf_dir: str):
    """(column, n, n_null, n_distinct, min_v, max_v) for the documents
    table's scalar columns; min/max rendered as strings."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    cols = list(NUM_COLS + STR_COLS)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": pa.array(cols, pa.string()),
            "n": pa.array([len(t.column(c)) for c in cols], pa.int64()),
            "n_null": pa.array([t.column(c).null_count for c in cols],
                               pa.int64())})

    counts = (ds.map_batches(count_rows, batch_format="pyarrow")
              .groupby("column")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("n_null", alias_name="n_null")))

    def extreme_rows(t: pa.Table) -> pa.Table:
        # Ray's sort-based Min/Max cannot mix nulls into a compare, so
        # every emitted row carries VALID values only: a column with no
        # non-null data in this batch emits no row, and the off-type
        # fields hold constants (0 / "") that are homogeneous within
        # each key — never compared against a real value of the other
        # type because "column" is the groupby key.
        rows = {"column": [], "num_min": [], "num_max": [],
                "str_min": [], "str_max": []}
        for c in cols:
            col = t.column(c)
            if len(col) == col.null_count:
                continue  # nothing to compare in this batch
            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            num = c in NUM_COLS
            rows["column"].append(c)
            rows["num_min"].append(mn if num else 0)
            rows["num_max"].append(mx if num else 0)
            rows["str_min"].append("" if num else mn)
            rows["str_max"].append("" if num else mx)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "num_min": pa.array(rows["num_min"], pa.int64()),
            "num_max": pa.array(rows["num_max"], pa.int64()),
            "str_min": pa.array(rows["str_min"], pa.string()),
            "str_max": pa.array(rows["str_max"], pa.string())})

    extremes = (ds.map_batches(extreme_rows, batch_format="pyarrow")
                .groupby("column")
                .aggregate(Min("num_min", alias_name="num_min"),
                           Max("num_max", alias_name="num_max"),
                           Min("str_min", alias_name="str_min"),
                           Max("str_max", alias_name="str_max")))

    def distinct_partials(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            # nulls are not distinct VALUES (the SQL count(DISTINCT)
            # convention); they are reported via n_null instead
            u = pc.unique(pc.cast(t.column(c).drop_null(), pa.string()))
            names.extend([c] * len(u))
            vals.append(u)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "value": pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                 else v for v in vals])})

    def count_partials(t: pa.Table) -> pa.Table:
        enc = t.column("column").combine_chunks().dictionary_encode()
        counts = pc.value_counts(enc.indices)
        return pa.table({
            "column": enc.dictionary.take(counts.field("values")),
            "d": pc.cast(counts.field("counts"), pa.int64())})

    from ray.data.aggregate import Count
    distinct = (ds.map_batches(distinct_partials, batch_format="pyarrow")
                .groupby(["column", "value"])
                .aggregate(Count(alias_name="_c"))  # global dedup
                .map_batches(count_partials, batch_format="pyarrow")
                .groupby("column").aggregate(Sum("d",
                                                 alias_name="n_distinct")))

    cdf = counts.to_pandas()      # column-dimension-sized (len == #cols)
    edf = extremes.to_pandas()
    ddf = distinct.to_pandas()
    out = (cdf.merge(edf, on="column").merge(ddf, on="column")
           .sort_values("column"))

    def render(r):
        if r["column"] in NUM_COLS:
            return str(int(r["num_min"])), str(int(r["num_max"]))
        return r["str_min"], r["str_max"]

    mins, maxs = zip(*(render(r) for _, r in out.iterrows()))
    return pa.table({
        "column": pa.array(out["column"].tolist(), pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64)),
        "n_null": pa.array(out["n_null"].to_numpy(np.int64)),
        "n_distinct": pa.array(out["n_distinct"].to_numpy(np.int64)),
        "min_v": pa.array(list(mins), pa.string()),
        "max_v": pa.array(list(maxs), pa.string())})


def profile_documents_sql() -> str:
    parts = []
    for c in NUM_COLS + STR_COLS:
        if c in NUM_COLS:
            mn, mx = (f"CAST(min({c}) AS VARCHAR)",
                      f"CAST(max({c}) AS VARCHAR)")
        else:
            mn, mx = f"min({c})", f"max({c})"
        parts.append(f"""
SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_v, {mx} AS max_v
FROM documents""")
    return "\nUNION ALL ".join(parts)


def register(q: dict, o: dict | None = None) -> None:
    q["profile_documents"] = profile_documents
    if o is not None:
        o["profile_documents"] = profile_documents_sql()
