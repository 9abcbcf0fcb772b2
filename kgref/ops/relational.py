"""Relational operator demonstrations over the TPC-H-ish star schema:
read-pruned filtered aggregation and joins (broadcast and shuffle).

These exist to round out the engine surface beyond the annotator
(SURVEY.md §2.8, "prune at the read", §2.4 join taxonomy):

- ``lineitem_pricing``: TPC-H-Q1-shaped — the parquet read carries BOTH
  a column projection and a row-filter expression, so only the needed
  columns/row-groups leave storage; per-group stats via one small
  native groupby (6 groups).
- ``orders_by_segment``: fact×dimension — the DIMENSION (customer) is
  broadcast (``ray.put`` of a key→segment dict) and mapped over order
  batches: the correct join shape when one side is dimension-sized.
- ``nation_orders_join``: Ray's native ``Dataset.join`` (hash shuffle
  join, Ray ≥2.46) exercised on customer⋈orders — the path for genuine
  large×large joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SHIP_CUTOFF = "1998-09-02"


def _fx4(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Half-up 4-decimal fixed-point int64 of a float column (the SQL
    twin is ``CAST(floor(x * 10000 + 0.5) AS BIGINT)``)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 10000.0), 0.5)),
                   pa.int64())


def lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped pruned aggregation.  All float aggregates are
    FIXED-POINT: values are rounded half-up to 4 decimals as int64 in a
    vectorized pre-stage, summed exactly (integer Sum is associative →
    order-independent, no accumulation-order parity flakes), and scaled
    back after the groupby; avg = floor(sum4/n + 0.5)/10⁴ with the same
    double division on both sides."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate")
                <= pa.scalar(np.datetime64(SHIP_CUTOFF, "us"))),
    )

    def to_fx(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("l_returnflag"), batch.column("l_linestatus"),
             _fx4(batch.column("l_quantity")),
             _fx4(batch.column("l_extendedprice")),
             _fx4(batch.column("l_discount"))],
            names=["l_returnflag", "l_linestatus", "qty4", "price4",
                   "disc4"])

    out = (
        ds.map_batches(to_fx, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty4", alias_name="qty4"),
                   Sum("price4", alias_name="price4"),
                   Sum("disc4", alias_name="disc4"),
                   Count(alias_name="count_order"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("count_order")
        avg4 = pc.floor(pc.add(pc.divide(
            pc.cast(batch.column("disc4"), pa.float64()),
            pc.cast(n, pa.float64())), 0.5))
        return pa.Table.from_arrays(
            [batch.column("l_returnflag"), batch.column("l_linestatus"),
             pc.divide(pc.cast(batch.column("qty4"), pa.float64()), 10000.0),
             pc.divide(pc.cast(batch.column("price4"), pa.float64()),
                       10000.0),
             pc.divide(avg4, 10000.0), n],
            names=["l_returnflag", "l_linestatus", "sum_qty",
                   "sum_base_price", "avg_disc", "count_order"])

    return out.map_batches(finish, batch_format="pyarrow")


def lineitem_pricing_sql() -> str:
    fx = "sum(CAST(floor({} * 10000 + 0.5) AS BIGINT))"
    return f"""
SELECT l_returnflag, l_linestatus,
       {fx.format('l_quantity')} / 10000.0 AS sum_qty,
       {fx.format('l_extendedprice')} / 10000.0 AS sum_base_price,
       floor({fx.format('l_discount')} / CAST(count(*) AS DOUBLE) + 0.5)
         / 10000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def orders_by_segment(sf_dir: str):
    """Broadcast dimension join: customer segment dict via ray.put, one
    lookup per order batch — no shuffle for a fact×dimension join."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ref = ray.put((cust.column("c_custkey").combine_chunks(),
                   cust.column("c_mktsegment").combine_chunks()))

    class AttachSegment:
        def __init__(self, ref):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # vectorized broadcast lookup: index_in + take (C kernels),
            # not a Python dict probe per row
            idx = pc.index_in(batch.column("o_custkey"),
                              value_set=self.keys)
            segs = pc.fill_null(self.segs.take(idx), "")
            return pa.Table.from_arrays(
                [segs, batch.column("o_totalprice")],
                names=["segment", "o_totalprice"])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    from .pairs import default_pool_size

    joined = ds.map_batches(AttachSegment, fn_constructor_args=(ref,),
                            batch_format="pyarrow",
                            concurrency=default_pool_size())

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        # fixed-point sum → order-independent (see lineitem_pricing)
        df["p4"] = np.floor(df["o_totalprice"] * 10000 + 0.5).astype(
            np.int64)
        g = (df.groupby("segment", sort=False)["p4"]
             .agg(n_orders="size", total="sum").reset_index())
        g["total"] = g["total"] / 10000.0
        return g

    # 5 segments → single partition is fine; keep the coarse pattern
    return joined.map_batches(
        lambda b: b.append_column("part", pa.array([0] * len(b),
                                                   pa.int32())),
        batch_format="pyarrow",
    ).groupby("part").map_groups(
        lambda df: agg(df.drop(columns=["part"])), batch_format="pandas")


def orders_by_segment_sql() -> str:
    return ("SELECT c.c_mktsegment AS segment, count(*) AS n_orders,"
            " sum(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT))"
            " / 10000.0 AS total"
            " FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey"
            " GROUP BY c.c_mktsegment")


def nation_orders_join(sf_dir: str):
    """Ray native hash join (Dataset.join): customer⋈orders shuffled on
    custkey, then per-nation order counts — the large×large join path."""
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderkey"])
    joined = orders.join(cust, join_type="inner", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("c_nationkey", sort=False)["o_orderkey"]
                .agg(n_orders="size").reset_index()
                .rename(columns={"c_nationkey": "nationkey"}))

    return joined.map_batches(
        lambda b: b.append_column("part",
                                  pc.cast(pc.bit_wise_and(
                                      b.column("c_nationkey"), 15),
                                      pa.int32())),
        batch_format="pyarrow",
    ).groupby("part").map_groups(
        lambda df: agg(df.drop(columns=["part"])), batch_format="pandas")


def nation_orders_join_sql() -> str:
    return ("SELECT c.c_nationkey AS nationkey, count(*) AS n_orders"
            " FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey"
            " GROUP BY c.c_nationkey")


# Price bands for the range join: [lo, hi) half-open intervals covering
# the generator's o_totalprice domain (~1k..500k).  Static/broadcast by
# construction — the canonical small side of a range join.
BAND_EDGES = [0.0, 50_000.0, 100_000.0, 150_000.0, 200_000.0,
              300_000.0, 400_000.0, 600_000.0]


def orders_price_band(sf_dir: str):
    """RANGE JOIN (band join): each order matched to the band whose
    [lo, hi) interval contains its price, then aggregated per band.

    Shape: the interval table is tiny and sorted, so the join is a
    broadcast binary search — ``np.searchsorted(edges, price)`` per
    batch (no shuffle, no per-row Python), with per-batch PARTIAL
    (band, count, cents-sum) rows feeding a bands-sized groupby.  The
    oracle is a genuine inequality join (``o.price >= b.lo AND
    o.price < b.hi``) over a VALUES table; both sides compare raw
    doubles so the band boundary can't flip between engines.  Exact
    int64 cent sums (np.add.at) keep the total order-independent."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    edges = np.asarray(BAND_EDGES)

    def partials(batch: pa.Table) -> pa.Table:
        p = batch.column("o_totalprice").to_numpy()
        band = np.searchsorted(edges, p, side="right") - 1
        # prices outside [edges[0], edges[-1]) give band -1 (wraps) or
        # len-1 (out of bounds); the oracle's inner join just drops
        # such rows, so mask them out of the accumulation (ADVICE r3)
        in_range = (band >= 0) & (band < len(edges) - 1)
        if not in_range.all():
            p, band = p[in_range], band[in_range]
        v2 = np.floor(p * 100 + 0.5).astype(np.int64)
        n = np.zeros(len(edges) - 1, dtype=np.int64)
        s = np.zeros(len(edges) - 1, dtype=np.int64)
        np.add.at(n, band, 1)
        np.add.at(s, band, v2)
        seen = n > 0
        ids = np.nonzero(seen)[0].astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(n[seen]), pa.array(s[seen])],
            names=["band_id", "n", "cents"])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])
    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("band_id")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("cents", alias_name="cents")))

    lo = pa.array(edges[:-1]); hi = pa.array(edges[1:])

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("band_id")
        return pa.Table.from_arrays(
            [ids, pc.take(lo, ids), pc.take(hi, ids),
             batch.column("n_orders"),
             pc.divide(pc.cast(batch.column("cents"), pa.float64()),
                       100.0)],
            names=["band_id", "lo", "hi", "n_orders", "total"])

    return agg.map_batches(finish, batch_format="pyarrow")


def orders_price_band_sql() -> str:
    rows = ", ".join(
        f"({i}, {lo!r}, {hi!r})"
        for i, (lo, hi) in enumerate(zip(BAND_EDGES, BAND_EDGES[1:])))
    return f"""
WITH bands(band_id, lo, hi) AS (VALUES {rows})
SELECT CAST(b.band_id AS BIGINT) AS band_id, b.lo, b.hi,
       count(*) AS n_orders,
       sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
         AS total
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_id, b.lo, b.hi
"""


def orders_rollup(sf_dir: str):
    """ROLLUP / grouping-sets aggregate: (status, priority) totals plus
    per-status subtotals plus the grand total, one query.

    Shape: per-batch partials at the FINEST level only (the combiner
    pattern — the shuffle moves one row per (status, priority) per
    batch), one small native groupby, then the subtotal levels are
    expanded from the finest table in a single tiny finish pass (the
    rolled-up table is dimension-sized by construction, never data-
    sized).  Rolled-up dimensions use the '' sentinel, matching the
    oracle's coalesce — no NULL conventions in the value hash."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.floor(
            df["o_totalprice"] * 100 + 0.5).astype(np.int64)
        g = (df.groupby(["o_orderstatus", "o_orderpriority"], sort=False)
             ["cents"].agg(n="size", cents="sum").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])
    fine = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("cents", alias_name="cents")))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["part"])
        sub = (df.groupby("o_orderstatus", as_index=False)
               [["n", "cents"]].sum())
        sub["o_orderpriority"] = ""
        tot = pd.DataFrame({"o_orderstatus": [""], "o_orderpriority": [""],
                            "n": [df["n"].sum()],
                            "cents": [df["cents"].sum()]})
        out = pd.concat([df, sub, tot], ignore_index=True)
        out["total"] = out["cents"] / 100.0
        return out.rename(columns={"o_orderstatus": "status",
                                   "o_orderpriority": "priority",
                                   "n": "n_orders"})[
            ["status", "priority", "n_orders", "total"]]

    return fine.map_batches(
        lambda b: b.append_column("part", pa.array([0] * len(b),
                                                   pa.int32())),
        batch_format="pyarrow",
    ).groupby("part").map_groups(expand, batch_format="pandas")


def orders_rollup_sql() -> str:
    return """
SELECT coalesce(o_orderstatus, '') AS status,
       coalesce(o_orderpriority, '') AS priority,
       count(*) AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
         AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


BIG_ORDER_PRICE = 400_000.0


def _big_order_custkeys(sf_dir: str):
    """Distinct custkeys holding ≥1 order above BIG_ORDER_PRICE — the
    filter pushes to the parquet read, per-batch np.unique partials
    shrink the stream, and the driver unions a result bounded by the
    customer-dimension size (the justified broadcast: it IS the small
    side by definition)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_totalprice") >= BIG_ORDER_PRICE)
    parts = ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pa.array(np.unique(b.column("o_custkey").to_numpy()))],
            names=["k"]),
        batch_format="pyarrow").take_all()
    keys = (np.unique(np.concatenate(
        [np.asarray([r["k"] for r in parts], dtype=np.int64)]))
        if parts else np.array([], dtype=np.int64))
    return ray.put(pa.array(keys))


def _customers_exists_join(sf_dir: str, anti: bool):
    """Broadcast SEMI (anti=False) / ANTI (anti=True) join: customers
    with ≥1 (resp. no) order above BIG_ORDER_PRICE.  One pass over the
    dimension with an is_in mask — no shuffle."""
    import ray
    import ray.data as rd

    ref = _big_order_custkeys(sf_dir)

    class Mask:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hit = pc.is_in(batch.column("c_custkey"), value_set=self.keys)
            return batch.filter(pc.invert(hit) if anti else hit)

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal"])
    from .pairs import default_pool_size

    return ds.map_batches(Mask, fn_constructor_args=(ref,),
                          batch_format="pyarrow",
                          concurrency=default_pool_size())


def customers_semi_big(sf_dir: str):
    return _customers_exists_join(sf_dir, anti=False)


def customers_anti_big(sf_dir: str):
    return _customers_exists_join(sf_dir, anti=True)


def _exists_sql(op: str) -> str:
    return (f"SELECT c_custkey, c_name, c_acctbal FROM customer c"
            f" WHERE {op} (SELECT 1 FROM orders o"
            f" WHERE o.o_custkey = c.c_custkey"
            f" AND o.o_totalprice >= {BIG_ORDER_PRICE!r})")


def customers_anti_native(sf_dir: str):
    """Native LEFT ANTI join (Dataset.join hash shuffle) — the same
    result set as the broadcast NOT-EXISTS (customers_anti_big) reached
    through Ray's shuffle anti-join: the right shape when the exclusion
    side is too big to broadcast.  Both sides here are clean parquet
    reads; see clusters.dedup_apply for why iterative-output datasets
    currently need the groupby-based anti-join instead."""
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_acctbal"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_totalprice") >= BIG_ORDER_PRICE)
    return cust.join(big, join_type="left_anti", num_partitions=16,
                     on=("c_custkey",), right_on=("o_custkey",))


def customer_big_order_counts(sf_dir: str):
    """Native LEFT OUTER join (Dataset.join, Ray ≥2.46): every customer
    row survives, unmatched rows carry a NULL order key, and the
    per-customer count of matched keys is assembled with the combiner
    pattern (per-batch non-null counts → one Sum groupby) so the second
    exchange moves one row per customer per batch.  Customers with no
    qualifying order report n_big = 0 — the semantics an inner join
    cannot express."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"],
        filter=pc.field("o_totalprice") >= BIG_ORDER_PRICE)
    joined = cust.join(big, join_type="left_outer", num_partitions=16,
                       on=("c_custkey",), right_on=("o_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby("c_custkey")["o_orderkey"].count()
             .astype(np.int64).reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_custkey").aggregate(Sum("n", alias_name="n_big")))


def customer_big_order_counts_sql() -> str:
    return (f"SELECT c.c_custkey, count(o.o_orderkey) AS n_big"
            f" FROM customer c LEFT JOIN"
            f" (SELECT * FROM orders"
            f"  WHERE o_totalprice >= {BIG_ORDER_PRICE!r}) o"
            f" ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey")


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q3_TOPK = 10


def orders_revenue_topk(sf_dir: str, k: int = Q3_TOPK):
    """TPC-H-Q3-shaped 3-table join: top-k open orders by revenue for
    one market segment (orders placed before Q3_DATE, lines shipped
    after it).  Shapes: the customer side is DIMENSION-bounded — the
    segment's custkeys broadcast via ``ray.put`` and filter orders
    inside ``map_batches`` (no shuffle); the orders↔lineitem side is
    big×big — a native hash join on the order key, with the lineitem
    side PRE-AGGREGATED per batch (orderkey → revenue partial) so the
    join input carries one row per (orderkey, batch), not one per line
    item.  Revenue is exact int64 fixed point:
    ``fx4(price) · (10⁴ − fx4(disc))`` summed associatively, scaled
    back by one double division identical to the SQL twin's."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    seg_keys = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == Q3_SEGMENT)
    keys = np.sort(np.concatenate(
        [b.column("c_custkey").to_numpy(zero_copy_only=False)
         for b in seg_keys.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))  # dimension-bounded broadcast
    kref = ray.put(keys)
    cutoff = np.datetime64(Q3_DATE, "us")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < pa.scalar(cutoff))

    def semi(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.searchsorted(ks, ck)
            hit = ((pos < len(ks))
                   & (ks[np.minimum(pos, len(ks) - 1)] == ck))
        else:
            hit = np.zeros(len(ck), bool)
        return batch.filter(pa.array(hit)).select(
            ["o_orderkey", "o_orderdate"])

    odim = orders.map_batches(semi, batch_format="pyarrow")

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pa.scalar(cutoff))

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev8 = pc.multiply(
            _fx4(batch.column("l_extendedprice")),
            pc.subtract(pa.scalar(10000, pa.int64()),
                        _fx4(batch.column("l_discount"))))
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), rev8],
            names=["o_orderkey", "rev8"])
        return pa.TableGroupBy(t, "o_orderkey").aggregate(
            [("rev8", "sum")]).rename_columns(["o_orderkey", "rev8"])

    lrev = lines.map_batches(rev_partial, batch_format="pyarrow")
    joined = lrev.join(odim, join_type="inner", num_partitions=16,
                       on=("o_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), t.column("o_orderdate"),
             pc.divide(pc.cast(t.column("rev8"), pa.float64()),
                       pa.scalar(100000000.0))],
            names=["o_orderkey", "o_orderdate", "revenue"])

    return (joined.groupby(["o_orderkey", "o_orderdate"])
            .aggregate(Sum("rev8", alias_name="rev8"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["revenue", "o_orderkey"], descending=[True, False])
            .limit(k))


def orders_revenue_topk_sql(k: int = Q3_TOPK) -> str:
    fx = "CAST(floor({} * 10000 + 0.5) AS BIGINT)"
    rev = (f"sum({fx.format('l.l_extendedprice')}"
           f" * (10000 - {fx.format('l.l_discount')}))")
    return f"""
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
       {rev} / 100000000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT {k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["lineitem_pricing"] = lineitem_pricing
    q["orders_revenue_topk"] = orders_revenue_topk
    q["orders_by_segment"] = orders_by_segment
    q["nation_orders_join"] = nation_orders_join
    q["orders_price_band"] = orders_price_band
    q["customers_semi_big"] = customers_semi_big
    q["customers_anti_big"] = customers_anti_big
    q["orders_rollup"] = orders_rollup
    q["customer_big_order_counts"] = customer_big_order_counts
    q["customers_anti_native"] = customers_anti_native
    if o is not None:
        o["lineitem_pricing"] = lineitem_pricing_sql()
        o["orders_revenue_topk"] = orders_revenue_topk_sql()
        o["orders_by_segment"] = orders_by_segment_sql()
        o["nation_orders_join"] = nation_orders_join_sql()
        o["orders_price_band"] = orders_price_band_sql()
        o["customers_semi_big"] = _exists_sql("EXISTS")
        o["customers_anti_big"] = _exists_sql("NOT EXISTS")
        o["orders_rollup"] = orders_rollup_sql()
        o["customer_big_order_counts"] = customer_big_order_counts_sql()
        o["customers_anti_native"] = _exists_sql("NOT EXISTS")
