"""orders_revenue_topk (kgref.ops.relational): Q3-shaped 3-table join —
segment semi-filter, both date boundaries (strict < and >), exact
fixed-point revenue, and deterministic tie-break — against the twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.relational import (Q3_DATE, Q3_SEGMENT,
                                  orders_revenue_topk,
                                  orders_revenue_topk_sql)


def test_orders_revenue_topk_matches_oracle(ray_session, tmp_path):
    d = np.datetime64(Q3_DATE, "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"], pa.string()),
        "c_nationkey": pa.array([0, 0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0, 0.0]),
        "c_mktsegment": pa.array(
            [Q3_SEGMENT, "MACHINERY", Q3_SEGMENT], pa.string())})
    # order 10: in-segment, placed before the date -> qualifies
    # order 11: wrong segment; order 12: placed ON the date (< strict)
    # order 13: in-segment, same revenue as 10 -> tie broken by key
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 3], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_totalprice": pa.array([0.0] * 4),
        "o_orderdate": pa.array([d - day, d - day, d, d - day],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 4, pa.string())})
    # two lines for order 10 (revenue sums), one shipped ON the date
    # (> strict: excluded), identical single line for 13 (the tie)
    li = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 11, 12, 13], pa.int64()),
        "l_partkey": pa.array([0] * 6, pa.int64()),
        "l_suppkey": pa.array([0] * 6, pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 6),
        "l_extendedprice": pa.array(
            [100.0, 50.5, 7.0, 999.0, 999.0, 140.5]),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0] * 6),
        "l_returnflag": pa.array(["N"] * 6, pa.string()),
        "l_linestatus": pa.array(["O"] * 6, pa.string()),
        "l_shipdate": pa.array(
            [d + day, d + day, d, d + day, d + day, d + day],
            pa.timestamp("us"))})
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")

    got = orders_revenue_topk(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(orders_revenue_topk_sql()).df()
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))

    # only 10 and 13 qualify; line 3 of order 10 excluded by shipdate;
    # both revenues are exactly 140.5 (100·0.9 + 50.5 = 140.5·1.0), so
    # the EQUAL-revenue tie breaks on the smaller order key
    assert list(got["o_orderkey"]) == [10, 13]
    assert list(got["revenue"]) == [140.5, 140.5]
