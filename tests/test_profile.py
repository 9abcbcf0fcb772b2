"""profile_documents (kgref.ops.profile): ANALYZE-style per-column
stats — exact distinct across batch boundaries, null counting, numeric
vs lexicographic min/max — against the DuckDB twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.profile import profile_documents, profile_documents_sql


def test_profile_matches_oracle_with_nulls_and_dups(ray_session, tmp_path):
    n = 300
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["t"] * n, pa.string()),
        # 3 distinct langs, one null every 7 rows
        "lang": pa.array([None if i % 7 == 0 else ["en", "de", "fr"][i % 3]
                          for i in range(n)], pa.string()),
        "source": pa.array([f"s{i % 5}" for i in range(n)], pa.string()),
        # numeric min/max must be NUMERIC: 9 < 100 despite "9" > "100"
        "n_chars": pa.array([9 if i == 0 else 100 + (i % 4)
                             for i in range(n)], pa.int64())})
    pq.write_table(tbl, tmp_path / "documents.parquet",
                   row_group_size=64)  # force multi-batch partials

    got = (profile_documents(str(tmp_path)).to_pandas()
           .sort_values("column").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(profile_documents_sql()).df()
            .sort_values("column").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))

    row = got.set_index("column")
    assert row.loc["doc_id", "n_distinct"] == n
    assert row.loc["lang", "n_null"] == len(range(0, n, 7))
    assert row.loc["lang", "n_distinct"] == 3  # nulls not distinct values
    assert (row.loc["n_chars", "min_v"], row.loc["n_chars", "max_v"]) == \
        ("9", "103")  # numeric compare, rendered as strings after
    assert row.loc["source", "n_distinct"] == 5
