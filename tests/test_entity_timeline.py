"""entity_timeline (kgref.ops.kgraph): end-to-end against the DuckDB
twin on a crafted corpus where the same (conv, obj, turn) key is forced
through multiple batches/partials — distinct-turn counts and mention
totals must not double-count, and first/last turns must span the
conversation."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.kgraph import entity_timeline, entity_timeline_sql


def test_entity_timeline_matches_oracle_on_crafted_corpus(
        ray_session, tmp_path):
    # conv-0 (docs 0..15): "join" twice in turn 2, once in turn 5;
    # "scan" only in turn 0.  conv-1 (doc 16): "join" once in turn 0.
    texts = ["padding words only"] * 17
    texts[0] = "scan here"
    texts[2] = "join and join again"
    texts[5] = "one join"
    texts[16] = "join opens the next conversation"
    tbl = pa.table({"doc_id": pa.array(range(17), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (entity_timeline(str(tmp_path)).to_pandas()
           .sort_values(["conv_id", "obj"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(entity_timeline_sql()).df()
            .sort_values(["conv_id", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))

    join_uri = got[got["obj"].str.endswith("#Join")]
    c0 = join_uri[join_uri["conv_id"] == "conv-0"].iloc[0]
    assert (c0["first_turn"], c0["last_turn"]) == (2, 5)
    assert c0["n_turns"] == 2      # turns {2, 5}
    assert c0["n_mentions"] == 3   # 2 + 1
    c1 = join_uri[join_uri["conv_id"] == "conv-1"].iloc[0]
    assert (c1["first_turn"], c1["last_turn"], c1["n_turns"],
            c1["n_mentions"]) == (0, 0, 1, 1)
