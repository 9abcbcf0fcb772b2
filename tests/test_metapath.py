"""metapath_walks (kgref.ops.metapath): bipartite alternation — even
steps land on conversations, odd steps on classes, every conv→class
hop is a real annotation pair — plus oracle parity."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.metapath import (MP_LEN, WALKS_PER_CONV, metapath_walks,
                                metapath_walks_sql)


def test_metapath_walks_alternate_and_match_oracle(ray_session, tmp_path):
    texts = ["padding words only"] * 48
    texts[0] = "scan join in conv zero"
    texts[18] = "join sort in conv one"
    texts[33] = "scan sort in conv two"
    tbl = pa.table({"doc_id": pa.array(range(48), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (metapath_walks(str(tmp_path)).to_pandas()
           .sort_values(["walk_id", "step"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(metapath_walks_sql()).df()
            .sort_values(["walk_id", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))

    # 3 convs x WALKS_PER_CONV walks x (MP_LEN + 1) nodes
    assert len(got) == 3 * WALKS_PER_CONV * (MP_LEN + 1)
    is_conv = got["node"].str.startswith("conv-")
    assert (is_conv == (got["step"] % 2 == 0)).all()  # strict alternation

    # every conv→class hop is a real annotation pair of that conv
    pairs = {("conv-0", "#Join"), ("conv-0", "#Scan"),
             ("conv-1", "#Join"), ("conv-1", "#Sort"),
             ("conv-2", "#Scan"), ("conv-2", "#Sort")}
    frag = got["node"].where(is_conv, got["node"].str.extract(
        r"(#\w+)$")[0])
    for _, grp in got.assign(f=frag).groupby("walk_id"):
        seq = list(grp.sort_values("step")["f"])
        for j in range(len(seq) - 1):
            c, k = (seq[j], seq[j + 1]) if j % 2 == 0 else (seq[j + 1],
                                                            seq[j])
            assert (c, k) in pairs
