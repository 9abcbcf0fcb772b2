"""kg_random_walks (kgref.ops.walks): step-kernel determinism and
neighbor selection, plus end-to-end structural checks (every hop is a
real edge, walk counts, seed layout) against the DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.sampling import splitmix64
from kgref.ops.walks import (WALK_LEN, WALKS_PER_NODE, _SALT,
                             kg_random_walks, kg_random_walks_sql,
                             step_kernel, walk_skipgrams,
                             walk_skipgrams_sql)


def _union(edges, frontier):
    rows = [{"v": a, "nb": b, "walk_id": -1} for a, b in edges]
    rows += [{"v": v, "nb": -1, "walk_id": w} for w, v in frontier]
    return pd.DataFrame(rows)


def test_step_kernel_picks_hashed_neighbor():
    # node 0 has sorted neighbors [3, 7]; walk 5 at step 2 must take
    # neighbor index splitmix64(5*SALT + 2) % 2
    df = _union([(0, 7), (0, 3)], [(5, 0)])
    got = step_kernel(df, step=2, salt=_SALT)
    idx = int(splitmix64(np.array([5 * _SALT + 2], np.uint64))[0] % 2)
    assert got.to_dict("list") == {"walk_id": [5], "cur": [[3, 7][idx]]}


def test_step_kernel_single_neighbor_is_forced():
    got = step_kernel(_union([(4, 9)], [(1, 4), (2, 4)]), 1, _SALT)
    assert sorted(got["cur"]) == [9, 9]


def test_step_kernel_empty_frontier():
    got = step_kernel(_union([(0, 1)], []), 1, _SALT)
    assert len(got) == 0 and list(got.columns) == ["walk_id", "cur"]


def test_kg_random_walks_matches_oracle_and_structure(
        ray_session, tmp_path):
    # corpus where scan/join/index co-occur in different turn subsets
    texts = ["padding words only"] * 32
    texts[0] = "scan join here"            # edge scan-join (conv-0)
    texts[3] = "join sort there"           # edge join-sort
    texts[17] = "scan sort again"          # edge scan-sort (conv-1)
    tbl = pa.table({"doc_id": pa.array(range(32), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (kg_random_walks(str(tmp_path)).to_pandas()
           .sort_values(["walk_id", "step"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(kg_random_walks_sql()).df()
            .sort_values(["walk_id", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))

    n_nodes = got["class_uri"].nunique()
    assert n_nodes == 3
    assert len(got) == n_nodes * WALKS_PER_NODE * (WALK_LEN + 1)
    # every consecutive (step, step+1) pair is a real co-occurrence edge
    edges = {("#Join", "#Sort"), ("#Join", "#Scan"), ("#Scan", "#Sort")}
    frag = got["class_uri"].str.extract(r"(#\w+)$")[0]
    for w, grp in got.assign(frag=frag).groupby("walk_id"):
        seq = list(grp.sort_values("step")["frag"])
        assert len(seq) == WALK_LEN + 1
        for x, y in zip(seq, seq[1:]):
            assert x != y and tuple(sorted((x, y))) in edges
    # seeds: walk w starts at node w // WALKS_PER_NODE
    uris = sorted(got["class_uri"].unique())
    seeds = got[got["step"] == 0].sort_values("walk_id")
    assert list(seeds["class_uri"]) == [
        uris[w // WALKS_PER_NODE] for w in seeds["walk_id"]]

    # skip-grams from the same corpus: symmetric, window-bounded, and
    # the total equals the closed form 2·Σ_d (L+1-d) pairs per walk
    sg = (walk_skipgrams(str(tmp_path)).to_pandas()
          .sort_values(["center_uri", "context_uri"])
          .reset_index(drop=True))
    want_sg = (con.execute(walk_skipgrams_sql()).df()
               .sort_values(["center_uri", "context_uri"])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        sg[want_sg.columns],
        want_sg.astype(sg[want_sg.columns].dtypes.to_dict()))
    n_walks = got["walk_id"].nunique()
    per_walk = 2 * sum(WALK_LEN + 1 - d for d in (1, 2))
    assert int(sg["n"].sum()) == n_walks * per_walk
    m = sg.set_index(["center_uri", "context_uri"])["n"]
    assert all(m[(a, b)] == m[(b, a)] for a, b in m.index)  # symmetric
