"""surprisal_filter: two-level radix selection vs a driver-side sort,
plus tie closure at the threshold."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_surprisal_filter_matches_sorted_selection(ray_session):
    from kgref.ops.lm import lm_surprisal
    from kgref.ops.selection import PCT_DEN, PCT_NUM, surprisal_filter

    s = lm_surprisal(SF).to_pandas()
    v = (s["surprisal"] // s["n_tokens"]).to_numpy(np.int64)
    k = -((-PCT_NUM * len(v)) // PCT_DEN)
    thr = np.sort(v)[k - 1]
    want = set(s["doc_id"][v <= thr])
    got = surprisal_filter(SF).to_pandas()
    assert set(got["doc_id"]) == want
    assert (got["surprisal_per_tok"] <= thr).all()
    got_v = got.set_index("doc_id")["surprisal_per_tok"]
    ref = dict(zip(s["doc_id"], v))
    assert all(got_v[d] == ref[d] for d in got_v.index)


def test_surprisal_filter_keeps_all_ties_at_threshold(ray_session, tmp_path):
    """6 identical docs + 2 rarer ones, N=8 → k=6: the 6th smallest IS
    the duplicated value, so the kept set must close over all 6 ties
    and exclude both above-threshold docs."""
    from kgref.ops.selection import surprisal_filter

    common = "a a a a a a a a"      # every token count 48 → tiny weight
    rare = "unique_one unique_two"  # count-1 tokens → huge weight
    tbl = pa.table({
        "doc_id": pa.array(list(range(1, 9)), pa.int64()),
        "text": pa.array([common] * 6 + [rare, "solo_tok solo_tok2"],
                         pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = surprisal_filter(str(tmp_path)).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2, 3, 4, 5, 6]
    assert got["surprisal_per_tok"].nunique() == 1
