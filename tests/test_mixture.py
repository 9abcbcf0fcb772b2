"""Token-budget mixture sampling (kgref.ops.mixture): greedy prefix-fill
semantics against a brute-force single-process recomputation."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from kgref.ops.mixture import (
    _OFF_MIX,
    DEFAULT_TOKEN_BUDGET,
    TOKEN_BUDGETS,
    splitmix64,
    token_budget_mix,
)

SF = "/root/testdata/sf0.001"


def _budget(lang: str) -> int:
    return TOKEN_BUDGETS.get(lang, DEFAULT_TOKEN_BUDGET)


def test_token_budget_mix_matches_bruteforce(ray_session):
    got = (token_budget_mix(SF).to_pandas()
           .sort_values(["lang", "cum_before"]).reset_index(drop=True))

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"]).to_pandas()
    t["n_tokens"] = t["text"].str.split(" ").str.len()
    t["h"] = splitmix64(
        t["doc_id"].to_numpy(np.uint64) + np.uint64(_OFF_MIX))
    t = t.sort_values(["lang", "h", "doc_id"])
    t["cum_before"] = (t.groupby("lang")["n_tokens"].cumsum()
                       - t["n_tokens"])
    want = (t[t["cum_before"] < t["lang"].map(_budget)]
            [["doc_id", "lang", "n_tokens", "cum_before"]]
            .sort_values(["lang", "cum_before"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # greedy-fill invariants: per lang the kept prefix is contiguous
    # (cum_before of the k-th kept doc == sum of the earlier kept ones)
    # and the fill stops only once the budget is reached
    for lang, g in got.groupby("lang"):
        g = g.sort_values("cum_before")
        expect = np.concatenate([[0], g["n_tokens"].cumsum().to_numpy()[:-1]])
        assert (g["cum_before"].to_numpy() == expect).all()
        assert g["cum_before"].iloc[-1] < _budget(lang)
        # every language in this fixture saturates its budget
        assert g["cum_before"].iloc[-1] + g["n_tokens"].iloc[-1] \
            >= _budget(lang)


def test_curriculum_order_is_quality_descending_permutation(ray_session):
    """pos must be a global 0..n-1 permutation, bucket-monotone
    (non-increasing as pos grows) and hash-shuffled within buckets."""
    from kgref.ops.mixture import curriculum_order

    got = (curriculum_order(SF).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    assert sorted(got["pos"]) == list(range(len(got)))
    b = got["bucket"].to_numpy()
    assert (b[1:] <= b[:-1]).all()  # easy (high quality) first
    assert got["doc_id"].nunique() == len(got)
    assert b.min() >= 0 and b.max() <= 9 and len(set(b)) > 1
