"""conv_related / class_drift (kgref.ops.linking) and bpe_pair_counts
(kgref.ops.vocab): crafted corpora forcing the df filter, the
min_shared threshold, cross-partition pair accumulation, the drift
halves, and the word-boundary masking in the BPE pair kernel."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.linking import (class_drift, class_drift_sql, conv_related,
                               conv_related_sql, related_kernel)
from kgref.ops.vocab import bpe_pair_counts, bpe_pair_counts_sql


def _write_docs(tmp_path, texts):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    return con.execute(sql).df()


def test_related_kernel_pairs_and_df_filter():
    # class 0 in convs {1,2,3}, class 1 in convs {2,3}, class 2 in
    # conv {5} only (df 1 -> dropped), class 3 in convs 0..4 with
    # max_conv_df=4 -> df 5 exceeds the cap, dropped as a stop-entity.
    rows = ([("c0", c) for c in (1, 2, 3)] + [("c1", c) for c in (2, 3)]
            + [("c2", 5)] + [("c3", c) for c in range(5)])
    df = pd.DataFrame(rows, columns=["obj", "conv"])
    got = (related_kernel(df, min_shared=1, max_conv_df=4)
           .sort_values(["conv_a", "conv_b"]).reset_index(drop=True))
    # c0 pairs: (1,2),(1,3),(2,3); c1 pairs: (2,3) -> (2,3) counts 2
    want = pd.DataFrame({"conv_a": [1, 1, 2], "conv_b": [2, 3, 3],
                         "n": [1, 1, 2]})
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_related_kernel_dedups_before_pairing():
    # duplicate (obj, conv) rows (multiple mentions) must count once
    df = pd.DataFrame([("c0", 1)] * 3 + [("c0", 2)] * 2,
                      columns=["obj", "conv"])
    got = related_kernel(df, min_shared=1, max_conv_df=10)
    assert got.to_dict("list") == {"conv_a": [1], "conv_b": [2], "n": [1]}


def test_conv_related_matches_oracle_and_threshold(ray_session, tmp_path):
    # conv-0 and conv-1 share {scan, join}; conv-2 shares only {scan}
    # with each -> min_shared=2 keeps exactly the (0, 1) pair.
    texts = ["padding words only"] * 48
    texts[0], texts[3] = "scan here", "join there"            # conv-0
    texts[16], texts[20] = "a scan too", "the join again"     # conv-1
    texts[33] = "scan alone"                                  # conv-2
    _write_docs(tmp_path, texts)
    got = (conv_related(str(tmp_path)).to_pandas()
           .sort_values(["conv_a", "conv_b"]).reset_index(drop=True))
    want = (_oracle(tmp_path, conv_related_sql())
            .sort_values(["conv_a", "conv_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))
    assert got[["conv_a", "conv_b"]].values.tolist() == [[0, 1]]
    assert int(got["n_shared"].iloc[0]) == 2


def test_conv_related_drops_stop_entities(ray_session, tmp_path):
    # one class spread over 41 conversations (df 41 > max_conv_df 40)
    # contributes nothing; without the filter it alone would link
    # C(41,2) = 820 pairs.
    texts = ["filler text"] * (41 * 16)
    for c in range(41):
        texts[c * 16] = "scan appears everywhere"
    _write_docs(tmp_path, texts)
    got = conv_related(str(tmp_path)).to_pandas()
    assert len(got) == 0
    want = _oracle(tmp_path, conv_related_sql())
    assert len(want) == 0


def test_class_drift_matches_oracle_and_halves(ray_session, tmp_path):
    # scan: 2 mentions in even conv-0, 1 in odd conv-1 -> share 333333
    texts = ["padding words only"] * 32
    texts[0] = "scan and scan"          # conv-0 (even)
    texts[17] = "one scan"              # conv-1 (odd)
    _write_docs(tmp_path, texts)
    got = (class_drift(str(tmp_path)).to_pandas()
           .sort_values("class_uri").reset_index(drop=True))
    want = (_oracle(tmp_path, class_drift_sql())
            .sort_values("class_uri").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))
    scan = got[got["class_uri"].str.endswith("#Scan")].iloc[0]
    assert (scan["n_a"], scan["n_b"]) == (2, 1)
    assert scan["share_b_ppm"] == 1_000_000 // 3


def test_bpe_pair_counts_matches_oracle(ray_session, tmp_path):
    # "abab" x3 -> ab:9(2 per word... ab appears at pos 1,3 = 2x3=6),
    # exact weighting and boundary masking checked against the twin
    _write_docs(tmp_path, ["abab abab cd", "abab x cd cd", "ab"])
    got = (bpe_pair_counts(str(tmp_path)).to_pandas()
           .reset_index(drop=True))
    want = _oracle(tmp_path, bpe_pair_counts_sql()).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))
    top = dict(zip(got["pair"], got["n_total"]))
    assert top["ab"] == 2 * 3 + 1   # two per "abab" (x3) + one "ab"
    assert top["ba"] == 1 * 3       # one per "abab" (x3)
    assert top["cd"] == 3           # three "cd" words
    assert "x" not in top           # single-char words filtered


def test_bpe_pair_kernel_no_cross_word_pairs(ray_session, tmp_path):
    # boundary mask: "ab ba" must NOT produce the pair "bb" (b|b across
    # the word gap) nor "ab"+"ba" fusions beyond in-word pairs
    _write_docs(tmp_path, ["ab ba"])
    got = bpe_pair_counts(str(tmp_path)).to_pandas()
    assert sorted(got["pair"]) == ["ab", "ba"]
    assert list(got["n_total"]) == [1, 1]
