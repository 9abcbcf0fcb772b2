"""Dialogue ops (kgref.ops.dialogue): pair adjacency must respect
conversation boundaries and missing successors; the context-window
searchsorted kernel must handle over-budget single turns, full-prefix
windows, and multi-conversation buckets."""

import pandas as pd

from kgref.ops.dialogue import pairs_kernel, windows_kernel


def _df(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def test_pairs_skip_conv_boundary_and_missing_successor():
    df = _df([
        ("a", 0, "p0"), ("a", 1, "r1"),          # pair
        ("a", 3, "p3"),                           # user, successor missing
        ("b", 1, "x"),                            # assistant w/o prompt
        ("c", 0, "pc"),                           # user, conv ends
        ("d", 0, "pd"), ("d", 1, "rd"), ("d", 2, "t"), ("d", 3, "p3d"),
        ("d", 4, "r4d"),                          # second pair in d
    ])
    got = pairs_kernel(df)
    assert list(zip(got["conv_id"], got["turn_idx"])) == [
        ("a", 0), ("d", 0), ("d", 3)]
    assert list(got["response"]) == ["r1", "rd", "r4d"]


def test_pairs_ignore_input_row_order():
    df = _df([("a", 1, "r1"), ("a", 0, "p0")])
    got = pairs_kernel(df)
    assert list(got["prompt"]) == ["p0"]
    assert list(got["response"]) == ["r1"]


def test_windows_suffix_budget():
    # conv 'a': lens 4, 10, 3 with budget 12:
    #   turn0: no prior -> 0/0; turn1: prior 4 <= 12 -> 1/4
    #   turn2: prior suffixes: 10<=12 yes, 4+10=14 no -> 1/10
    df = _df([("a", 0, "xxxx"), ("a", 1, "y" * 10), ("a", 2, "zzz"),
              ("b", 0, "w" * 50), ("b", 1, "v")])
    got = windows_kernel(df, 12)
    assert list(got["n_ctx"]) == [0, 1, 1, 0, 0]  # b1: prior is 50 > budget
    assert list(got["ctx_chars"]) == [0, 4, 10, 0, 0]


def test_windows_full_prefix_and_cross_conv_isolation():
    df = _df([("a", 0, "aa"), ("a", 1, "bb"), ("a", 2, "cc"),
              ("b", 0, "dd")])
    got = windows_kernel(df, 1000)
    assert list(got["n_ctx"]) == [0, 1, 2, 0]  # b never sees a's turns
    assert list(got["ctx_chars"]) == [0, 2, 4, 0]


def test_windows_exact_boundary_is_inclusive():
    df = _df([("a", 0, "xxxx"), ("a", 1, "yy")])
    got = windows_kernel(df, 4)  # prior turn exactly == budget
    assert list(got["n_ctx"]) == [0, 1]
    assert list(got["ctx_chars"]) == [0, 4]
