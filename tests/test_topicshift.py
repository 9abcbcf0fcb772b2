"""Topic-shift kernel (kgref.ops.topicshift): Jaccard arithmetic on
hand-computed token sets, conv-boundary exclusion, duplicate-token
de-weighting, and the later-turn credit convention."""

import pandas as pd

from kgref.ops.topicshift import shift_kernel


def _df(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def test_jaccard_exact_values():
    # a0 {x,y}, a1 {y,z}: inter 1, union 3 -> 3333
    # a2 {y,z}: vs a1 identical -> 10000
    got = shift_kernel(_df([("a", 0, "x y"), ("a", 1, "y z"),
                            ("a", 2, "z y")]))
    assert list(got["turn_idx"]) == [1, 2]
    assert list(got["jac4"]) == [3333, 10000]
    assert list(got["is_shift"]) == [False, False]


def test_disjoint_turns_flag_a_shift():
    got = shift_kernel(_df([("a", 0, "x y"), ("a", 1, "p q")]))
    assert list(got["jac4"]) == [0]
    assert list(got["is_shift"]) == [True]


def test_duplicate_tokens_count_once():
    # {x} vs {x}: sets, not multisets -> 10000
    got = shift_kernel(_df([("a", 0, "x x x"), ("a", 1, "x")]))
    assert list(got["jac4"]) == [10000]


def test_conv_boundary_and_turn_gap_excluded():
    got = shift_kernel(_df([("a", 0, "x"), ("b", 0, "x"),  # conv change
                            ("b", 2, "x")]))              # gap: 0 -> 2
    assert len(got) == 0


def test_input_order_independent():
    got = shift_kernel(_df([("a", 1, "y z"), ("a", 0, "x y")]))
    assert list(got["turn_idx"]) == [1]
    assert list(got["jac4"]) == [3333]
