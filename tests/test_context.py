"""ConText clinical-context flags (kgref.ops.context — the
Annotator+/SIFR negation / experiencer / temporality feature, Harkema
et al. 2009 subset): window boundary, scope-terminator blocking,
cross-row isolation on the global axis, category independence, the
recognizer-wrapper schema, and Python↔DuckDB spec agreement (the basis
of the clinical_context oracle gate)."""

import duckdb
import numpy as np
import pyarrow as pa

from kgref import docdict
from kgref.ops.context import (SCOPE_WINDOW, ContextAnnotateTriples,
                               compute_context_flags,
                               context_flag_exprs_sql)


def _flags(texts, rows, froms):
    neg, exp_, tmp = compute_context_flags(
        texts, np.array(rows, np.int64), np.array(froms, np.int64))
    return neg, exp_, tmp


def test_negation_within_window():
    # "no alpha beta" — match on "alpha" (from_1b=4) and "beta" (from_1b=10)
    neg, exp_, tmp = _flags(["no alpha beta"], [0, 0], [4, 10])
    assert list(neg) == [True, True]
    assert not exp_.any() and not tmp.any()


def test_window_boundary_exact():
    # trigger at token 1; tokens 2..8 are a b c d e f g; window = 5
    text = "no a b c d e f g"
    # token k (1-based) starts at char 4 + 2*(k-2) for k >= 2
    froms = [4 + 2 * (k - 2) for k in range(2, 9)]  # tokens 2..8
    neg, _, _ = _flags([text], [0] * len(froms), froms)
    # m - t <= 5 → tokens 2..6 active, 7..8 inactive
    assert list(neg) == [True, True, True, True, True, False, False]


def test_terminator_blocks_scope():
    # NOT(1) only(2) BUT(3) also(4) alpha(5): within window, blocked
    text = "not only but also alpha"
    from_alpha = len("not only but also ") + 1
    neg, _, _ = _flags([text], [0], [from_alpha])
    assert list(neg) == [False]
    # terminator BEFORE the trigger does not block
    text2 = "but not alpha"
    neg2, _, _ = _flags([text2], [0], [len("but not ") + 1])
    assert list(neg2) == [True]


def test_cross_row_isolation():
    # trigger in row 0 must not leak into row 1 (global-axis embedding)
    texts = ["no alpha", "alpha beta"]
    neg, _, _ = _flags(texts, [0, 1, 1], [4, 1, 7])
    assert list(neg) == [True, False, False]


def test_all_categories_stack():
    # mother(1) denies(2) past(3) alpha(4)
    text = "mother denies past alpha"
    f = len("mother denies past ") + 1
    neg, exp_, tmp = _flags([text], [0], [f])
    assert neg[0] and exp_[0] and tmp[0]


def test_no_triggers_all_defaults():
    neg, exp_, tmp = _flags(["alpha beta gamma"], [0, 0], [1, 7])
    assert not neg.any() and not exp_.any() and not tmp.any()


def test_case_folded_triggers():
    neg, _, _ = _flags(["No alpha"], [0], [4])
    assert list(neg) == [True]


def test_recognizer_wrapper_schema_and_values():
    eng = ContextAnnotateTriples(docdict.state())
    batch = pa.table({
        "conv_id": ["conv-0", "conv-0", "conv-1"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": ["no join here", "join table", "father denies join"],
    })
    out = eng(batch)
    for col in ("negated", "experiencer", "temporality"):
        assert col in out.column_names
    d = out.to_pydict()
    by_span = {(c, t, f): (n, e, tp) for c, t, f, n, e, tp in zip(
        d["conv_id"], d["turn_idx"], d["from_1b"], d["negated"],
        [str(x) for x in d["experiencer"]],
        [str(x) for x in d["temporality"]])}
    # "join" in turn 0 of conv-0 follows "no" → negated
    assert by_span[("conv-0", 0, 4)] == (True, "patient", "recent")
    # "join" at turn start, no triggers → all defaults
    assert by_span[("conv-0", 1, 1)] == (False, "patient", "recent")
    assert by_span[("conv-0", 1, 6)][0] is False  # "table"
    # "father denies join" → negated AND experiencer=other
    assert by_span[("conv-1", 0, 15)] == (True, "other", "recent")


def test_python_sql_spec_agreement():
    """The EXISTS-any-trigger SQL form equals the last-trigger numpy
    form on an adversarial token soup (multiple triggers, terminators
    interleaved, window edges)."""
    words = ["no", "alpha", "but", "not", "beta", "gamma", "delta",
             "never", "x", "but", "y", "z", "w", "v", "u"]
    text = " ".join(words)
    # match every token position
    starts, pos = [], 1
    for w in words:
        starts.append(pos)
        pos += len(w) + 1
    neg, _, _ = _flags([text], [0] * len(starts), starts)

    fx = context_flag_exprs_sql("r")
    con = duckdb.connect()
    rows = con.execute(f"""
WITH t AS (SELECT 0 AS doc_id, string_split('{text}', ' ') AS w),
tok AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM t),
{fx['ctes']},
r AS (SELECT doc_id, p FROM tok)
SELECT p, {fx['negated']} AS negated FROM r ORDER BY p
""").fetchall()
    sql_neg = [bool(n) for _, n in rows]
    assert sql_neg == [bool(x) for x in neg]


def test_window_constant_pinned():
    assert SCOPE_WINDOW == 5
