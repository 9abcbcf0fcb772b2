"""Span-level duplicate detection (kgref.ops.dupspans): the Arrow gram
kernel's offsets and doc-boundary exclusion, the coverage interval-union
formula, and short-document edge cases."""

import numpy as np
import pyarrow as pa

from kgref.ops.dupspans import _gram_arrays


def _table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": texts})


def test_gram_offsets_single_doc():
    doc, p, f, t, g = _gram_arrays(_table(["aa bb cc dd"]), 2)
    assert g.to_pylist() == ["aa bb", "bb cc", "cc dd"]
    assert p.to_pylist() == [1, 2, 3]
    assert f.to_pylist() == [1, 4, 7]
    assert t.to_pylist() == [5, 8, 11]  # from + len - 1


def test_windows_never_cross_doc_boundary():
    doc, p, f, t, g = _gram_arrays(_table(["aa bb", "cc dd"]), 2)
    assert g.to_pylist() == ["aa bb", "cc dd"]
    assert doc.to_pylist() == [0, 1]
    assert p.to_pylist() == [1, 1]
    assert f.to_pylist() == [1, 1]


def test_short_docs_yield_nothing():
    doc, p, f, t, g = _gram_arrays(_table(["aa", "bb cc"]), 3)
    assert len(g) == 0
    # batch entirely below n
    doc, p, f, t, g = _gram_arrays(_table(["aa"]), 3)
    assert len(g) == 0


def test_variable_token_lengths():
    doc, p, f, t, g = _gram_arrays(_table(["x yyy zz w"]), 3)
    assert g.to_pylist() == ["x yyy zz", "yyy zz w"]
    assert f.to_pylist() == [1, 3]
    assert t.to_pylist() == [8, 10]


def test_coverage_union_formula():
    """min(n, gap) per sorted span start == |union of [p, p+n-1]|."""
    rng = np.random.default_rng(7)
    n = 4
    for _ in range(50):
        starts = np.unique(rng.integers(1, 30, size=rng.integers(1, 10)))
        exact = len({q for s in starts for q in range(s, s + n)})
        gap = np.diff(starts, prepend=starts[0] - n)
        assert int(np.minimum(n, gap).sum()) == exact
