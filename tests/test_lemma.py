"""Lemmatization engine (kgref.lemma — the Annotator+/SIFR lemma mode,
SURVEY §2.10 fourth recognizer): rule pins, inflection matching with
original-text offsets, the superset-of-exact property, the two-terms-
one-span collapse, irregular-term delegation, and Python↔DuckDB rule
agreement (the basis of the annotate_lemma oracle gate)."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from kgref.lemma import LemmaTermScanner, lemma_key, lemma_sql_expr, lemma_token
from kgref.matcher import TermDictionary


def test_lemma_token_rules():
    assert lemma_token("STUDIES") == "STUDY"
    assert lemma_token("BOXES") == "BOX"
    assert lemma_token("PATCHES") == "PATCH"
    assert lemma_token("BRUSHES") == "BRUSH"
    assert lemma_token("BUZZES") == "BUZZ"
    assert lemma_token("ANALYSES") == "ANALYS"  # over-stem, consistent
    assert lemma_token("ATTACKS") == "ATTACK"
    assert lemma_token("COLUMNS") == "COLUMN"
    # protected suffixes and short tokens stay put
    assert lemma_token("CLASS") == "CLASS"    # SS
    assert lemma_token("VIRUS") == "VIRUS"    # US
    assert lemma_token("DIAGNOSIS") == "DIAGNOSIS"  # IS
    assert lemma_token("GAS") == "GAS"        # len 3 < 4
    assert lemma_token("IES") == "IES"        # len 3 < 5
    assert lemma_token("7S") == "7S"
    assert lemma_token("DATA") == "DATA"      # no rule fires


def test_inflected_text_matches_base_term():
    sc = LemmaTermScanner({"HEART ATTACK": 1, "COLUMN": 2})
    text = "TWO HEART ATTACKS PER COLUMNS"
    got = {(m.term_id, m.start0, m.end0) for m in sc.match(text)}
    # offsets cover the INFLECTED original span
    assert (1, 4, 17) in got      # "HEART ATTACKS"
    assert (2, 22, 29) in got     # "COLUMNS"


def test_base_text_matches_inflected_term():
    sc = LemmaTermScanner({"STUDIES": 9})
    got = {(m.term_id, m.start0, m.end0) for m in sc.match("ONE STUDY")}
    assert got == {(9, 4, 9)}


def test_two_terms_collapse_to_one_span():
    sc = LemmaTermScanner({"ATTACK": 1, "ATTACKS": 2})
    got = sorted((m.term_id, m.start0, m.end0)
                 for m in sc.match("ATTACKS"))
    assert got == [(1, 0, 7), (2, 0, 7)]


def test_separator_insensitive_multitoken():
    sc = LemmaTermScanner({"HEART ATTACK": 1})
    got = {(m.term_id, m.start0, m.end0) for m in sc.match("HEART-ATTACK")}
    assert got == {(1, 0, 12)}  # more lenient than exact, by design


def test_irregular_terms_match_exactly():
    sc = LemmaTermScanner({"C++": 1, "DATA": 2})
    got = {(m.term_id, m.start0, m.end0) for m in sc.match("USE C++ DATA")}
    assert (1, 4, 7) in got
    assert (2, 8, 12) in got
    # no lemma leniency for the irregular term
    assert not {(m.term_id,) for m in sc.match("C+")}


_WORDS = ["DATA", "DATAS", "STUDY", "STUDIES", "ATTACK", "ATTACKS",
          "CLASS", "BOX", "BOXES", "X1", "A_B", "42", "QQQ"]


@st.composite
def _terms(draw):
    n = draw(st.integers(1, 6))
    out = {}
    for i in range(n):
        k = draw(st.integers(1, 2))
        out[" ".join(draw(st.sampled_from(_WORDS))
                     for _ in range(k))] = 100 + i
    return out


@st.composite
def _text(draw):
    n = draw(st.integers(0, 20))
    seps = [" ", " ", ".", ", ", "-"]
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(_WORDS)))
        parts.append(draw(st.sampled_from(seps)))
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(_terms(), _text())
def test_lemma_matches_superset_of_exact(terms, utext):
    """Every exact whole-word match is also a lemma match at the same
    span with the same term id (equal strings have equal lemma keys),
    so switching an existing pipeline to the lemma engine can only ADD
    annotations — the property that makes the mode safe to adopt."""
    exact = {(m.term_id, m.start0, m.end0)
             for m in TermDictionary(terms).match(utext)}
    lemma = {(m.term_id, m.start0, m.end0)
             for m in LemmaTermScanner(terms).match(utext)}
    assert exact <= lemma


def test_lemma_sql_expr_agrees_with_python():
    toks = [w.lower() for w in _WORDS] + [
        "studies", "patches", "brushes", "buzzes", "analyses", "virus",
        "diagnosis", "gas", "ies", "s", "ss", "xes", "7s", "classes",
        "columns", "series", "lenses", "bus", "基s"]
    con = duckdb.connect()
    got = [r[0] for r in con.execute(
        "SELECT " + lemma_sql_expr("x") + " FROM (SELECT unnest(?) AS x)",
        [toks]).fetchall()]
    want = [lemma_token(t.upper()).lower() for t in toks]
    assert got == want


def test_lemma_key_joins_tokens():
    assert lemma_key("HEART ATTACKS") == "HEART ATTACK"
    assert lemma_key("HEART-ATTACKS") == "HEART ATTACK"
    assert lemma_key("") == ""
