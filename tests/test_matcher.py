"""Unit + property tests for the matcher core (SURVEY.md §5 rebuild plan #3).

The whole-word token-window matcher and the Aho–Corasick subword matcher
are each compared against the independent brute-force oracle
(kgref.oracle._find_all) on random texts — this is where mgrep parity
(1-based inclusive offsets, boundary semantics) is pinned.
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from kgref.matcher import RawMatch, TermDictionary, longest_only_filter, raw_filter
from kgref.oracle import _find_all

WORDS = ["DATA", "HUMAN", "AGGREGATE", "DNA", "GENOME", "X1", "A_B", "42"]


def brute_matches(utext, terms, whole_word):
    out = set()
    for term, tid in terms.items():
        for s, e in _find_all(utext, term, whole_word):
            out.add((tid, s, e))
    return out


def test_simple_whole_word():
    td = TermDictionary({"HUMAN DATA": 1, "AGGREGATE HUMAN DATA": 2, "DNA": 3})
    ms = {(m.term_id, m.start0, m.end0) for m in td.match("SEE AGGREGATE HUMAN DATA NOW")}
    assert (2, 4, 24) in ms
    assert (1, 14, 24) in ms  # nested term also matches (no longest_only)
    assert not any(t == 3 for t, _, _ in ms)


def test_offsets_are_1based_inclusive_convention():
    td = TermDictionary({"DNA": 7})
    (m,) = td.match("DNA SAMPLE")
    # reference/mgrep: from=1, to=3 over 1-based inclusive
    assert (m.start0 + 1, m.end0) == (1, 3)


def test_boundary_blocks_subtoken_match():
    td = TermDictionary({"DNA": 1})
    assert td.match("XDNAX") == []
    assert td.match("XDNAX", whole_word_only=False) == [RawMatch(1, 1, 4)]


def test_punctuation_is_boundary():
    td = TermDictionary({"DNA": 1, "HUMAN DATA": 2})
    ms = td.match("DNA, (DNA) AGGREGATE. HUMAN DATA.")
    spans = {(m.term_id, m.start0, m.end0) for m in ms}
    assert (1, 0, 3) in spans and (1, 6, 9) in spans
    assert (2, 22, 32) in spans
    # split phrase: "AGGREGATE. HUMAN DATA" must not match a 3-word term
    td2 = TermDictionary({"AGGREGATE HUMAN DATA": 3})
    assert td2.match("AGGREGATE. HUMAN DATA.") == []


def test_multitoken_with_inner_punct():
    td = TermDictionary({"IL-2": 1})
    assert {(m.start0, m.end0) for m in td.match("GIVE IL-2 TODAY")} == {(5, 9)}
    assert td.match("GIVE IL - 2 TODAY") == []  # exact substring only


def test_longest_only_containment():
    ms = [RawMatch(1, 14, 24), RawMatch(2, 4, 24), RawMatch(3, 14, 24), RawMatch(4, 0, 2)]
    kept = {(m.term_id) for m in longest_only_filter(ms)}
    assert kept == {2, 4}  # both nested (14,24) spans dropped, equal spans survive


def test_longest_only_equal_spans_survive():
    ms = [RawMatch(1, 0, 5), RawMatch(2, 0, 5)]
    assert len(longest_only_filter(ms)) == 2


def test_raw_filters():
    utext = "DNA 42 DATA GENOME"
    ms = [RawMatch(1, 0, 3), RawMatch(2, 4, 6), RawMatch(3, 7, 11), RawMatch(4, 12, 18)]
    out = raw_filter(ms, utext, min_term_size=4, stop_set=frozenset({"DATA"}),
                     exclude_numbers=True)
    assert [m.term_id for m in out] == [4]
    # filters independent
    assert [m.term_id for m in raw_filter(ms, utext, min_term_size=4)] == [3, 4]
    assert [m.term_id for m in raw_filter(ms, utext, exclude_numbers=True)] == [1, 3, 4]
    assert [m.term_id for m in raw_filter(ms, utext, stop_set=frozenset({"DATA"}))] == [1, 2, 4]


@st.composite
def term_set(draw):
    n = draw(st.integers(1, 8))
    terms = {}
    for i in range(n):
        k = draw(st.integers(1, 3))
        t = " ".join(draw(st.sampled_from(WORDS)) for _ in range(k))
        terms[t] = len(terms)
    return terms


@st.composite
def text_from_words(draw):
    n = draw(st.integers(0, 30))
    seps = [" ", " ", ".", ", ", "  ", "-"]
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(WORDS + ["QQQ", "ZZ", "7"])))
        parts.append(draw(st.sampled_from(seps)))
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(term_set(), text_from_words())
def test_whole_word_matches_oracle(terms, utext):
    td = TermDictionary(terms)
    got = {(m.term_id, m.start0, m.end0) for m in td.match(utext)}
    assert got == brute_matches(utext, terms, whole_word=True)


@settings(max_examples=300, deadline=None)
@given(term_set(), text_from_words())
def test_subword_matches_oracle(terms, utext):
    td = TermDictionary(terms)
    got = {(m.term_id, m.start0, m.end0) for m in td.match(utext, whole_word_only=False)}
    assert got == brute_matches(utext, terms, whole_word=False)


def test_random_stress_vs_oracle():
    rng = random.Random(7)
    alpha = "AB C.D"
    for _ in range(200):
        terms = {}
        for i in range(rng.randint(1, 10)):
            t = "".join(rng.choice("ABCD") for _ in range(rng.randint(1, 4)))
            terms.setdefault(t, len(terms))
        utext = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        td = TermDictionary(terms)
        got_ww = {(m.term_id, m.start0, m.end0) for m in td.match(utext)}
        assert got_ww == brute_matches(utext, terms, True)
        got_sw = {(m.term_id, m.start0, m.end0) for m in td.match(utext, False)}
        assert got_sw == brute_matches(utext, terms, False)


def test_irregular_edge_terms_match_oracle_semantics():
    """Terms whose first/last char is NOT a word char (C++-style) carry
    no boundary requirement on that edge (oracle/mgrep semantics)."""
    from kgref.oracle import _find_all

    terms = {"C++": 1, "+5": 2, "ABC.": 3, "-HASH": 4, "NORMAL": 5}
    td = TermDictionary(terms)
    for utext in ["USE C++ NOW", "AC++B", "GET +5 OR A+5B", "ABC.DEF",
                  "X-HASH Y", "NORMAL-HASH", "SAY ABC. NORMAL C++"]:
        got = {(m.start0, m.end0, m.term_id)
               for m in td.match(utext, whole_word_only=True)}
        want = {(s, e, tid) for t, tid in terms.items()
                for s, e in _find_all(utext, t, True)}
        assert got == want, (utext, got, want)


def test_fold_upper_is_length_preserving():
    from kgref.matcher import fold_upper

    assert fold_upper("hash join") == "HASH JOIN"  # ASCII fast path
    for s in ["straße", "ﬁle", "café au lait", "ǌob"]:
        f = fold_upper(s)
        assert len(f) == len(s), (s, f)
    assert fold_upper("straße") == "STRAßE"   # 'ß'.upper() expands → kept
    assert fold_upper("café") == "CAFÉ"       # 1:1 maps still fold


def test_non_ascii_term_matches_with_code_point_offsets():
    """Dictionary and text share fold_upper, so accented surfaces match
    and offsets stay code-point positions into the original text."""
    from kgref.matcher import TermDictionary, fold_upper

    td = TermDictionary({fold_upper("café"): 1, fold_upper("straße"): 2})
    text = "un café à straße"
    ms = sorted(td.match(fold_upper(text)), key=lambda m: m.start0)
    assert [(m.term_id, m.start0, m.end0) for m in ms] == [
        (1, 3, 7), (2, 10, 16)]
    assert text[3:7] == "café" and text[10:16] == "straße"


@settings(max_examples=300, deadline=None)
@given(term_set(), text_from_words())
def test_regex_engine_equals_index_engine(terms, utext):
    """Recognizer-engine equivalence property: the per-length-lookahead
    regex scanner and the token-window/AC index must produce identical
    raw match sets on arbitrary dictionaries and texts, in both
    whole-word and subword modes."""
    from kgref.matcher import RegexTermScanner

    td = TermDictionary(terms)
    rx = RegexTermScanner(terms)
    for ww in (True, False):
        a = {(m.term_id, m.start0, m.end0) for m in td.match(utext, ww)}
        b = {(m.term_id, m.start0, m.end0) for m in rx.match(utext, ww)}
        assert a == b, (ww, sorted(a ^ b))
