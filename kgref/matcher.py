"""Multi-term dictionary matcher — the reference's mgrep stage, in-process.

The reference ships text over TCP to a closed-source C radix-tree server
(mgrep, U. Michigan) and gets back ``id\tfrom\tto\tword`` lines with
1-based inclusive character offsets over the UPPERCASED text
(ref:lib/ncbo_annotator/mgrep/mgrep.rb Client#annotate [H]).  This module
re-implements that contract as pure Python + compiled regex so it can run
inside Ray actor-pool workers with zero network hops (SURVEY.md §2 M1–M7,
ST1).  No Ray imports here — unit-testable standalone.

Matching semantics (pinned; SURVEY.md §7 "hard parts" 1–2):

- Text and dictionary terms are uppercased with ``fold_upper`` (M1): a
  LENGTH-PRESERVING fold (expanding case maps like 'ß'→'SS' keep the
  original character) applied identically to text and dictionary, so
  non-ASCII input cannot shift offsets.  Offset convention: from/to are
  Unicode CODE POINT positions into the ORIGINAL text (1-based
  inclusive at the output layer).  Token-boundary chars remain the
  ASCII ``[A-Z0-9_]`` set — non-ASCII letters are boundary-neutral,
  matching mgrep's byte-oriented boundary behavior.
- ``whole_word_only=True`` (mgrep 'longword' flag Y, the default): a match
  must start and end on token boundaries, where tokens are maximal runs of
  ``[A-Z0-9_]``.  Implementation: token-window scan — for each token i,
  join windows of up to Lmax tokens and look the raw substring up in a
  hash index.  O(tokens × Lmax) with first-token pruning; the inner
  operations are C-speed dict/str ops, no per-character Python loop.
- ``whole_word_only=False``: matches may start/end mid-token; implemented
  with an Aho–Corasick automaton built lazily over the same terms.
- ``longest_only`` (M7): applied at raw-match level (mgrep applies its
  longword semantics before the gem's filters): a span is dropped iff it
  is contained in a strictly longer match span.  Equal spans (same span,
  several terms/classes) all survive.
- Raw-match filters (applied BEFORE term→class resolution, matching the
  reference's annotate_direct order [H]): min_term_size (M4, on matched
  string length), stop words (M5, case-insensitive on the matched
  string), exclude_numbers (M6, purely-numeric matched strings).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

TOKEN_RE = re.compile(r"[A-Z0-9_]+")
_NUMERIC_RE = re.compile(r"[0-9]+\Z")
_WORD_CHARS = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")

_FOLD_CACHE: dict[str, str] = {}


def fold_upper(text: str) -> str:
    """Length-preserving uppercase fold (offset convention: all match
    offsets are UNICODE CODE POINT positions into the ORIGINAL text).

    ``str.upper()`` is not length-preserving outside ASCII ('ß'→'SS',
    'ﬁ'→'FI'), which would shift every downstream 1-based offset.  This
    fold uppercases per code point and keeps the original character
    whenever its uppercase expands, so ``len(fold_upper(t)) == len(t)``
    always.  ASCII text (the reference corpus) takes the C fast path and
    is bit-identical to ``upper()``.  Dictionary normalization MUST use
    the same fold (see dictionary_build) so both sides agree on
    expanding characters."""
    if text.isascii():
        return text.upper()
    out = _FOLD_CACHE.get(text) if len(text) <= 64 else None
    if out is not None:
        return out
    chars = []
    for ch in text:
        up = ch.upper()
        chars.append(up if len(up) == 1 else ch)
    out = "".join(chars)
    if len(text) <= 64 and len(_FOLD_CACHE) < 100_000:
        _FOLD_CACHE[text] = out
    return out


@dataclass(frozen=True)
class RawMatch:
    """One mgrep-style match over one text. start0/end0 are 0-based
    half-open; the reference's 1-based inclusive pair is (start0+1, end0)."""

    term_id: int
    start0: int
    end0: int


class TermDictionary:
    """Dictionary of normalized terms → dense term ids (D2).

    ≙ the mgrep dictionary file ``id\tTERM`` + the radix tree the mgrep
    server builds from it (ref:lib/ncbo_annotator.rb
    generate_dictionary_file [H]).  Term ids are assigned upstream
    (deterministically: sort distinct upper(term), enumerate — A3).
    """

    def __init__(self, term_ids_by_norm: dict[str, int]):
        self.term_ids_by_norm = term_ids_by_norm
        # token-window index structures (whole-word path).  The window
        # scan can only find matches that START and END on token
        # boundaries — exactly the whole-word semantics for terms whose
        # edge chars are word chars.  Terms with a NON-word edge char
        # (e.g. "C++", "+5") have no boundary requirement on that edge
        # (mgrep/oracle semantics: the boundary check applies per edge
        # only when the term edge is a word char) and are matched by a
        # dedicated Aho–Corasick pass with per-edge checks instead.
        self._first_tokens: dict[str, int] = {}  # first token -> max #tokens
        self._max_term_len = 0
        self._irregular: dict[str, int] = {}
        word = _WORD_CHARS
        for term, tid in term_ids_by_norm.items():
            if not term:
                continue
            if term[0] not in word or term[-1] not in word:
                self._irregular[term] = tid
                continue
            toks = TOKEN_RE.findall(term)
            prev = self._first_tokens.get(toks[0], 0)
            if len(toks) > prev:
                self._first_tokens[toks[0]] = len(toks)
            if len(term) > self._max_term_len:
                self._max_term_len = len(term)
        self._ac: _AhoCorasick | None = None  # lazy (subword path only)
        self._irregular_ac: _AhoCorasick | None = None  # lazy

    @classmethod
    def from_labels_table(cls, labels: pa.Table) -> "TermDictionary":
        terms = labels.column("term_norm").to_pylist()
        ids = labels.column("term_id").to_pylist()
        return cls(dict(zip(terms, ids)))

    def __len__(self) -> int:
        return len(self.term_ids_by_norm)

    # -- whole-word matching (default; mgrep longword=Y) -------------------
    def match_whole_word(self, utext: str) -> list[RawMatch]:
        out: list[RawMatch] = []
        index = self.term_ids_by_norm
        first = self._first_tokens
        spans = [m.span() for m in TOKEN_RE.finditer(utext)]
        n = len(spans)
        max_len = self._max_term_len
        for i in range(n):
            s = spans[i][0]
            width = first.get(utext[s : spans[i][1]], 0)
            for j in range(i, min(i + width, n)):
                e = spans[j][1]
                if e - s > max_len:
                    break
                tid = index.get(utext[s:e])
                if tid is not None:
                    out.append(RawMatch(tid, s, e))
        if self._irregular:
            out.extend(self._match_irregular(utext))
        return out

    def _match_irregular(self, utext: str) -> list[RawMatch]:
        """Non-word-edged terms: AC scan + per-edge boundary checks."""
        if self._irregular_ac is None:
            self._irregular_ac = _AhoCorasick(self._irregular)
        word = _WORD_CHARS
        out = []
        for m in self._irregular_ac.search(utext):
            term = utext[m.start0 : m.end0]
            if (term[0] in word and m.start0 > 0
                    and utext[m.start0 - 1] in word):
                continue
            if (term[-1] in word and m.end0 < len(utext)
                    and utext[m.end0] in word):
                continue
            out.append(m)
        return out

    # -- sub-token matching (whole_word_only=False; mgrep longword=N) ------
    def match_subword(self, utext: str) -> list[RawMatch]:
        if self._ac is None:
            self._ac = _AhoCorasick(self.term_ids_by_norm)
        return self._ac.search(utext)

    def match(self, utext: str, whole_word_only: bool = True) -> list[RawMatch]:
        if whole_word_only:
            return self.match_whole_word(utext)
        return self.match_subword(utext)


class RegexTermScanner:
    """Second recognizer engine (SURVEY.md §2.10 plugin surface ≙ the
    reference's alternative recognizers, e.g.
    ref:lib/ncbo_annotator/recognizers/mallet.rb [M]): the same raw-match
    contract as :class:`TermDictionary` but driven by the ``re`` module
    instead of the token-window index / Aho–Corasick automaton.

    Engine: terms are grouped BY LENGTH and each group becomes one
    zero-width lookahead alternation ``(?=(t1|t2|…))`` — at a given
    start position at most one term of a given length can match (the
    substring is fixed), so one capture per position per length group
    recovers ALL overlapping matches that a plain ``finditer`` would
    collapse.  One C-speed scan per distinct term length.

    Boundary semantics are identical to the whole-word matcher: a match
    edge must fall on a token boundary only when the TERM edge char is a
    word char ([A-Z0-9_]).
    """

    def __init__(self, term_ids_by_norm: dict[str, int]):
        self.term_ids_by_norm = term_ids_by_norm
        by_len: dict[int, list[str]] = {}
        for term in term_ids_by_norm:
            if term:
                by_len.setdefault(len(term), []).append(term)
        self._scans = [
            (length, re.compile(
                "(?=(" + "|".join(re.escape(t) for t in sorted(terms))
                + "))"))
            for length, terms in sorted(by_len.items())
        ]

    def match(self, utext: str, whole_word_only: bool = True) -> list[RawMatch]:
        out: list[RawMatch] = []
        word = _WORD_CHARS
        ids = self.term_ids_by_norm
        n = len(utext)
        for length, rx in self._scans:
            for m in rx.finditer(utext):
                term = m.group(1)
                s = m.start()
                e = s + length
                if whole_word_only:
                    if term[0] in word and s > 0 and utext[s - 1] in word:
                        continue
                    if term[-1] in word and e < n and utext[e] in word:
                        continue
                out.append(RawMatch(ids[term], s, e))
        return out


class _AhoCorasick:
    """Minimal Aho–Corasick (goto/fail/output) over uppercased terms.

    Used only for the non-default ``whole_word_only=False`` path; the hot
    whole-word path uses the token-window index above, which is faster in
    pure Python because its inner loop is one dict probe per token window
    rather than one per character.
    """

    def __init__(self, term_ids_by_norm: dict[str, int]):
        # goto: list of dict[char -> state]; output: list of term lens+ids
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, int]]] = [[]]  # (term_len, term_id)
        for term, tid in term_ids_by_norm.items():
            if not term:
                continue
            state = 0
            for ch in term:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[state][ch] = nxt
                state = nxt
            self.out[state].append((len(term), tid))
        # BFS fail links
        from collections import deque

        self.fail = [0] * len(self.goto)
        q = deque()
        for st in self.goto[0].values():
            q.append(st)
        while q:
            r = q.popleft()
            for ch, st in self.goto[r].items():
                q.append(st)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[st] = self.goto[f].get(ch, 0)
                if self.fail[st] == st:
                    self.fail[st] = 0
                self.out[st] = self.out[st] + self.out[self.fail[st]]

    def search(self, utext: str) -> list[RawMatch]:
        out: list[RawMatch] = []
        state = 0
        goto, fail, outputs = self.goto, self.fail, self.out
        for pos, ch in enumerate(utext):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if outputs[state]:
                end0 = pos + 1
                for term_len, tid in outputs[state]:
                    out.append(RawMatch(tid, end0 - term_len, end0))
        return out


# ---------------------------------------------------------------------------
# Raw-match post-processing (M4–M7) — operates on one text's match list.


def longest_only_filter(matches: list[RawMatch]) -> list[RawMatch]:
    """M7/O2: drop spans contained in a strictly longer span; equal spans
    all survive.  O(n log n) sweep."""
    if len(matches) <= 1:
        return matches
    order = sorted(matches, key=lambda m: (m.start0, -m.end0))
    kept: list[RawMatch] = []
    max_end_prev = -1  # max end over previous DISTINCT spans
    cur_span: tuple[int, int] | None = None
    group_max_end = -1
    for m in order:
        span = (m.start0, m.end0)
        if span != cur_span:
            max_end_prev = max(max_end_prev, group_max_end)
            cur_span = span
            group_max_end = m.end0
        # any previous distinct span has start<=m.start0; if its end>=m.end0
        # it strictly contains this (shorter) span
        if max_end_prev >= m.end0:
            continue
        kept.append(m)
    return kept


def raw_filter(
    matches: list[RawMatch],
    utext: str,
    *,
    min_term_size: int = 0,
    stop_set: frozenset[str] = frozenset(),
    exclude_numbers: bool = False,
) -> list[RawMatch]:
    """M4–M6 in the reference's order, on the UPPERCASED matched string."""
    out = []
    for m in matches:
        val = utext[m.start0 : m.end0]
        if min_term_size and (m.end0 - m.start0) < min_term_size:
            continue
        if stop_set and val in stop_set:
            continue
        if exclude_numbers and _NUMERIC_RE.fullmatch(val):
            continue
        out.append(m)
    return out
