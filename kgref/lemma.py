"""Lemmatization-based matching — the Annotator+/SIFR fork's lemma
recognizer, rebuilt from the published description (Tchechmedjiev et
al., "SIFR annotator: ontology-based semantic annotation of French
biomedical text", and Jonquet et al.'s Annotator+ — the fork annotates
a LEMMATIZED copy of the text against a LEMMATIZED dictionary so
inflected surface forms hit base-form dictionary entries;
≙ ref:ncbo_annotator fork tooling [L] — the feature lives outside the
gem per BASELINE.md, so this is a reconstruction, not a port).

Engine contract: the same ``match_fn(utext, whole_word_only) ->
list[RawMatch]`` seam as every other recognizer (SURVEY §2.10), with
offsets in ORIGINAL-text code-point coordinates, so everything
downstream (M4–M11, J1–J4, A4, serialization) is untouched and the
matched_text column carries the INFLECTED surface span.

Lemmatizer: a deterministic, order-pinned English plural folder over
UPPERCASED tokens (the match domain is the M1 fold) — rule-based so
the DuckDB oracle can replicate it exactly (:func:`lemma_sql_expr`):

    1. ≥5 chars ending IES        → …Y      (STUDIES → STUDY)
    2. ≥5 chars ending XES / ZES /
       SES / CHES / SHES          → strip ES (BOXES → BOX)
    3. ≥4 chars ending S but not
       SS / US / IS               → strip S  (ATTACKS → ATTACK)
    4. otherwise                  → unchanged

Both sides fold through the SAME function, so over-stemming (SERIES →
SERIE) stays consistent: it can only merge surface forms, never split
them, and every exact whole-word match is also a lemma match
(pinned by test_lemma_matches_superset_of_exact).

Matching: token-window scan over LEMMA KEY SEQUENCES — dictionary
terms tokenize ([A-Z0-9_]+), each token lemmatizes, and the key is the
space-joined lemma sequence; text tokens lemmatize the same way and
every window whose joined lemma sequence hits the index emits one
RawMatch per dictionary term sharing that key (two dictionary terms
may collapse to one key — ATTACK / ATTACKS — and both annotate the
span, exactly like two synonym labels would).  Key consequence:
matching is separator-insensitive between tokens (HEART-ATTACK ≍
HEART ATTACK) — strictly more lenient than the exact engines, which is
the point of the lemma mode.  Terms with a NON-word edge char (C++,
+5) have no meaningful lemma; they are matched EXACTLY via the same
irregular Aho–Corasick pass the token-window engine uses.
"""

from __future__ import annotations

from .matcher import TOKEN_RE, RawMatch, TermDictionary

_VOWELLESS_KEEP = ("SS", "US", "IS")


def lemma_token(tok: str) -> str:
    """Fold one UPPERCASED token to its lemma key (rules above)."""
    n = len(tok)
    if n >= 5 and tok.endswith("IES"):
        return tok[:-3] + "Y"
    if n >= 5 and (tok.endswith("XES") or tok.endswith("ZES")
                   or tok.endswith("SES") or tok.endswith("CHES")
                   or tok.endswith("SHES")):
        return tok[:-2]
    if n >= 4 and tok.endswith("S") and not tok.endswith(_VOWELLESS_KEEP):
        return tok[:-1]
    return tok


def lemma_key(term: str) -> str:
    """Space-joined lemma sequence of a normalized (uppercased) term."""
    return " ".join(lemma_token(t) for t in TOKEN_RE.findall(term))


def lemma_sql_expr(col: str) -> str:
    """DuckDB twin of :func:`lemma_token` for a LOWERCASE VARCHAR
    expression (the SQL oracles work in the corpus's lowercase domain;
    the matcher uppercases both sides — the rules are case-parallel, so
    the two domains fold identically)."""
    return f"""CASE
 WHEN length({col}) >= 5 AND {col} LIKE '%ies'
   THEN substr({col}, 1, length({col}) - 3) || 'y'
 WHEN length({col}) >= 5 AND ({col} LIKE '%xes' OR {col} LIKE '%zes'
      OR {col} LIKE '%ses' OR {col} LIKE '%ches' OR {col} LIKE '%shes')
   THEN substr({col}, 1, length({col}) - 2)
 WHEN length({col}) >= 4 AND {col} LIKE '%s' AND {col} NOT LIKE '%ss'
      AND {col} NOT LIKE '%us' AND {col} NOT LIKE '%is'
   THEN substr({col}, 1, length({col}) - 1)
 ELSE {col} END"""


class LemmaTermScanner:
    """Fourth recognizer engine through the §2.10 plugin surface.

    Built ONCE per actor (the stateful-stage slot): the lemma-key
    index over the broadcast dictionary plus the shared irregular-term
    automaton.  ``match`` is the per-turn hot path — token spans from
    one compiled-regex pass, lemma folds cached per distinct token,
    then the same first-token/width window walk as the exact engine.
    """

    def __init__(self, term_ids_by_norm: dict[str, int]):
        self.term_ids_by_norm = term_ids_by_norm
        # lemma key -> sorted tuple of term ids sharing it
        index: dict[str, list[int]] = {}
        first: dict[str, int] = {}  # first lemma token -> max window (#tok)
        word = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
        for term, tid in term_ids_by_norm.items():
            if not term:
                continue
            if term[0] not in word or term[-1] not in word:
                continue  # non-word edge: exact-matched via the AC pass
            toks = TOKEN_RE.findall(term)
            if not toks:
                continue
            key = " ".join(lemma_token(t) for t in toks)
            index.setdefault(key, []).append(tid)
            f = key.split(" ", 1)[0]
            if len(toks) > first.get(f, 0):
                first[f] = len(toks)
        self._index = {k: tuple(sorted(v)) for k, v in index.items()}
        self._first = first
        # irregular (non-word-edge) terms ride the exact engine's AC
        # pass unchanged — delegate to a TermDictionary holding the
        # full dict (its _irregular split already selects them)
        self._exact = TermDictionary(term_ids_by_norm)
        self._lemma_cache: dict[str, str] = {}

    def match(self, utext: str,
              whole_word_only: bool = True) -> list[RawMatch]:
        # Lemma matching is whole-word by construction (a lemma of a
        # sub-token span is not well-defined); the flag is accepted for
        # seam compatibility and ignored.
        cache = self._lemma_cache
        lem = lemma_token
        spans = []
        lemmas = []
        for m in TOKEN_RE.finditer(utext):
            s, e = m.span()
            tok = utext[s:e]
            lt = cache.get(tok)
            if lt is None:
                lt = lem(tok)
                if len(cache) < 200_000:
                    cache[tok] = lt
            spans.append((s, e))
            lemmas.append(lt)
        out: list[RawMatch] = []
        index = self._index
        first = self._first
        n = len(spans)
        for i in range(n):
            width = first.get(lemmas[i], 0)
            if not width:
                continue
            for j in range(i, min(i + width, n)):
                tids = index.get(" ".join(lemmas[i : j + 1]))
                if tids is not None:
                    s = spans[i][0]
                    e = spans[j][1]
                    for tid in tids:
                        out.append(RawMatch(tid, s, e))
        if self._exact._irregular:
            out.extend(self._exact._match_irregular(utext))
        return out
