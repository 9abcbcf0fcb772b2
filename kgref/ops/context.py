"""Clinical context flags — the ConText algorithm (Harkema et al. 2009,
"ConText: An algorithm for determining negation, experiencer, and
temporal status from clinical reports", J Biomed Inform 42(5)) over the
annotator's output, covering the Annotator+/SIFR fork's clinical-context
feature (negation / experiencer / temporality detection;
ref:Annotator+ paper §2 [M] — BASELINE.md records the feature as living
OUTSIDE the reference gem, in the lirmm proxy stack; this module
reconstructs it from the published algorithm only).

Semantics (deterministic, SQL-twin-able subset of ConText):

- Tokens are the single-space split of the turn text; trigger matching
  is case-folded (kgref.matcher.fold_upper, the M1 convention).
- A category is ACTIVE for an annotation when a trigger token for that
  category occurs at token index ``t`` strictly before the annotation's
  start token ``m`` with ``m - t <= SCOPE_WINDOW``, and no scope
  terminator token sits strictly between ``t`` and ``m``.  (Harkema's
  forward scope, fixed window, pre-trigger-only subset — post-triggers
  and explicit scope-closing punctuation don't exist in the corpus.)
- negated:      bool            (default False)
- experiencer:  patient | other (default patient)
- temporality:  recent | historical (default recent)

Scale design: flags are a pure function of (turn text, annotation start
offset), so they are computed INSIDE the annotate actor pass — the
recognizer wrapper :class:`ContextAnnotateTriples` runs the standard
engine, then one vectorized numpy pass over the batch's triples.  Zero
extra shuffle, zero extra read, state-free: at 100 TB the stage costs a
few searchsorted calls per batch on top of matching.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..matcher import fold_upper
from ..stages.annotate import AnnotateTriples, annotate_rows

# Trigger lexicons — a deterministic mini-subset of the published ConText
# trigger lists (the full lists are corpus-tuned; these are the
# high-frequency heads).  Uppercase: compared post-fold_upper.
NEGATION_TRIGGERS = ("DENIES", "NEVER", "NO", "NOT", "WITHOUT")
EXPERIENCER_TRIGGERS = ("BROTHER", "FAMILY", "FATHER", "MOTHER", "SISTER")
TEMPORALITY_TRIGGERS = ("FORMER", "HISTORY", "PAST", "PREVIOUSLY")
SCOPE_TERMINATORS = ("BUT",)
SCOPE_WINDOW = 5  # max tokens between trigger and annotation start

# Deterministic trigger-injection view (the synthetic corpus is operator
# word-soup with no clinical language, so without the view every flag
# would be the default and the gate would prove nothing).  Prefix by
# doc_id % 8 — exercises each category, the BUT terminator (slot 3: NOT
# within window but blocked), multi-trigger stacking (slot 5), and the
# untouched control rows (slots 6-7 plus everything past the window).
CONTEXT_PREFIXES = (
    "no ",                    # 0: negation
    "father has ",            # 1: experiencer=other
    "previously had ",        # 2: temporality=historical
    "not only but also ",     # 3: NOT trigger CANCELLED by BUT terminator
    "never without doubt ",   # 4: stacked negation triggers
    "mother denies past ",    # 5: all three categories at once
    "",                       # 6: control
    "",                       # 7: control
)


def _last_before(sorted_vals: np.ndarray, points: np.ndarray) -> np.ndarray:
    """For each point, the largest value in ``sorted_vals`` strictly
    below it, or a sentinel far below any valid global ordinal."""
    idx = np.searchsorted(sorted_vals, points, side="left") - 1
    if len(sorted_vals) == 0:
        return np.full(len(points), np.iinfo(np.int64).min, np.int64)
    vals = sorted_vals[np.maximum(idx, 0)]
    return np.where(idx >= 0, vals, np.iinfo(np.int64).min)


def compute_context_flags(
    texts: list[str],
    t_row: np.ndarray,
    t_from: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ConText pass over one batch.

    ``texts`` are the batch's turn texts; each triple carries the batch
    row index it came from (``t_row``) and its 1-based start char offset
    (``t_from``).  Returns three bool arrays (negated, experiencer=other,
    temporality=historical), one element per triple.

    Implementation: every row's token starts / trigger positions are
    embedded on ONE global axis (row i shifted by i×chunk for chars,
    by the running token count for token ordinals), so the whole batch
    resolves with a handful of np.searchsorted calls — no per-triple
    Python.  The only Python loop is per batch ROW (tokenize + isin),
    matching the recognizer's own per-text granularity.
    """
    n = len(texts)
    cats = (NEGATION_TRIGGERS, EXPERIENCER_TRIGGERS, TEMPORALITY_TRIGGERS)
    cat_arrs = [np.array(c) for c in cats]
    term_arr = np.array(SCOPE_TERMINATORS)

    starts_per_row: list[np.ndarray] = []
    trig_local: list[list[np.ndarray]] = [[], [], []]
    term_local: list[np.ndarray] = []
    tok_counts = np.empty(n, np.int64)
    max_len = 1
    for i, text in enumerate(texts):
        ut = fold_upper(text or "")
        max_len = max(max_len, len(ut))
        toks = ut.split(" ")
        tok_counts[i] = len(toks)
        lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        cs = np.cumsum(lens + 1)
        starts_per_row.append(np.concatenate(([1], cs[:-1] + 1)))
        toks_np = np.array(toks)
        for c, arr in enumerate(cat_arrs):
            trig_local[c].append(np.flatnonzero(np.isin(toks_np, arr)) + 1)
        term_local.append(np.flatnonzero(np.isin(toks_np, term_arr)) + 1)

    chunk_c = max_len + 2
    char_off = np.arange(n, dtype=np.int64) * chunk_c
    tok_off = np.zeros(n, np.int64)
    np.cumsum(tok_counts[:-1], out=tok_off[1:])

    g_starts = np.concatenate(
        [s + char_off[i] for i, s in enumerate(starts_per_row)])
    g_trig = [
        np.concatenate([t + tok_off[i] for i, t in enumerate(trig_local[c])])
        for c in range(3)
    ]
    g_term = np.concatenate(
        [t + tok_off[i] for i, t in enumerate(term_local)])

    t_row = np.asarray(t_row, np.int64)
    t_from = np.asarray(t_from, np.int64)
    gm_char = t_from + char_off[t_row]
    # 1-based GLOBAL ordinal of the token containing the match start
    g_m = np.searchsorted(g_starts, gm_char, side="right")

    row_floor = tok_off[t_row]  # ordinals <= this belong to earlier rows
    t_term_star = _last_before(g_term, g_m)
    out = []
    for c in range(3):
        t_star = _last_before(g_trig[c], g_m)
        same_row = t_star > row_floor
        within = (g_m - t_star) <= SCOPE_WINDOW
        # a terminator from an EARLIER row is always < any same-row
        # trigger ordinal, so the > comparison needs no row check
        blocked = t_term_star > t_star
        out.append(same_row & within & ~blocked)
    return out[0], out[1], out[2]


class ContextAnnotateTriples(AnnotateTriples):
    """Recognizer wrapper: standard annotation + ConText flag columns.

    Slots into the same §2.10 plugin seam as the other engines; the
    TRIPLES schema gains ``negated`` (bool), ``experiencer`` and
    ``temporality`` (dictionary-encoded strings — same shuffle-byte
    discipline as the other categorical columns)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        triples = annotate_rows(conv_ids, turn_idxs, texts, self.state,
                                self.opts, registry=self.registry)
        m = triples.num_rows
        if m == 0:
            neg = np.zeros(0, bool)
            exp_ = np.zeros(0, bool)
            tmp = np.zeros(0, bool)
        else:
            conv = triples.column("conv_id")
            if pa.types.is_dictionary(conv.type):
                conv = pc.cast(conv, conv.type.value_type)
            key = pc.binary_join_element_wise(
                pc.cast(conv, pa.string()),
                pc.cast(triples.column("turn_idx"), pa.string()), "\x1f")
            enc = pc.dictionary_encode(key)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            row_of = {f"{c}\x1f{t}": i
                      for i, (c, t) in enumerate(zip(conv_ids, turn_idxs))}
            lut = np.array([row_of[u] for u in enc.dictionary.to_pylist()],
                           np.int64)
            t_row = lut[enc.indices.to_numpy()]
            t_from = (triples.column("from_1b").combine_chunks()
                      if isinstance(triples.column("from_1b"),
                                    pa.ChunkedArray)
                      else triples.column("from_1b"))
            neg, exp_, tmp = compute_context_flags(
                texts, t_row, np.asarray(t_from, np.int64))
        experiencer = pc.dictionary_encode(
            pa.array(np.where(exp_, "other", "patient")))
        temporality = pc.dictionary_encode(
            pa.array(np.where(tmp, "historical", "recent")))
        return (triples
                .append_column("negated", pa.array(neg))
                .append_column("experiencer", experiencer)
                .append_column("temporality", temporality))


# ---------------------------------------------------------------------------
# SQL rendering of the same spec (the oracle side embeds these).


def context_prefix_sql_case() -> str:
    """The doc_id % 8 trigger-injection prefix as a DuckDB CASE."""
    whens = "\n    ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(CONTEXT_PREFIXES) if p)
    return f"CASE doc_id % {len(CONTEXT_PREFIXES)}\n    {whens}\n    ELSE '' END"


def context_flag_exprs_sql(match_alias: str = "r") -> dict[str, str]:
    """Flag expressions over a match row carrying (doc_id, p) — the
    EXISTS-any-qualifying-trigger form, provably equivalent to the
    last-trigger numpy form (if the LAST trigger is blocked/out-of-window
    every earlier one is too-or-farther; if ANY qualifies, the last one
    does)."""
    def lst(words):
        return ", ".join(f"'{w}'" for w in words)

    def active(cat_cte):
        return (
            f"EXISTS (SELECT 1 FROM {cat_cte} g WHERE g.doc_id = "
            f"{match_alias}.doc_id AND {match_alias}.p - g.p BETWEEN 1 AND "
            f"{SCOPE_WINDOW} AND NOT EXISTS (SELECT 1 FROM brk b WHERE "
            f"b.doc_id = {match_alias}.doc_id AND b.p > g.p AND "
            f"b.p < {match_alias}.p))"
        )

    return {
        "ctes": f"""wtok AS (SELECT doc_id, p, upper(list_extract(w, p)) AS tokw FROM tok),
neg AS (SELECT doc_id, p FROM wtok WHERE tokw IN ({lst(NEGATION_TRIGGERS)})),
expt AS (SELECT doc_id, p FROM wtok WHERE tokw IN ({lst(EXPERIENCER_TRIGGERS)})),
tmpt AS (SELECT doc_id, p FROM wtok WHERE tokw IN ({lst(TEMPORALITY_TRIGGERS)})),
brk AS (SELECT doc_id, p FROM wtok WHERE tokw IN ({lst(SCOPE_TERMINATORS)}))""",
        "negated": f"CAST({active('neg')} AS BOOLEAN)",
        "experiencer": f"CASE WHEN {active('expt')} THEN 'other' "
                       "ELSE 'patient' END",
        "temporality": f"CASE WHEN {active('tmpt')} THEN 'historical' "
                       "ELSE 'recent' END",
    }
