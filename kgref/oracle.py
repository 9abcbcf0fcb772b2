"""Brute-force reference annotator — the test oracle.

A deliberately slow, loop-everything re-implementation of the full
annotate semantics (match → raw filters → term→class resolution → class
filters → hierarchy/mapping expansion → canonicalization → scoring),
written INDEPENDENTLY of kgref.matcher / kgref.stages so that pytest
golden checks compare two implementations, not one implementation with
itself.  Mirrors the reference call chain annotate → annotate_direct →
expand_hierarchies → expand_mappings (ref:lib/ncbo_annotator.rb [H];
SURVEY.md §3 E1).  Used only at fixture scale — never in the pipeline.
"""

from __future__ import annotations

import math

from .schemas import AnnotateOptions, subj_of

_WORD = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _find_all(utext: str, term: str, whole_word: bool) -> list[tuple[int, int]]:
    """All (start0, end0) occurrences of term in utext (brute force)."""
    spans = []
    start = 0
    while True:
        i = utext.find(term, start)
        if i < 0:
            break
        j = i + len(term)
        ok = True
        if whole_word:
            if i > 0 and utext[i - 1] in _WORD and term[0] in _WORD:
                ok = False
            if j < len(utext) and utext[j] in _WORD and term[-1] in _WORD:
                ok = False
        if ok:
            spans.append((i, j))
        start = i + 1
    return spans


def annotate_text_oracle(
    text: str,
    dictionary: dict[str, int],  # term_norm -> term_id
    term_classes: dict[int, list[tuple[str, str, str]]],  # tid -> [(uri, ont, PREF|SYN)]
    class_info: dict[str, tuple[str, str, str, tuple[str, ...]]],  # uri -> (pref,cui,ont,stys)
    closure: dict[str, list[tuple[str, int]]],  # uri -> [(ancestor, dist)]
    mappings: dict[str, list[tuple[str, str]]],  # uri -> [(mapped_uri, mapped_ont)]
    stop_words: frozenset[str],
    opts: AnnotateOptions,
    conv_id: str = "c",
    turn_idx: int = 0,
) -> list[dict]:
    """Returns flat triple dicts (TRIPLES schema minus nothing)."""
    utext = text.upper()

    # 1. match every term independently (brute force)
    raw: list[tuple[int, int, int]] = []  # (tid, s, e)
    for term, tid in dictionary.items():
        for s, e in _find_all(utext, term, opts.whole_word_only):
            raw.append((tid, s, e))

    # 2. longest_only at raw-match level (containment in strictly longer span)
    if opts.longest_only:
        kept = []
        for tid, s, e in raw:
            contained = any(
                (s2 <= s and e2 >= e and (e2 - s2) > (e - s)) for _, s2, e2 in raw
            )
            if not contained:
                kept.append((tid, s, e))
        raw = kept

    # 3. raw filters in reference order: min_term_size, stop words, numbers
    stopset = stop_words if opts.use_stop_words else frozenset()
    stopset = frozenset(stopset | {w.upper() for w in opts.extra_stop_words})
    filtered = []
    for tid, s, e in raw:
        val = utext[s:e]
        if opts.min_term_size and len(val) < opts.min_term_size:
            continue
        if val in stopset:
            continue
        if opts.exclude_numbers and val.isdigit():
            continue
        filtered.append((tid, s, e))

    # 4. resolution + class-level filters (M8–M10)
    direct: list[tuple[str, str, str, int, int]] = []  # (uri, ont, mt, s, e)
    for tid, s, e in filtered:
        for uri, ont, mt in term_classes.get(tid, []):
            if not opts.with_synonyms and mt != "PREF":
                continue
            if opts.ontologies and ont not in opts.ontologies:
                continue
            if opts.semantic_types:
                stys = class_info[uri][3]
                if not any(t in stys for t in opts.semantic_types):
                    continue
            direct.append((uri, ont, mt, s, e))

    # 5. triple emission + expansion (J2/J3) + canonicalization (J4/M11)
    rows: list[dict] = []

    def emit(pred, obj, s, e, mt, dist, score):
        pref, cui, _ont, _st = class_info.get(obj, ("", "", "", ()))
        rows.append(
            dict(
                subj=subj_of(conv_id, turn_idx, s + 1, e),
                pred=pred,
                obj=obj,
                conv_id=conv_id,
                turn_idx=turn_idx,
                from_1b=s + 1,
                to_1b=e,
                match_type=mt,
                matched_text=text[s:e],
                distance=dist,
                pref_label=pref,
                cui=cui,
                score=score,
            )
        )

    # scoring needs per-(turn, term-surface) counts for the cvalue variants
    counts: dict[str, int] = {}
    for uri, ont, mt, s, e in direct:
        counts[utext[s:e]] = counts.get(utext[s:e], 0) + 1

    def direct_score(mt, s, e):
        if not opts.score:
            return 0.0
        base = 10.0 if mt == "PREF" else 8.0
        if opts.score == "old":
            return base
        val = utext[s:e]
        ntoks = max(2, len([t for t in val.replace("_", " ").split() if t]))
        c = (1 + math.log2(ntoks)) * counts[val]
        if opts.score == "cvalueh":
            return round(c * (base / 10.0), 4)
        return round(c, 4)

    for uri, ont, mt, s, e in direct:
        sc = direct_score(mt, s, e)
        emit("annotated_with", uri, s, e, mt, 0, sc)
        K = opts.expand_hierarchy_levels
        if K:
            best: dict[str, int] = {}
            for anc, dist in closure.get(uri, []):
                if dist <= K and (anc not in best or dist < best[anc]):
                    best[anc] = dist
            for anc, dist in best.items():
                asc = round(sc * (0.8**dist), 4) if opts.score else 0.0
                emit("isa_closure", anc, s, e, mt, dist, asc)
        if opts.expand_mappings:
            for muri, mont in mappings.get(uri, []):
                if opts.ontologies and mont not in opts.ontologies:
                    continue
                msc = round(sc * 0.7, 4) if opts.score else 0.0
                emit("mapped_to", muri, s, e, mt, 0, msc)

    if opts.score and opts.score_threshold > 0:
        rows = [r for r in rows if r["score"] >= opts.score_threshold]

    # dedup identical (subj, pred, obj) keeping min distance (A2/U2)
    dedup: dict[tuple, dict] = {}
    for r in rows:
        k = (r["subj"], r["pred"], r["obj"], r["match_type"])
        if k not in dedup or r["distance"] < dedup[k]["distance"]:
            dedup[k] = r
    return list(dedup.values())
