"""Deterministic dictionary over the driver's ``documents`` vocabulary.

The driver's correctness gate runs each ``queries()`` entry AND its
``oracle_sql()`` string over the same parquet tables (TESTDATA.md).  The
annotator's behavior depends on a dictionary, so both sides must share
one: this module defines a mini-ontology whose surface terms come from
the ~31-word vocabulary of ``documents.text`` (lowercase words, single
spaces — verified charset ``[a-z ]``), exposed BOTH as the Python
structures ``DictionaryState`` consumes and as rendered SQL ``VALUES``
lists the DuckDB oracle embeds.  Everything is a hand-written constant —
same definition, two renderings, zero drift.

Structure mirrors the reference's fixture ontologies
(ref:test/test_annotator.rb [H], SURVEY.md §5): multi-word preferred
labels ("hash join"), synonyms (incl. a shared surface "line" → PREF of
one class + SYN of another), a surface owned by two ontologies ("spark"
→ DOC + ALT, exercising the ontology filter), a label colliding with a
default stop word ("data"), semantic types, a 2–3-level is-a hierarchy
with a min-distance diamond (HashJoin → Operator both directly and via
Join), and inter-ontology mappings.
"""

from __future__ import annotations

import pyarrow as pa

from .schemas import CLASSES, ISA_CLOSURE, LABELS, MAPPINGS, STOP_WORDS
from .state.dictionary import DictionaryState

DOC = "http://kgref.test/DOC#"
ALT = "http://kgref.test/ALT#"

# (name, ontology, pref_label, synonyms, semantic_types, parents, cui)
CLASS_DEFS = [
    # --- DOC ontology: operators -----------------------------------------
    ("Operator", "DOC", "operator", [], ["T_OP"], [], ""),
    ("Join", "DOC", "join", [], ["T_OP"], ["Operator"], "C1000001"),
    ("Scan", "DOC", "scan", [], ["T_OP"], ["Operator"], ""),
    ("Sort", "DOC", "sort", [], ["T_OP"], ["Operator"], ""),
    ("Filter", "DOC", "filter", [], ["T_OP"], ["Operator"], ""),
    ("Merge", "DOC", "merge", [], ["T_OP"], ["Operator"], ""),
    ("Hash", "DOC", "hash", [], ["T_OP"], ["Operator"], ""),
    ("Window", "DOC", "window", [], ["T_OP"], ["Operator"], ""),
    ("Agg", "DOC", "agg", ["group agg"], ["T_OP"], ["Operator"], ""),
    ("Group", "DOC", "group", [], ["T_OP"], ["Agg"], ""),
    ("Order", "DOC", "order", [], ["T_OP"], ["Sort"], ""),
    ("Query", "DOC", "query", ["fast query"], ["T_OP"], ["Operator"], ""),
    # diamond: direct parent Operator AND Operator via Join/Hash → min dist 1
    ("HashJoin", "DOC", "hash join", [], ["T_OP"], ["Join", "Hash", "Operator"], "C1000002"),
    ("MergeJoin", "DOC", "merge join", ["sort merge join"], ["T_OP"], ["Join", "Merge"], ""),
    ("TableScan", "DOC", "table scan", [], ["T_OP"], ["Scan"], ""),
    # --- DOC ontology: data things ---------------------------------------
    ("DataThing", "DOC", "datathing", [], ["T_DATA"], [], ""),
    ("Table", "DOC", "table", [], ["T_DATA"], ["DataThing"], "C1000003"),
    ("Column", "DOC", "column", [], ["T_DATA"], ["Table"], ""),
    ("Row", "DOC", "row", ["line"], ["T_DATA"], ["Table"], ""),
    ("Key", "DOC", "key", [], ["T_DATA"], ["Column"], ""),
    ("Value", "DOC", "value", ["key value"], ["T_DATA"], ["Column"], ""),
    ("Data", "DOC", "data", [], ["T_DATA"], ["DataThing"], ""),  # stop-word collision
    ("Stream", "DOC", "stream", [], ["T_DATA"], ["DataThing"], ""),
    ("Batch", "DOC", "batch", [], ["T_DATA"], ["DataThing"], ""),
    ("Vector", "DOC", "vector", [], ["T_DATA"], ["DataThing"], ""),
    ("Part", "DOC", "part", [], ["T_DATA"], ["DataThing"], ""),
    ("Line", "DOC", "line", [], ["T_DATA"], ["DataThing"], ""),
    ("Customer", "DOC", "customer", [], ["T_ENT"], [], "C1000004"),
    ("Spark", "DOC", "spark", [], ["T_SYS"], [], ""),
    ("Dup", "DOC", "dup", [], ["T_MISC"], [], ""),
    ("Big", "DOC", "big", [], ["T_MISC"], [], ""),
    ("Small", "DOC", "small", [], ["T_MISC"], [], ""),
    ("Fast", "DOC", "fast", [], ["T_MISC"], [], ""),
    ("Slow", "DOC", "slow", [], ["T_MISC"], [], ""),
    # sub-token-only surfaces: "tab" occurs inside "table", "ream" inside
    # "stream" — matched ONLY when whole_word_only=False (M3); inert for
    # every whole-word variant since no standalone token has them
    ("Tab", "DOC", "tab", [], ["T_MISC"], [], ""),
    ("Ream", "DOC", "ream", [], ["T_MISC"], [], ""),
    # pure-numeric surfaces (M6): only matchable in the digit-suffixed
    # transcripts view (queries.py annotate_*_numbers variants — documents
    # text itself is [a-z ]); dropped when exclude_numbers=True.  "hash 3"
    # is digit-BEARING but not purely numeric, so it must SURVIVE the
    # filter — proving the exclusion is surface-exact (occurs at sf0.001,
    # sf0.01 and sf0.1: docs ending "... hash" with doc_id%10 == 3).
    ("NumThree", "DOC", "3", [], ["T_NUM"], [], ""),
    ("NumSeven", "DOC", "7", [], ["T_NUM"], [], ""),
    ("HashThree", "DOC", "hash 3", [], ["T_NUM"], [], ""),
    # --- ALT ontology (mapping targets + a shared surface) ----------------
    ("AltSpark", "ALT", "spark", [], ["T_SYS"], [], ""),  # same surface, 2nd ont
    ("Junction", "ALT", "junction", [], ["T_OP"], [], ""),
    ("Relation", "ALT", "relation", [], ["T_DATA"], [], ""),
    ("Engine", "ALT", "engine", [], ["T_SYS"], [], ""),
]

# (src_name, dst_name) — mapped_ontology derives from dst
MAPPING_DEFS = [
    ("Join", "Junction"),
    ("HashJoin", "Junction"),
    ("Table", "Relation"),
    ("Spark", "Engine"),
]

STOPWORDS = ["THE", "A", "DATA"]  # default config list (M5); DATA collides

TURNS_PER_CONV = 16  # documents_as_transcripts mapping used by the queries


def _uri(name: str) -> str:
    ont = next(c[1] for c in CLASS_DEFS if c[0] == name)
    return (DOC if ont == "DOC" else ALT) + name


def _closure() -> list[tuple[str, str, int]]:
    """Capped BFS transitive closure, min distance per (class, ancestor)."""
    parents = {c[0]: list(c[5]) for c in CLASS_DEFS}
    rows = []
    for name in parents:
        best: dict[str, int] = {}
        frontier = {name}
        dist = 0
        while frontier and dist < 32:
            dist += 1
            nxt = set()
            for n in frontier:
                for p in parents.get(n, ()):
                    if p not in best or dist < best[p]:
                        best[p] = dist
                        nxt.add(p)
            frontier = nxt
        for anc, d in sorted(best.items()):
            rows.append((_uri(name), _uri(anc), d))
    return rows


def _labels() -> list[tuple[int, str, str, str, str]]:
    """(term_id, term_norm_upper, class_uri, ontology, match_type); term ids
    assigned deterministically: sort distinct UPPER(term), enumerate (A3)."""
    pairs = []  # (term_upper, uri, ont, mt)
    for name, ont, pref, syns, _sty, _par, _cui in CLASS_DEFS:
        pairs.append((pref.upper(), _uri(name), ont, "PREF"))
        for s in syns:
            pairs.append((s.upper(), _uri(name), ont, "SYN"))
    terms = sorted({t for t, *_ in pairs})
    tid = {t: i + 1 for i, t in enumerate(terms)}
    return [(tid[t], t, uri, ont, mt) for t, uri, ont, mt in sorted(pairs)]


def tables() -> dict[str, pa.Table]:
    classes = pa.Table.from_pylist(
        [
            dict(class_uri=_uri(n), ontology=o, pref_label=p, synonyms=s,
                 semantic_types=st, parents=[_uri(x) for x in par], cui=c)
            for n, o, p, s, st, par, c in CLASS_DEFS
        ],
        schema=CLASSES,
    )
    labels = pa.Table.from_pylist(
        [dict(term_id=i, term_norm=t, class_uri=u, ontology=o, match_type=m)
         for i, t, u, o, m in _labels()],
        schema=LABELS,
    )
    closure = pa.Table.from_pylist(
        [dict(class_uri=a, ancestor_uri=b, distance=d) for a, b, d in _closure()],
        schema=ISA_CLOSURE,
    )
    mappings = pa.Table.from_pylist(
        [
            dict(class_uri=_uri(a), mapped_class_uri=_uri(b),
                 mapped_ontology=next(c[1] for c in CLASS_DEFS if c[0] == b))
            for a, b in MAPPING_DEFS
        ],
        schema=MAPPINGS,
    )
    stops = pa.Table.from_pylist([dict(word=w) for w in STOPWORDS],
                                 schema=STOP_WORDS)
    return dict(classes=classes, labels=labels, isa_closure=closure,
                mappings=mappings, stop_words=stops)


def state() -> DictionaryState:
    t = tables()
    return DictionaryState.from_tables(
        t["classes"], t["labels"], t["isa_closure"], t["mappings"],
        t["stop_words"], version="docdict-v1",
    )


# ---------------------------------------------------------------------------
# SQL renderings (DuckDB VALUES lists) — the oracle side of the same data.


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_dict_cte() -> str:
    """dict(term_id, term, ntok): distinct LOWERCASE terms (text is
    lowercase; the matcher uppercases both sides — equivalent)."""
    seen = {}
    for tid, t, *_ in _labels():
        seen[tid] = t.lower()
    rows = [f"({tid}, {_q(t)}, {len(t.split(' '))})"
            for tid, t in sorted(seen.items())]
    return "dict(term_id, term, ntok) AS (VALUES " + ", ".join(rows) + ")"


def sql_labels_cte() -> str:
    rows = [f"({i}, {_q(u)}, {_q(o)}, {_q(m)})" for i, _t, u, o, m in _labels()]
    return ("labels(term_id, class_uri, ontology, match_type) AS (VALUES "
            + ", ".join(rows) + ")")


def sql_classes_cte() -> str:
    rows = [f"({_q(_uri(n))}, {_q(o)}, {_q(p)}, {_q(c)})"
            for n, o, p, _s, _st, _par, c in CLASS_DEFS]
    return ("cls(class_uri, ontology, pref_label, cui) AS (VALUES "
            + ", ".join(rows) + ")")


def sql_semtypes_cte() -> str:
    rows = [f"({_q(_uri(n))}, {_q(t)})"
            for n, _o, _p, _s, sts, _par, _c in CLASS_DEFS for t in sts]
    return "sty(class_uri, sty) AS (VALUES " + ", ".join(rows) + ")"


def sql_closure_cte() -> str:
    rows = [f"({_q(a)}, {_q(b)}, {d})" for a, b, d in _closure()]
    return ("clo(class_uri, ancestor_uri, distance) AS (VALUES "
            + ", ".join(rows) + ")")


def sql_mappings_cte() -> str:
    rows = [
        f"({_q(_uri(a))}, {_q(_uri(b))}, "
        f"{_q(next(c[1] for c in CLASS_DEFS if c[0] == b))})"
        for a, b in MAPPING_DEFS
    ]
    return ("map(class_uri, mapped_class_uri, mapped_ontology) AS (VALUES "
            + ", ".join(rows) + ")")
