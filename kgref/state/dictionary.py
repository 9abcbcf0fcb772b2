"""Broadcast dictionary state — replaces the reference's Redis + mgrep RAM.

The reference keeps its dictionary in two shared network services: the
mgrep server's radix tree (ST1) and the Redis term cache ``term:<id>`` →
encoded (ontology, class, semtypes, matchType) entries (ST2,
ref:lib/ncbo_annotator.rb create_term_entry [H]).  The rebuild folds both
into one immutable, picklable ``DictionaryState`` built once on the
driver from the versioned Parquet dictionary tables, shipped to every
matcher actor via ``ray.put`` (one object-store copy per node, zero
copies per batch), and materialized into plain dicts in actor
``__init__`` (SURVEY.md §2.3–2.4: J1/J4 become in-actor lookups, J2/J3
become broadcast map-side joins — no shuffle joins anywhere).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..matcher import TermDictionary


@dataclass
class DictionaryState:
    term_ids_by_norm: dict[str, int]
    term_classes: dict[int, list[tuple[str, str, str]]]  # tid -> (uri, ont, PREF|SYN)
    class_info: dict[str, tuple[str, str, str, tuple[str, ...]]]  # uri -> (pref, cui, ont, stys)
    closure: dict[str, list[tuple[str, int]]]  # uri -> [(ancestor, dist)]
    mappings: dict[str, list[tuple[str, str]]]  # uri -> [(mapped_uri, mapped_ont)]
    stop_words: frozenset[str]
    version: str = "v0"  # dictionary snapshot id (≙ the reference's
    # blue/green Redis instance flip: a new snapshot dir = a new version)
    _td: TermDictionary | None = field(default=None, repr=False, compare=False)

    def term_dictionary(self) -> TermDictionary:
        if self._td is None:
            self._td = TermDictionary(self.term_ids_by_norm)
        return self._td

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_td"] = None  # rebuild the index per actor; ship only raw dicts
        return d

    # ------------------------------------------------------------------
    @classmethod
    def from_tables(
        cls,
        classes: pa.Table,
        labels: pa.Table,
        isa_closure: pa.Table,
        mappings: pa.Table,
        stop_words: pa.Table,
        version: str = "v0",
    ) -> "DictionaryState":
        term_ids: dict[str, int] = {}
        term_classes: dict[int, list[tuple[str, str, str]]] = {}
        for tid, norm, uri, ont, mt in zip(
            labels.column("term_id").to_pylist(),
            labels.column("term_norm").to_pylist(),
            labels.column("class_uri").to_pylist(),
            labels.column("ontology").to_pylist(),
            labels.column("match_type").to_pylist(),
        ):
            term_ids[norm] = tid
            term_classes.setdefault(tid, []).append((uri, ont, mt))

        class_info: dict[str, tuple[str, str, str, tuple[str, ...]]] = {}
        for uri, ont, pref, cui, stys in zip(
            classes.column("class_uri").to_pylist(),
            classes.column("ontology").to_pylist(),
            classes.column("pref_label").to_pylist(),
            classes.column("cui").to_pylist(),
            classes.column("semantic_types").to_pylist(),
        ):
            class_info[uri] = (pref or "", cui or "", ont, tuple(stys or ()))

        clo: dict[str, list[tuple[str, int]]] = {}
        for uri, anc, dist in zip(
            isa_closure.column("class_uri").to_pylist(),
            isa_closure.column("ancestor_uri").to_pylist(),
            isa_closure.column("distance").to_pylist(),
        ):
            clo.setdefault(uri, []).append((anc, int(dist)))
        for v in clo.values():
            v.sort(key=lambda t: (t[1], t[0]))

        mp: dict[str, list[tuple[str, str]]] = {}
        for uri, muri, mont in zip(
            mappings.column("class_uri").to_pylist(),
            mappings.column("mapped_class_uri").to_pylist(),
            mappings.column("mapped_ontology").to_pylist(),
        ):
            mp.setdefault(uri, []).append((muri, mont))

        # fold_upper, not str.upper(): matched surfaces are folded with the
        # length-preserving fold, so a stop word with an expanding case map
        # ('straße' → 'STRASSE' under upper()) must fold the same way or the
        # M5 comparison can never fire for it.
        from ..matcher import fold_upper

        stops = frozenset(
            fold_upper(w) for w in stop_words.column("word").to_pylist())
        return cls(term_ids, term_classes, class_info, clo, mp, stops, version)

    @classmethod
    def from_dir(cls, dict_dir: str) -> "DictionaryState":
        """Load a dictionary snapshot directory (classes.parquet, ...)."""
        rd = lambda n: pq.read_table(os.path.join(dict_dir, f"{n}.parquet"))
        return cls.from_tables(
            rd("classes"),
            rd("labels"),
            rd("isa_closure"),
            rd("mappings"),
            rd("stop_words"),
            version=os.path.basename(os.path.normpath(dict_dir)),
        )
