"""Offline dictionary build — the reference's E2 path as a Ray job.

The reference walks every ontology submission via SPARQL, uppercases
each prefLabel/synonym, assigns every distinct normalized term an
integer id in Redis, and dumps an ``id<TAB>TERM`` mgrep dictionary file
(ref:lib/ncbo_annotator.rb create_term_cache /
generate_dictionary_file [H]; SURVEY.md §3 E2, ops S1–S3, A3, U1).

Rebuild: classes.parquet → Ray Data →

1. explode (class × {prefLabel}∪synonyms) → (term_norm, class_uri,
   ontology, match_type) rows                                (flat map)
2. deterministic dense term-id assignment: distinct term_norm, sorted,
   enumerated (A3 — sort-then-enumerate beats Redis INCR: stable across
   rebuilds, so dictionary versions diff cleanly)            (the one
   small shuffle; term vocabulary is dimension-sized)
3. join ids back onto the exploded rows (broadcast map-side)
4. is-a transitive closure from the parents column: driver-side BFS —
   ontology graphs are dimension-sized (≤10^6 classes); at larger scale
   this becomes an iterative self-join, same semantics
5. write labels/isa_closure parquet + optional mgrep-format TSV
   (``id\tTERM``) for debugging parity with the reference's dictionary
   file

A new output dir = a new dictionary version ≙ the reference's
blue/green Redis instance flip (S3).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..matcher import fold_upper
from ..schemas import ISA_CLOSURE, LABELS


def explode_labels(batch: pa.Table) -> pa.Table:
    """(class × label-surface) rows, uppercased with the same
    length-preserving fold the matcher applies to text (M1/U1) — both
    sides must agree on characters whose uppercase expands."""
    terms, uris, onts, mts = [], [], [], []
    for uri, ont, pref, syns in zip(batch.column("class_uri").to_pylist(),
                                    batch.column("ontology").to_pylist(),
                                    batch.column("pref_label").to_pylist(),
                                    batch.column("synonyms").to_pylist()):
        if pref:
            terms.append(fold_upper(pref))
            uris.append(uri)
            onts.append(ont)
            mts.append("PREF")
        for s in syns or []:
            terms.append(fold_upper(s))
            uris.append(uri)
            onts.append(ont)
            mts.append("SYN")
    return pa.Table.from_arrays(
        [pa.array(terms, pa.string()), pa.array(uris, pa.string()),
         pa.array(onts, pa.string()), pa.array(mts, pa.string())],
        names=["term_norm", "class_uri", "ontology", "match_type"],
    )


def build_dictionary(classes_path: str, out_dir: str,
                     write_mgrep_tsv: bool = False) -> dict:
    """classes.parquet → labels.parquet + isa_closure.parquet (+ TSV).

    Returns {'terms': n_distinct_terms, 'labels': n_rows,
    'closure': n_rows}."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    classes = rd.read_parquet(classes_path,
                              columns=["class_uri", "ontology", "pref_label",
                                       "synonyms"])
    exploded = classes.map_batches(explode_labels, batch_format="pyarrow")

    # A3: distinct terms, globally sorted, densely enumerated.  The term
    # vocabulary is dimension-sized, so collecting the distinct set on
    # the driver is the broadcast-small-side pattern, not a scale bug.
    distinct = sorted(set(
        t for b in exploded.select_columns(["term_norm"])
        .iter_batches(batch_format="pyarrow")
        for t in b.column("term_norm").to_pylist()
    ))
    term_ids = {t: i + 1 for i, t in enumerate(distinct)}

    def attach_ids(batch: pa.Table) -> pa.Table:
        ids = pa.array([term_ids[t] for t in
                        batch.column("term_norm").to_pylist()], pa.int64())
        return pa.Table.from_arrays(
            [ids, batch.column("term_norm"), batch.column("class_uri"),
             batch.column("ontology"), batch.column("match_type")],
            schema=LABELS,
        )

    labels = exploded.map_batches(attach_ids, batch_format="pyarrow")
    labels_tbl = pa.concat_tables(
        labels.iter_batches(batch_format="pyarrow"))
    labels_tbl = labels_tbl.sort_by([("term_id", "ascending"),
                                     ("class_uri", "ascending"),
                                     ("match_type", "ascending")])
    pq.write_table(labels_tbl, os.path.join(out_dir, "labels.parquet"))

    # is-a closure (D7): BFS to fixpoint, min distance per ancestor (A2)
    parents_tbl = pq.read_table(classes_path, columns=["class_uri",
                                                       "parents"])
    parent_of = {u: list(p or []) for u, p in
                 zip(parents_tbl.column("class_uri").to_pylist(),
                     parents_tbl.column("parents").to_pylist())}
    rows = []
    for start in parent_of:
        best: dict[str, int] = {}
        frontier, dist = {start}, 0
        while frontier and dist < 64:
            dist += 1
            nxt = set()
            for n in frontier:
                for p in parent_of.get(n, ()):
                    if p not in best or dist < best[p]:
                        best[p] = dist
                        nxt.add(p)
            frontier = nxt
        rows.extend((start, anc, d) for anc, d in sorted(best.items()))
    closure_tbl = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], pa.string()),
         pa.array([r[2] for r in rows], pa.int32())],
        schema=ISA_CLOSURE,
    )
    pq.write_table(closure_tbl, os.path.join(out_dir, "isa_closure.parquet"))

    if write_mgrep_tsv:  # S2 parity artifact: ``id\tTERM`` lines
        with open(os.path.join(out_dir, "mgrep_dictionary.tsv"), "w") as fh:
            for t, i in sorted(term_ids.items(), key=lambda kv: kv[1]):
                fh.write(f"{i}\t{t}\n")

    return {"terms": len(term_ids), "labels": labels_tbl.num_rows,
            "closure": closure_tbl.num_rows}
