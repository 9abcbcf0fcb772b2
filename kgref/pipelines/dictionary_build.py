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
import shutil

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


# Above this many classes the driver-side distinct-set path would hold
# the whole vocabulary and the whole exploded label table in one process;
# switch to the distributed sort-rank path instead.  At the reference's
# own scale (BioPortal: ~10^7 classes total) either path works; the
# threshold exists so a 10^9-label dictionary build cannot OOM a driver.
DISTRIBUTED_CLASSES_THRESHOLD = 500_000

# Total order of the labels table.  term_id is a dense rank of term_norm,
# so sorting by (term_norm, ...) and by (term_id, ...) give the SAME
# order — which is what lets the distributed path produce ids and final
# order in one shuffle.  ontology is a tie-break key only so the driver
# and distributed paths emit identical rows in identical order.
_LABEL_SORT_KEYS = ["term_norm", "class_uri", "match_type", "ontology"]


def _summarize_sorted_block(tbl: pa.Table):
    """(first_term, last_term, n_distinct, n_rows) of one sorted block —
    the only per-block state the driver needs to turn local dense ranks
    into exact global ids (O(#blocks) driver memory)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return None
    col = tbl.column("term_norm")
    return (col[0].as_py(), col[tbl.num_rows - 1].as_py(),
            pc.count_distinct(col).as_py(), tbl.num_rows)


def _attach_ids_sorted_block(tbl: pa.Table, start_id: int):
    """Dense-rank term_norm within one sorted block and shift by the
    block's global start id.  Returns (labels_block, [(id, term), ...])
    where the pair list is the block's distinct terms in id order (for
    the mgrep TSV)."""
    import numpy as np
    import pyarrow.compute as pc

    col = tbl.column("term_norm").combine_chunks()
    n = len(col)
    flags = np.zeros(n, dtype=np.int64)
    if n > 1:
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        flags[1:] = neq.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = start_id + np.cumsum(flags)
    out = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), col, tbl.column("class_uri"),
         tbl.column("ontology"), tbl.column("match_type")],
        schema=LABELS,
    )
    first_of_run = np.flatnonzero(np.concatenate(([1], flags[1:])))
    pairs = [(int(ids[i]), col[int(i)].as_py()) for i in first_of_run]
    return out, pairs


def _build_labels_distributed(exploded, out_dir: str,
                              write_mgrep_tsv: bool,
                              num_output_blocks: int | None = None):
    """Distributed A3: ONE Ray range-sort of the exploded label rows by
    the total order, then per-block dense-rank + exact global id offsets
    computed from O(#blocks) block summaries (first/last term + distinct
    count; a term run split across a block boundary is detected by
    first == previous last).  The driver never holds the vocabulary or
    the label table — it streams finished blocks, in order, into a
    single ParquetWriter (one row group per block).

    ``num_output_blocks`` exists for tests to force multi-block sorts
    (and therefore split runs) on small inputs."""
    import ray

    sorted_ds = exploded.sort(_LABEL_SORT_KEYS)
    if num_output_blocks:
        # order-preserving split (shuffle=False) so tests exercise the
        # boundary-continuation logic on dimension-scale fixtures
        sorted_ds = sorted_ds.repartition(num_output_blocks)
    refs = sorted_ds.to_arrow_refs()

    summarize = ray.remote(num_cpus=0.5)(_summarize_sorted_block)
    attach = ray.remote(num_cpus=0.5)(_attach_ids_sorted_block)

    summaries = ray.get([summarize.remote(r) for r in refs])

    # s_k = global id of block k's first term: the previous block's last
    # id, +1 unless block k continues the previous block's last run
    plan = []  # (block_ref, start_id, continues_previous_run)
    prev_last_term, prev_last_id = None, 0
    for ref, s in zip(refs, summaries):
        if s is None:
            continue
        first, last, n_distinct, _n = s
        cont = first == prev_last_term
        start = prev_last_id if cont else prev_last_id + 1
        plan.append((ref, start, cont))
        prev_last_id = start + n_distinct - 1
        prev_last_term = last
    n_terms = prev_last_id

    out_refs = [attach.remote(ref, start) for ref, start, _ in plan]
    n_labels = 0
    writer = pq.ParquetWriter(os.path.join(out_dir, "labels.parquet"),
                              LABELS)
    tsv_fh = (open(os.path.join(out_dir, "mgrep_dictionary.tsv"), "w")
              if write_mgrep_tsv else None)
    try:
        for out_ref, (_ref, _start, cont) in zip(out_refs, plan):
            tbl, pairs = ray.get(out_ref)
            writer.write_table(tbl)
            n_labels += tbl.num_rows
            if tsv_fh is not None:
                for i, (tid, term) in enumerate(pairs):
                    if cont and i == 0:
                        continue  # run started in the previous block
                    tsv_fh.write(f"{tid}\t{term}\n")
    finally:
        writer.close()
        if tsv_fh is not None:
            tsv_fh.close()
    return n_terms, n_labels


def _build_labels_driver(exploded, out_dir: str, write_mgrep_tsv: bool):
    """Driver-side A3 for dimension-sized dictionaries: distinct set +
    full label table fit comfortably in one process, so one pass beats a
    cluster sort.  Output (rows AND order) is identical to the
    distributed path — ``test_distributed_build_matches_driver_path``
    pins that."""
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
    labels_tbl = labels_tbl.sort_by([(k, "ascending")
                                     for k in ["term_id"]
                                     + _LABEL_SORT_KEYS[1:]])
    pq.write_table(labels_tbl, os.path.join(out_dir, "labels.parquet"))

    if write_mgrep_tsv:  # S2 parity artifact: ``id\tTERM`` lines
        with open(os.path.join(out_dir, "mgrep_dictionary.tsv"), "w") as fh:
            for t, i in sorted(term_ids.items(), key=lambda kv: kv[1]):
                fh.write(f"{i}\t{t}\n")
    return len(term_ids), labels_tbl.num_rows


def build_dictionary(classes_path: str, out_dir: str,
                     write_mgrep_tsv: bool = False,
                     force_distributed: bool | None = None,
                     num_output_blocks: int | None = None) -> dict:
    """classes.parquet → labels.parquet + isa_closure.parquet (+ TSV).

    Path selection: below ``DISTRIBUTED_CLASSES_THRESHOLD`` classes the
    driver-side distinct/enumerate path runs (broadcast-small-side
    pattern); above it, the distributed sort-rank path keeps the
    vocabulary and label table off the driver.  ``force_distributed``
    overrides the size trigger (tests force both paths on one input).

    Returns {'terms': n_distinct_terms, 'labels': n_rows,
    'closure': n_rows, 'path': 'driver'|'distributed'}."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    n_classes = pq.read_metadata(classes_path).num_rows
    distributed = (force_distributed if force_distributed is not None
                   else n_classes > DISTRIBUTED_CLASSES_THRESHOLD)
    classes = rd.read_parquet(classes_path,
                              columns=["class_uri", "ontology", "pref_label",
                                       "synonyms"])
    exploded = classes.map_batches(explode_labels, batch_format="pyarrow")

    if distributed:
        n_terms, n_labels = _build_labels_distributed(
            exploded, out_dir, write_mgrep_tsv, num_output_blocks)
    else:
        n_terms, n_labels = _build_labels_driver(
            exploded, out_dir, write_mgrep_tsv)

    # is-a closure (D7): min distance per (class, ancestor) (A2)
    parents_tbl = pq.read_table(classes_path, columns=["class_uri",
                                                       "parents"])
    parent_of = {u: list(p or []) for u, p in
                 zip(parents_tbl.column("class_uri").to_pylist(),
                     parents_tbl.column("parents").to_pylist())}
    clo_path = os.path.join(out_dir, "isa_closure.parquet")
    # rebuild guard for BOTH paths and BOTH prior shapes: the driver path
    # leaves a single FILE, the distributed path a DIRECTORY of part
    # files, and Ray 2.49's write_parquet defaults to APPEND — rebuilding
    # into a stale directory would silently duplicate closure rows, and a
    # driver rebuild over a stale directory would crash at pq.write_table
    if os.path.isdir(clo_path):
        shutil.rmtree(clo_path, ignore_errors=True)
    elif os.path.isfile(clo_path):
        os.remove(clo_path)
    if distributed:
        # the closure TABLE is the quadratic-ish object (10^8-10^9 rows
        # for a bushy 10^6-class ontology) — build and write it
        # distributed; only the class-dimension enumeration stays on the
        # driver (same documented small side as the label path above).
        # Output is a directory of part files under the same name —
        # pq.read_table handles file and directory alike, so
        # DictionaryState.from_dir needs no change.
        from ..ops.closure import transitive_closure

        uris = sorted(set(parent_of)
                      | {p for ps in parent_of.values() for p in ps})
        idx = {u: i for i, u in enumerate(uris)}
        child = [idx[u] for u, ps in parent_of.items() for _ in ps]
        parent = [idx[p] for ps in parent_of.values() for p in ps]
        clo_ds = transitive_closure(child, parent)
        lut = pa.array(uris)

        def back(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [lut.take(t.column("node").cast(pa.int32())),
                 lut.take(t.column("anc").cast(pa.int32())),
                 t.column("d").cast(pa.int32())],
                schema=ISA_CLOSURE)

        clo_ds = clo_ds.map_batches(back, batch_format="pyarrow")
        n_closure = clo_ds.count()
        clo_ds.write_parquet(clo_path)  # prior snapshot cleared above
    else:
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
        n_closure = closure_tbl.num_rows
        pq.write_table(closure_tbl, clo_path)

    return {"terms": n_terms, "labels": n_labels,
            "closure": n_closure,
            "path": "distributed" if distributed else "driver"}
