"""Incremental re-annotation on a dictionary delta — the ONTOLOGY-side
half of resumability (the north rule's checkpoint story covers the
corpus side via manifest resume, kgref/stages/materialize.py; this op
covers the other production event: the ontology RELEASES a new version
and 100 TB of cached annotations must not be recomputed from scratch).

Semantics (≙ the reference redeploy flow: a new ontology submission
triggers a dictionary rebuild and full re-annotation,
ref:lib/ncbo_annotator/dictionary.rb [M] — the reference recomputes
everything; this op is the scale path it lacks):

  v2 dictionary = v1 + DELTA_CLASSES (new classes with new label rows).
  A turn's annotation output depends ONLY on the label SURFACES present
  in its text (direct matches; expansions derive from direct matches
  against the UNCHANGED closure/mapping tables), so a turn containing
  no changed surface annotates identically under v1 and v2.  Therefore:

    full-v2(corpus) == cached-v1(unaffected turns) ∪ v2(affected turns)

  where affected = turns matching ANY label surface owned by a delta
  class (shared surfaces included — if a delta class re-uses an
  existing surface, that surface's class set changed, so its turns are
  affected and get recomputed).

The driver gate makes that equation the oracle: ``annotate_incremental``
returns the incremental union and is hash-compared against the plain
full-run SQL oracle (``annotate_oracle_sql`` at hier2+mappings — the
flagship option shape).  A hash PASS is a machine-checked proof that
the delta path loses and invents nothing.

Scale design (three streaming passes, no full recompute):

1. PROBE — annotate the corpus with a dictionary containing ONLY the
   changed surfaces (a few label rows): same actor-pool matcher, tiny
   automaton, output projected to distinct (conv, turn) keys per batch
   before anything moves.  Cost ≈ one cheap scan (at 100 TB you'd skip
   even this by consulting the inverted index, kgref/ops/invindex.py —
   probe cost then O(delta-term posting lists), not O(corpus); the scan
   probe is the index-free fallback).
2. REUSE — read the cached v1 triples (Parquet, written by the prior
   run; simulated here by materializing the v1 run once to a temp dir)
   and anti-filter the affected keys per batch.
3. RECOMPUTE — filter the transcripts to affected turns (per-batch
   ``pc.is_in`` against the broadcast key set) and annotate ONLY those
   with the v2 dictionary.

The affected-key set is broadcast via ``ray.put`` (one object-store
copy, read per batch — never re-shipped): it is DELTA-dimension
bounded (turns containing a changed surface), the op's own output
dimension, like the contamination benchmark set and the dup-spans
heavy-gram set.  If an ontology delta ever touched a constant fraction
of the corpus, the broadcast flips to the hash-bucketed semi/anti-join
(kgref/ops/relational.py machinery) and passes 2–3 are unchanged —
at that point the incremental path degrades gracefully toward the full
recompute it replaces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import docdict
from ..schemas import AnnotateOptions
from ..state.dictionary import DictionaryState

# The v2-only classes.  Multi-word, unshared surfaces ("hash join",
# "table scan") so the affected-turn set is a strict, non-trivial
# subset of the corpus (asserted in tests/test_incremental.py).
DELTA_CLASSES = ("HashJoin", "TableScan")

# Flagship option shape: hierarchy + mapping expansion both ride the
# delta (new direct matches fan out through closure and mappings).
_OPTS = AnnotateOptions(expand_hierarchy_levels=2, expand_mappings=True)


def _split_tables():
    """(full tables, v1 labels, probe labels): v1 drops the delta
    classes' label rows; the probe keeps every row whose SURFACE is
    owned by a delta class (shared surfaces included)."""
    t = docdict.tables()
    labels = t["labels"]
    delta_uris = pa.array(sorted(docdict._uri(n) for n in DELTA_CLASSES))
    is_delta = pc.is_in(labels.column("class_uri"), value_set=delta_uris)
    delta_terms = pc.unique(labels.filter(is_delta).column("term_norm"))
    v1_labels = labels.filter(pc.invert(is_delta))
    probe_labels = labels.filter(
        pc.is_in(labels.column("term_norm"), value_set=delta_terms))
    return t, v1_labels, probe_labels


def _state_of(t: dict, labels: pa.Table, version: str) -> DictionaryState:
    return DictionaryState.from_tables(
        t["classes"], labels, t["isa_closure"], t["mappings"],
        t["stop_words"], version=version)


def _turn_keys(batch: pa.Table) -> pa.Array:
    """'conv_id/turn_idx' — the per-turn recompute granularity."""
    conv = batch.column("conv_id")
    if pa.types.is_dictionary(conv.type):
        conv = pc.cast(conv, pa.string())
    return pc.binary_join_element_wise(
        conv, pc.cast(batch.column("turn_idx"), pa.string()), "/")


def _affected_keys(ds, probe_state, cfg) -> pa.Array:
    """PROBE pass: distinct turn keys matching any changed surface.
    Per-batch distinct (combiner) before the driver union, so the
    driver sees one row per affected turn per batch, never per match."""
    import numpy as np
    import ray

    from ..pipelines.annotate_pipeline import build_triples

    probe = build_triples(ds, ray.put(probe_state), AnnotateOptions(), cfg)

    def keys_of(b: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(_turn_keys(b)))
        return pa.Table.from_arrays([pa.array(k, pa.string())],
                                    names=["key"])

    keys: set[str] = set()
    for b in (probe.map_batches(keys_of, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        keys.update(b.column("key").to_pylist())
    return pa.array(sorted(keys), pa.string())


def annotate_incremental(sf_dir: str):
    """cached-v1 ∪ recomputed-v2(affected) — hash-gated against the
    full-v2 oracle (same TRIPLES schema as every annotate query)."""
    import tempfile

    import ray
    import ray.data as rd

    from ..pipelines.annotate_pipeline import build_triples
    from ..queries import _CFG, _plain_strings  # runtime: no import cycle
    from ..sources.transcripts import documents_as_transcripts

    t, v1_labels, probe_labels = _split_tables()
    v1_state = _state_of(t, v1_labels, "docdict-v0")
    probe_state = _state_of(t, probe_labels, "docdict-delta-probe")

    ds = documents_as_transcripts(sf_dir,
                                  turns_per_conv=docdict.TURNS_PER_CONV)

    # 1. PROBE: which turns contain a changed surface?
    affected = ray.put(_affected_keys(ds, probe_state, _CFG))

    # 2. REUSE: the cached v1 output.  A prior production run would have
    # left this on disk (stages/materialize.py); the demo materializes
    # the v1 run once to a temp dir so the reuse path reads REAL cached
    # Parquet, not a live recompute dressed up as one.
    cache_dir = tempfile.mkdtemp(prefix="kgref_incr_v1_")
    (build_triples(ds, ray.put(v1_state), _OPTS, _CFG)
     .map_batches(_plain_strings, batch_format="pyarrow")
     .write_parquet(cache_dir))

    def drop_affected(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(
            pc.is_in(_turn_keys(b), value_set=ray.get(affected))))

    kept = (rd.read_parquet(cache_dir)
            .map_batches(drop_affected, batch_format="pyarrow"))

    # 3. RECOMPUTE: v2-annotate ONLY the affected turns.
    def keep_affected(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(_turn_keys(b), value_set=ray.get(affected)))

    fresh = (build_triples(ds.map_batches(keep_affected,
                                          batch_format="pyarrow"),
                           ray.put(docdict.state()), _OPTS, _CFG)
             .map_batches(_plain_strings, batch_format="pyarrow"))

    return kept.union(fresh)


def annotate_incremental_sql() -> str:
    """The oracle IS the full-v2 run: incremental must reproduce it."""
    from ..queries import annotate_oracle_sql

    return annotate_oracle_sql(_OPTS)


def register(q: dict, o: dict | None = None) -> None:
    q["annotate_incremental"] = annotate_incremental
    if o is not None:
        o["annotate_incremental"] = annotate_incremental_sql()
