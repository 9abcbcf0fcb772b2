"""Arrow schemas + option dataclasses for every logical table (SURVEY.md §1.1).

One fixed, explicit ``pyarrow.Schema`` per logical table D1–D10; every
stage states its output schema.  The reference has no schema system at
all (dynamic Ruby + string-encoded Redis values); these schemas are the
columnar re-expression of its record shapes:

- TRANSCRIPTS  ≙ D1  input text rows   (shape mandated by BASELINE.json input_hint)
- CLASSES      ≙ D6  ontology classes  (ref:lib/ncbo_annotator.rb
                     create_term_cache_for_submission [H] — prefLabel,
                     synonym, semanticType, cui, parents per class)
- LABELS       ≙ D2+D3  Redis dict + term cache, denormalized
                     (ref:lib/ncbo_annotator.rb create_term_entry /
                     generate_dictionary_file [H])
- MATCHES      ≙ D4  raw mgrep match lines ``id\tfrom\tto\tword``
                     (ref:lib/ncbo_annotator/mgrep/mgrep.rb [H];
                     1-based inclusive char offsets)
- ANNOTATIONS  ≙ D5 (direct part)  one row per (turn, span, class)
- ISA_CLOSURE  ≙ D7  precomputed transitive closure (the reference walks
                     parents per-request via SPARQL: expand_hierarchies [H])
- MAPPINGS     ≙ D8  inter-ontology mappings (expand_mappings [M])
- STOP_WORDS   ≙ D9
- TRIPLES      ≙ D5/D10 flattened output edges (north_star shape)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# D1 — input transcripts (BASELINE.json input_hint, authoritative)
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# D6 — ontology classes
CLASSES = pa.schema(
    [
        ("class_uri", pa.string()),
        ("ontology", pa.string()),
        ("pref_label", pa.string()),
        ("synonyms", pa.list_(pa.string())),
        ("semantic_types", pa.list_(pa.string())),
        ("parents", pa.list_(pa.string())),
        ("cui", pa.string()),
    ]
)

# D2+D3 — denormalized dictionary: one row per (term, class)
LABELS = pa.schema(
    [
        ("term_id", pa.int64()),
        ("term_norm", pa.string()),  # UPPERCASED surface form
        ("class_uri", pa.string()),
        ("ontology", pa.string()),
        ("match_type", pa.string()),  # 'PREF' | 'SYN'
    ]
)

# D7 — is-a transitive closure, min distance per (class, ancestor)
ISA_CLOSURE = pa.schema(
    [
        ("class_uri", pa.string()),
        ("ancestor_uri", pa.string()),
        ("distance", pa.int32()),  # direct parent = 1
    ]
)

# D8 — inter-ontology mappings
MAPPINGS = pa.schema(
    [
        ("class_uri", pa.string()),
        ("mapped_class_uri", pa.string()),
        ("mapped_ontology", pa.string()),
    ]
)

# D9 — stop words (UPPERCASED)
STOP_WORDS = pa.schema([("word", pa.string())])

# D4 — raw matches (mgrep TSV line equivalent).  Offsets are kept in the
# reference's 1-based inclusive convention (mgrep parity) AND 0-based
# half-open for pythonic slicing: text[from0:to0] == matched_text region.
MATCHES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("term_id", pa.int64()),
        ("from_1b", pa.int32()),
        ("to_1b", pa.int32()),
        ("matched_text", pa.string()),  # original-case surface slice
    ]
)

# D5 (direct part) — one row per (turn, span, class) after term→class
# resolution and class-level filters
ANNOTATIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("class_uri", pa.string()),
        ("ontology", pa.string()),
        ("match_type", pa.string()),
        ("from_1b", pa.int32()),
        ("to_1b", pa.int32()),
        ("matched_text", pa.string()),
    ]
)

# D5/D10 — flat triple rows (north_star output shape).  subj encodes the
# annotated span; conv_id/turn_idx repeated as columns for partitioning.
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),  # "<conv_id>/<turn_idx>/<from_1b>-<to_1b>"
        ("pred", pa.string()),  # annotated_with | isa_closure | mapped_to
        ("obj", pa.string()),  # class URI
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("from_1b", pa.int32()),
        ("to_1b", pa.int32()),
        ("match_type", pa.string()),  # PREF | SYN ('' for expansion rows)
        ("matched_text", pa.string()),
        ("distance", pa.int32()),  # 0 direct, ≥1 isa_closure, 0 mapped_to
        ("pref_label", pa.string()),  # canonicalized label of obj
        ("cui", pa.string()),  # CUI of obj ('' when absent)
        ("score", pa.float64()),  # 0.0 unless options.score enabled
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def subj_of(conv_id: str, turn_idx: int, from_1b: int, to_1b: int) -> str:
    return f"{conv_id}/{turn_idx}/{from_1b}-{to_1b}"


# ---------------------------------------------------------------------------
# Options — mirrors the reference's per-request options dict
# (annotate(text, options) ref:lib/ncbo_annotator.rb [H]).  Defaults are the
# reference defaults: whole-word matching on, synonyms on, no expansion,
# no scoring (SURVEY.md §2.10).


@dataclass(frozen=True)
class AnnotateOptions:
    whole_word_only: bool = True  # M3 (mgrep 'longword' client flag)
    with_synonyms: bool = True  # M8 (REST exclude_synonyms inverted)
    min_term_size: int = 0  # M4 (0 = off; REST default none)
    use_stop_words: bool = True  # M5 (default config list applies)
    extra_stop_words: tuple[str, ...] = ()  # M5 per-request override/add
    exclude_numbers: bool = False  # M6
    longest_only: bool = False  # M7 / O2
    ontologies: tuple[str, ...] = ()  # M9 (() = all)
    semantic_types: tuple[str, ...] = ()  # M10 (() = all)
    expand_hierarchy_levels: int = 0  # J2: 0=off, 999≙full closure
    expand_mappings: bool = False  # J3
    score: str = ""  # A4: '' | 'old' | 'cvalue' | 'cvalueh'
    score_threshold: float = 0.0  # A4 filter (applied when score != '')

    def key(self) -> str:
        """Stable short key for golden bookkeeping (FIXTURES.md §4)."""
        parts = []
        if not self.whole_word_only:
            parts.append("subword")
        if not self.with_synonyms:
            parts.append("nosyn")
        if self.min_term_size:
            parts.append(f"mts{self.min_term_size}")
        if not self.use_stop_words:
            parts.append("nostop")
        if self.extra_stop_words:
            parts.append("stop+" + "-".join(sorted(self.extra_stop_words)))
        if self.exclude_numbers:
            parts.append("nonum")
        if self.longest_only:
            parts.append("longest")
        if self.ontologies:
            parts.append("ont:" + "-".join(self.ontologies))
        if self.semantic_types:
            parts.append("st:" + "-".join(self.semantic_types))
        if self.expand_hierarchy_levels:
            parts.append(f"hier{self.expand_hierarchy_levels}")
        if self.expand_mappings:
            parts.append("map")
        if self.score:
            parts.append(f"score-{self.score}")
        return "default" if not parts else "+".join(parts)


@dataclass(frozen=True)
class PipelineConfig:
    """Frozen job config ≙ the reference's ``Annotator.config`` DSL
    (ref:lib/ncbo_annotator/config.rb [H]) re-expressed for a batch job."""

    dict_dir: str = ""  # directory with classes/labels/... parquet
    out_dir: str = "/tmp/kgref-out"
    num_buckets: int = 64  # output partitioning: hash(conv_id) % B
    waves: int = 1  # checkpoint granularity: buckets are processed in
    # `waves` sequential waves; each wave's manifests land before the
    # next starts, so a crash loses at most 1/waves of the run.  Tradeoff:
    # each wave restarts the annotate actor pool (~seconds) and re-scans
    # the (column-pruned) input — noise at cluster scale, so jobs at
    # 10^12 turns should run waves ≫ 1; local benches keep 1.
    batch_size: int = 1024  # rows per matcher batch (match fan-out aware)
    annotate_concurrency: int | tuple[int, int] = 4  # actor pool size
    hot_conv_rows: int = 50_000  # salting threshold (TURNS per conv —
    # counted on the input conv_id column before the fan-out)
    salt_chunk: int = 8_192  # range-salt: salt = turn_idx // salt_chunk
    options: AnnotateOptions = field(default_factory=AnnotateOptions)
