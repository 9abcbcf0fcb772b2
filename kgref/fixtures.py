"""Deterministic fixture synthesis (seed=42) — FIXTURES.md is the spec.

Mirrors the *structure* of the reference's test setup (test/test_case.rb
submits small fixture ontologies, builds the term cache + mgrep
dictionary once, then test_annotator.rb asserts exact classes/spans per
option permutation — ref:test/test_annotator.rb [H], SURVEY.md §5): two
mini-ontologies ONTA/ONTB with multi-word preferred labels, synonyms,
3–4-level is-a chains incl. a diamond (min-distance dedup), a label
colliding with a stop word, labels straddling the min_term_size
thresholds, a purely numeric label, cross-ontology mappings — plus a
transcripts table with the fixture phrases embedded in generated prose.

Goldens are produced by the independent brute-force oracle
(kgref.oracle), NOT by the pipeline code under test.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from . import oracle
from .schemas import (
    CLASSES,
    ISA_CLOSURE,
    LABELS,
    MAPPINGS,
    STOP_WORDS,
    TRANSCRIPTS,
    TRIPLES,
    AnnotateOptions,
)

SEED = 42

STOPWORDS = [
    "THE", "AND", "OF", "A", "TO", "IN", "FOR", "WITH", "ON", "BY", "DATA",
]

# ---------------------------------------------------------------------------
# Mini-ontology definitions.  Hand-crafted core (the behaviors §5 needs) +
# generated tail (so the dictionary is non-trivially sized).


def _onta() -> list[dict]:
    U = lambda n: f"http://fixture.test/ONTA#C{n:03d}"
    classes = [
        # root chain: C001 Resource > C002 Data Resource > C003 Aggregate Human Data
        dict(uri=U(1), pref="Information Resource", syn=[], sty=["T170"], par=[], cui="C0000001"),
        dict(uri=U(2), pref="Data Resource", syn=["Resource Of Data"], sty=["T170"],
             par=[U(1)], cui="C0000002"),
        dict(uri=U(3), pref="Aggregate Human Data", syn=["Aggregate Data Resource"],
             sty=["T170"], par=[U(2)], cui="C0000003"),
        dict(uri=U(4), pref="Human Data", syn=[], sty=["T170"], par=[U(2)], cui=""),
        # disease chain with diamond: C005 Disorder > {C006, C007} > C008;
        # C005 is ALSO a direct parent of C008 → ancestor at distance 1 and 2
        dict(uri=U(5), pref="Disorder", syn=["Disease"], sty=["T047"], par=[], cui="C0000005"),
        dict(uri=U(6), pref="Genetic Disorder", syn=[], sty=["T047"], par=[U(5)], cui=""),
        dict(uri=U(7), pref="Structural Disorder", syn=[], sty=["T047"], par=[U(5)], cui=""),
        dict(uri=U(8), pref="Chromosomal Aberration", syn=["Chromosomal Mutation"],
             sty=["T047"], par=[U(6), U(7), U(5)], cui="C0008625"),
        # stop-word-colliding label ("DATA" is in STOPWORDS)
        dict(uri=U(9), pref="Data", syn=[], sty=["T170"], par=[U(1)], cui=""),
        # short labels for min_term_size (3 / 6 / 10 chars)
        dict(uri=U(10), pref="DNA", syn=[], sty=["T028"], par=[], cui="C0012854"),
        dict(uri=U(11), pref="Genome", syn=[], sty=["T028"], par=[], cui="C0017428"),
        dict(uri=U(12), pref="Sequencing", syn=["Gene Sequencing"], sty=["T063"],
             par=[], cui=""),
        # purely numeric label (exclude_numbers)
        dict(uri=U(13), pref="2024", syn=[], sty=["T079"], par=[], cui=""),
        # shared surface across ontologies (term-set union U1)
        dict(uri=U(14), pref="Sample", syn=[], sty=["T167"], par=[], cui=""),
        # 4-level chain: C015 > C016 > C017 > C018
        dict(uri=U(15), pref="Process", syn=[], sty=["T038"], par=[], cui=""),
        dict(uri=U(16), pref="Biologic Process", syn=[], sty=["T038"], par=[U(15)], cui=""),
        dict(uri=U(17), pref="Gene Expression", syn=[], sty=["T038"], par=[U(16)], cui=""),
        dict(uri=U(18), pref="Gene Expression Profiling", syn=["Expression Profiling"],
             sty=["T063"], par=[U(17)], cui="C0040648"),
    ]
    rng = random.Random(SEED + 1)
    adjs = ["Clinical", "Genomic", "Pathology", "Molecular", "Cohort", "Imaging",
            "Surgical", "Oncology", "Pediatric", "Cardiac", "Neural"]
    nouns = ["Registry", "Repository", "Protocol", "Biomarker", "Specimen",
             "Workflow", "Archive", "Consortium", "Pipeline", "Atlas", "Census"]
    seen = {c["pref"] for c in classes}
    i = 19
    while i <= 40:
        lbl = f"{rng.choice(adjs)} {rng.choice(nouns)}"
        if lbl in seen:
            continue
        seen.add(lbl)
        syn = [f"{lbl} System"] if rng.random() < 0.3 else []
        sty = [rng.choice(["T170", "T047", "T063"])]
        par = [U(rng.randint(1, i - 1))] if rng.random() < 0.6 else []
        classes.append(dict(uri=U(i), pref=lbl, syn=syn, sty=sty, par=par, cui=""))
        i += 1
    for c in classes:
        c["ont"] = "ONTA"
    return classes


def _ontb() -> list[dict]:
    U = lambda n: f"http://fixture.test/ONTB#B{n:03d}"
    classes = [
        dict(uri=U(1), pref="Material Entity", syn=[], sty=["T167"], par=[], cui=""),
        dict(uri=U(2), pref="Tissue Sample", syn=["Tissue Specimen"], sty=["T024"],
             par=[U(1)], cui="C1292533"),
        dict(uri=U(3), pref="Blood Sample", syn=[], sty=["T024"], par=[U(1)], cui=""),
        # shared surface with ONTA#C014 ("Sample" → one term id, two classes)
        dict(uri=U(4), pref="Sample", syn=[], sty=["T167"], par=[U(1)], cui=""),
        # mapping targets
        dict(uri=U(5), pref="Chromosome Anomaly", syn=[], sty=["T047"], par=[], cui="C0008625"),
        dict(uri=U(6), pref="Population Data", syn=[], sty=["T170"], par=[], cui=""),
        dict(uri=U(7), pref="Genome Assembly", syn=[], sty=["T028"], par=[], cui=""),
    ]
    rng = random.Random(SEED + 2)
    adjs = ["Fixed", "Frozen", "Stained", "Cultured", "Archived", "Primary",
            "Reference", "Synthetic", "Curated", "Annotated"]
    nouns = ["Slide", "Culture", "Extract", "Aliquot", "Panel", "Assay",
             "Library", "Fraction", "Smear", "Batch", "Lysate"]
    seen = {c["pref"] for c in classes}
    i = 8
    while i <= 40:
        lbl = f"{rng.choice(adjs)} {rng.choice(nouns)}"
        if lbl in seen:
            continue
        seen.add(lbl)
        syn = [f"{lbl} Unit"] if rng.random() < 0.25 else []
        par = [U(rng.randint(1, i - 1))] if rng.random() < 0.5 else []
        classes.append(dict(uri=U(i), pref=lbl, syn=syn, sty=[rng.choice(["T024", "T167"])],
                            par=par, cui=""))
        i += 1
    for c in classes:
        c["ont"] = "ONTB"
    return classes


MAPPING_PAIRS = [
    # (ONTA class, ONTB class) — same-CUI / curated pairs
    ("http://fixture.test/ONTA#C008", "http://fixture.test/ONTB#B005"),
    ("http://fixture.test/ONTA#C003", "http://fixture.test/ONTB#B006"),
    ("http://fixture.test/ONTA#C011", "http://fixture.test/ONTB#B007"),
]


def ontology_classes() -> list[dict]:
    return _onta() + _ontb()


# ---------------------------------------------------------------------------
# Derived dictionary-side tables (≙ E2 create_term_cache +
# generate_dictionary_file, SURVEY.md §3; id assignment = A3:
# sort distinct upper(term), enumerate — deterministic).


def build_dictionary_tables(classes: list[dict]):
    rows_c = dict(class_uri=[], ontology=[], pref_label=[], synonyms=[],
                  semantic_types=[], parents=[], cui=[])
    label_rows: list[tuple[str, str, str, str]] = []  # (norm, uri, ont, mt)
    for c in classes:
        rows_c["class_uri"].append(c["uri"])
        rows_c["ontology"].append(c["ont"])
        rows_c["pref_label"].append(c["pref"])
        rows_c["synonyms"].append(c["syn"])
        rows_c["semantic_types"].append(c["sty"])
        rows_c["parents"].append(c["par"])
        rows_c["cui"].append(c["cui"])
        label_rows.append((c["pref"].upper(), c["uri"], c["ont"], "PREF"))
        for s in c["syn"]:
            label_rows.append((s.upper(), c["uri"], c["ont"], "SYN"))

    terms = sorted({norm for norm, *_ in label_rows})
    term_ids = {t: i for i, t in enumerate(terms)}  # A3 dense deterministic ids
    label_rows.sort(key=lambda r: (term_ids[r[0]], r[1], r[3]))
    labels = pa.Table.from_arrays(
        [
            pa.array([term_ids[r[0]] for r in label_rows], pa.int64()),
            pa.array([r[0] for r in label_rows], pa.string()),
            pa.array([r[1] for r in label_rows], pa.string()),
            pa.array([r[2] for r in label_rows], pa.string()),
            pa.array([r[3] for r in label_rows], pa.string()),
        ],
        schema=LABELS,
    )

    classes_t = pa.Table.from_arrays(
        [
            pa.array(rows_c["class_uri"], pa.string()),
            pa.array(rows_c["ontology"], pa.string()),
            pa.array(rows_c["pref_label"], pa.string()),
            pa.array(rows_c["synonyms"], pa.list_(pa.string())),
            pa.array(rows_c["semantic_types"], pa.list_(pa.string())),
            pa.array(rows_c["parents"], pa.list_(pa.string())),
            pa.array(rows_c["cui"], pa.string()),
        ],
        schema=CLASSES,
    )

    # is-a transitive closure: capped BFS, min distance (D7; the reference
    # instead walks parents per-request via SPARQL — expand_hierarchies [H])
    parents = {c["uri"]: list(c["par"]) for c in classes}
    crows = []
    for uri in parents:
        best: dict[str, int] = {}
        frontier = [uri]
        for dist in range(1, 11):
            nxt = []
            for u in frontier:
                for p in parents.get(u, ()):  # noqa: B023
                    if p not in best or dist < best[p]:
                        best[p] = dist
                        nxt.append(p)
            frontier = nxt
            if not frontier:
                break
        for anc, dist in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
            crows.append((uri, anc, dist))
    closure_t = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in crows], pa.string()),
            pa.array([r[1] for r in crows], pa.string()),
            pa.array([r[2] for r in crows], pa.int32()),
        ],
        schema=ISA_CLOSURE,
    )

    mrows = []
    for a, b in MAPPING_PAIRS:  # mappings are symmetric in the reference store
        mrows.append((a, b, "ONTB"))
        mrows.append((b, a, "ONTA"))
    mappings_t = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in mrows], pa.string()),
            pa.array([r[1] for r in mrows], pa.string()),
            pa.array([r[2] for r in mrows], pa.string()),
        ],
        schema=MAPPINGS,
    )

    stop_t = pa.Table.from_arrays([pa.array(STOPWORDS, pa.string())], schema=STOP_WORDS)
    return classes_t, labels, closure_t, mappings_t, stop_t, term_ids


# ---------------------------------------------------------------------------
# Transcripts synthesis


_FILLER = (
    "please review the latest run and confirm whether results look stable "
    "before we proceed further since several checks remain open while the "
    "team evaluates options across environments and prepares a short summary "
    "for tomorrow including metrics logs charts alerts owners timelines"
).split()

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "", "", "search", "browser", "calculator", "db_query"]


def _phrase_pool(classes: list[dict], rng: random.Random) -> list[str]:
    pool = []
    for c in classes:
        pool.append(c["pref"])
        pool.extend(c["syn"])
    # mixed-case + lowercase variants (M1), repeated-phrase turn handled below
    variants = []
    for p in pool:
        r = rng.random()
        if r < 0.3:
            variants.append(p.lower())
        elif r < 0.4:
            variants.append(p.upper())
        else:
            variants.append(p)
    # tricky cases: split phrase (must NOT match 3-word term, inner 2-word
    # still matches), embedded subword (matches only whole_word_only=False),
    # numeric, stop-word surface
    variants += [
        "aggregate. human data",
        "xDNAxx",
        "2024",
        "data",
        "dna",
        "chromosomal mutation",
        "aggregate human data and more aggregate human data",
    ]
    return variants


def conv_sizes(n_convs: int, rng: random.Random) -> list[int]:
    """Zipf-skewed: a few hot conversations, long tail of 2–20 turns."""
    sizes = []
    for i in range(n_convs):
        if i < max(1, n_convs // 100):
            sizes.append(rng.randint(200, 400))  # hot convs (salting path)
        elif i < n_convs // 20:
            sizes.append(rng.randint(40, 80))
        else:
            sizes.append(rng.randint(2, 20))
    return sizes


def build_transcripts(classes: list[dict], n_convs: int = 200, seed: int = SEED) -> pa.Table:
    rng = random.Random(seed)
    pool = _phrase_pool(classes, rng)
    base_ts = datetime.datetime(2024, 1, 1)
    conv, turn, role, text, tool, ts = [], [], [], [], [], []
    for ci, size in enumerate(conv_sizes(n_convs, rng)):
        cid = f"conv-{ci:06d}"
        for ti in range(size):
            words = [rng.choice(_FILLER) for _ in range(rng.randint(5, 20))]
            if rng.random() < 0.35:
                for _ in range(rng.randint(1, 3)):
                    pos = rng.randint(0, len(words))
                    words.insert(pos, rng.choice(pool))
            conv.append(cid)
            turn.append(ti)
            role.append(_ROLES[ti % 3])
            text.append(" ".join(words))
            tool.append(rng.choice(_TOOLS))
            ts.append(base_ts + datetime.timedelta(minutes=ti))
    return pa.Table.from_arrays(
        [
            pa.array(conv, pa.string()),
            pa.array(turn, pa.int32()),
            pa.array(role, pa.string()),
            pa.array(text, pa.string()),
            pa.array(tool, pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=TRANSCRIPTS,
    )


# ---------------------------------------------------------------------------
# Option permutations (FIXTURES.md §4) + golden generation via the oracle


def option_permutations() -> dict[str, AnnotateOptions]:
    perms = [
        AnnotateOptions(),
        AnnotateOptions(extra_stop_words=("DISORDER",)),
        AnnotateOptions(min_term_size=6),
        AnnotateOptions(min_term_size=10),
        AnnotateOptions(with_synonyms=False),
        AnnotateOptions(ontologies=("ONTA",)),
        AnnotateOptions(semantic_types=("T047",)),
        AnnotateOptions(expand_hierarchy_levels=1),
        AnnotateOptions(expand_hierarchy_levels=2),
        AnnotateOptions(expand_hierarchy_levels=3),
        AnnotateOptions(expand_hierarchy_levels=999),
        AnnotateOptions(expand_mappings=True),
        AnnotateOptions(longest_only=True),
        AnnotateOptions(exclude_numbers=True),
        AnnotateOptions(whole_word_only=False),
        AnnotateOptions(score="old"),
        AnnotateOptions(score="cvalue"),
        AnnotateOptions(score="cvalueh", score_threshold=1.5),
        AnnotateOptions(expand_hierarchy_levels=999, expand_mappings=True,
                        longest_only=True, min_term_size=4),
    ]
    return {o.key(): o for o in perms}


def oracle_dicts(classes: list[dict], term_ids: dict[str, int]):
    """Plain-dict views for the brute-force oracle (independent of
    DictionaryState — built straight from the fixture definitions)."""
    dictionary = dict(term_ids)
    term_classes: dict[int, list[tuple[str, str, str]]] = {}
    class_info: dict[str, tuple[str, str, str, tuple[str, ...]]] = {}
    parents: dict[str, list[str]] = {}
    for c in classes:
        class_info[c["uri"]] = (c["pref"], c["cui"], c["ont"], tuple(c["sty"]))
        parents[c["uri"]] = list(c["par"])
        term_classes.setdefault(term_ids[c["pref"].upper()], []).append(
            (c["uri"], c["ont"], "PREF")
        )
        for s in c["syn"]:
            term_classes.setdefault(term_ids[s.upper()], []).append(
                (c["uri"], c["ont"], "SYN")
            )
    closure: dict[str, list[tuple[str, int]]] = {}
    for uri in parents:
        best: dict[str, int] = {}
        frontier = [uri]
        for dist in range(1, 11):
            nxt = []
            for u in frontier:
                for p in parents.get(u, ()):
                    if p not in best or dist < best[p]:
                        best[p] = dist
                        nxt.append(p)
            frontier = nxt
        closure[uri] = sorted(best.items(), key=lambda kv: (kv[1], kv[0]))
    mappings: dict[str, list[tuple[str, str]]] = {}
    for a, b in MAPPING_PAIRS:
        mappings.setdefault(a, []).append((b, "ONTB"))
        mappings.setdefault(b, []).append((a, "ONTA"))
    return dictionary, term_classes, class_info, closure, mappings


def golden_triples(transcripts: pa.Table, classes: list[dict],
                   term_ids: dict[str, int]) -> pa.Table:
    dictionary, term_classes, class_info, closure, mappings = oracle_dicts(
        classes, term_ids
    )
    stops = frozenset(STOPWORDS)
    convs = transcripts.column("conv_id").to_pylist()
    turns = transcripts.column("turn_idx").to_pylist()
    texts = transcripts.column("text").to_pylist()
    all_rows: list[dict] = []
    for key, opts in option_permutations().items():
        for cid, ti, tx in zip(convs, turns, texts):
            rows = oracle.annotate_text_oracle(
                tx, dictionary, term_classes, class_info, closure, mappings,
                stops, opts, conv_id=cid, turn_idx=ti,
            )
            for r in rows:
                r["options_key"] = key
            all_rows.extend(rows)
    cols = [f.name for f in TRIPLES] + ["options_key"]
    arrays = []
    for name in cols:
        typ = TRIPLES.field(name).type if name != "options_key" else pa.string()
        arrays.append(pa.array([r[name] for r in all_rows], typ))
    return pa.Table.from_arrays(arrays, names=cols)


# ---------------------------------------------------------------------------
# Bundle writer


def write_fixture_bundle(root: str, n_convs: int = 200, seed: int = SEED,
                         with_goldens: bool = True,
                         transcript_files: int = 8) -> dict[str, str]:
    """Write dict tables + transcripts (+ goldens) under ``root``.
    Returns {'dict_dir', 'transcripts_dir', 'golden_path'}."""
    dict_dir = os.path.join(root, "dict", "v1")
    tr_dir = os.path.join(root, "transcripts")
    os.makedirs(dict_dir, exist_ok=True)
    os.makedirs(tr_dir, exist_ok=True)
    classes = ontology_classes()
    classes_t, labels_t, closure_t, mappings_t, stop_t, term_ids = (
        build_dictionary_tables(classes)
    )
    pq.write_table(classes_t, os.path.join(dict_dir, "classes.parquet"))
    pq.write_table(labels_t, os.path.join(dict_dir, "labels.parquet"))
    pq.write_table(closure_t, os.path.join(dict_dir, "isa_closure.parquet"))
    pq.write_table(mappings_t, os.path.join(dict_dir, "mappings.parquet"))
    pq.write_table(stop_t, os.path.join(dict_dir, "stop_words.parquet"))

    transcripts = build_transcripts(classes, n_convs=n_convs, seed=seed)
    # multi-file so reads parallelize; conv-contiguous slices
    n = transcripts.num_rows
    k = max(1, transcript_files)
    step = (n + k - 1) // k
    for i in range(k):
        sl = transcripts.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(tr_dir, f"part-{i:04d}.parquet"))

    out = {"dict_dir": dict_dir, "transcripts_dir": tr_dir, "golden_path": ""}
    if with_goldens:
        g = golden_triples(transcripts, classes, term_ids)
        gp = os.path.join(root, "golden_triples.parquet")
        pq.write_table(g, gp)
        out["golden_path"] = gp
    return out
