"""Full annotate-semantics parity: pipeline batch function vs brute-force
oracle goldens, per option permutation (the reference's test_annotator.rb
option matrix — SURVEY.md §5).  Pure functions, no Ray."""

import pyarrow.parquet as pq
import pytest

from kgref.fixtures import option_permutations
from kgref.stages.annotate import annotate_rows
from kgref.state.dictionary import DictionaryState


def _triple_set(table, with_score=False):
    cols = ["subj", "pred", "obj", "match_type", "distance", "matched_text",
            "pref_label", "cui"]
    if with_score:
        cols.append("score")
    rows = set()
    data = {c: table.column(c).to_pylist() for c in cols}
    for i in range(table.num_rows):
        rows.add(tuple(data[c][i] for c in cols))
    return rows


@pytest.fixture(scope="module")
def env(fixture_bundle):
    state = DictionaryState.from_dir(fixture_bundle["dict_dir"])
    import glob

    tr = pq.read_table(sorted(glob.glob(fixture_bundle["transcripts_dir"] + "/*.parquet")))
    golden = pq.read_table(fixture_bundle["golden_path"])
    return state, tr, golden


@pytest.mark.parametrize("key", list(option_permutations().keys()))
def test_option_permutation_matches_golden(env, key):
    state, tr, golden = env
    opts = option_permutations()[key]
    got = annotate_rows(
        tr.column("conv_id").to_pylist(),
        tr.column("turn_idx").to_pylist(),
        tr.column("text").to_pylist(),
        state,
        opts,
    )
    import pyarrow.compute as pc

    want = golden.filter(pc.equal(golden["options_key"], key))
    with_score = bool(opts.score)
    g, w = _triple_set(got, with_score), _triple_set(want, with_score)
    assert g == w, (
        f"{key}: missing={list(w - g)[:5]} extra={list(g - w)[:5]} "
        f"(|got|={len(g)} |want|={len(w)})"
    )


@pytest.mark.parametrize("key", list(option_permutations().keys()))
def test_regex_recognizer_matches_golden(env, key):
    """Second recognizer (RegexTermScanner via the match_fn seam) must
    reproduce the brute-force oracle goldens for every option
    permutation — proves the plugin surface carries full semantics."""
    from kgref.matcher import RegexTermScanner

    state, tr, golden = env
    opts = option_permutations()[key]
    scanner = RegexTermScanner(state.term_dictionary().term_ids_by_norm)
    got = annotate_rows(
        tr.column("conv_id").to_pylist(),
        tr.column("turn_idx").to_pylist(),
        tr.column("text").to_pylist(),
        state,
        opts,
        match_fn=scanner.match,
    )
    import pyarrow.compute as pc

    want = golden.filter(pc.equal(golden["options_key"], key))
    with_score = bool(opts.score)
    g, w = _triple_set(got, with_score), _triple_set(want, with_score)
    assert g == w, (
        f"{key}: missing={list(w - g)[:5]} extra={list(g - w)[:5]} "
        f"(|got|={len(g)} |want|={len(w)})"
    )


@pytest.mark.parametrize("variant", [
    dict(),
    dict(expand_hierarchy_levels=2),
    dict(expand_hierarchy_levels=999, expand_mappings=True),
    dict(longest_only=True, min_term_size=4, expand_mappings=True),
    dict(whole_word_only=False, expand_hierarchy_levels=1),
])
@pytest.mark.parametrize("score", ["", "old", "cvalue", "cvalueh"])
def test_fast_path_equals_reference_loop(env, variant, score):
    """Differential check: the vectorized template fan-out (the only
    production path, scored or not) must emit exactly the rows — and,
    when scoring, exactly the score VALUES — of the per-row reference
    loop (annotate_rows_loop, the executable emission spec)."""
    from kgref.schemas import AnnotateOptions
    from kgref.stages.annotate import annotate_rows_loop

    state, tr, _ = env
    args = (tr.column("conv_id").to_pylist(),
            tr.column("turn_idx").to_pylist(),
            tr.column("text").to_pylist(), state)
    opts = AnnotateOptions(score=score, **variant)

    def rowset(fn):
        t = fn(*args, opts)
        cols = ["subj", "pred", "obj", "match_type", "distance",
                "matched_text", "pref_label", "cui"]
        if score:
            cols.append("score")
        data = {c: t.column(c).to_pylist() for c in cols}
        rows = [tuple(data[c][i] for c in cols) for i in range(t.num_rows)]
        assert len(rows) == len(set(rows))  # no duplicate emission
        return set(rows)

    fast, loop = rowset(annotate_rows), rowset(annotate_rows_loop)
    assert fast == loop, (
        f"missing={list(loop - fast)[:3]} extra={list(fast - loop)[:3]}")


def test_score_threshold_filters_in_fast_path(env):
    """The A4 threshold must filter identically in the vectorized path
    and the reference loop (non-trivial: the fast path masks numpy
    arrays pre-table, the loop filters the built table)."""
    from kgref.schemas import AnnotateOptions
    from kgref.stages.annotate import annotate_rows_loop

    state, tr, _ = env
    args = (tr.column("conv_id").to_pylist(),
            tr.column("turn_idx").to_pylist(),
            tr.column("text").to_pylist(), state)
    opts = AnnotateOptions(score="cvalueh", expand_hierarchy_levels=2,
                           score_threshold=5.0)
    fast = annotate_rows(*args, opts)
    loop = annotate_rows_loop(*args, opts)
    assert fast.num_rows == loop.num_rows > 0
    unfiltered = annotate_rows(
        *args, AnnotateOptions(score="cvalueh", expand_hierarchy_levels=2))
    assert unfiltered.num_rows > fast.num_rows  # the threshold fired
    assert min(fast.column("score").to_pylist()) >= 5.0


def test_template_registry_is_reusable_across_batches(env):
    """Actor-lifetime template cache: annotating two disjoint halves
    with ONE shared registry must equal fresh-registry runs — including
    the second half, whose output dictionaries come from a registry
    already grown by the first half."""
    from kgref.schemas import AnnotateOptions
    from kgref.stages.annotate import TemplateRegistry

    state, tr, _ = env
    opts = AnnotateOptions(expand_hierarchy_levels=999, expand_mappings=True)
    convs = tr.column("conv_id").to_pylist()
    turns = tr.column("turn_idx").to_pylist()
    texts = tr.column("text").to_pylist()
    h = len(texts) // 2
    shared = TemplateRegistry(state, opts)

    def rowset(t):
        cols = ["subj", "pred", "obj", "match_type", "distance",
                "matched_text", "pref_label", "cui"]
        data = {c: t.column(c).to_pylist() for c in cols}
        return {tuple(data[c][i] for c in cols) for i in range(t.num_rows)}

    for lo, hi in [(0, h), (h, len(texts))]:
        cached = annotate_rows(convs[lo:hi], turns[lo:hi], texts[lo:hi],
                               state, opts, registry=shared)
        fresh = annotate_rows(convs[lo:hi], turns[lo:hi], texts[lo:hi],
                              state, opts)
        assert rowset(cached) == rowset(fresh)
    assert len(shared.tmpl_slice) > 0  # the cache actually filled


def _mini_state(stop_words=()):
    """Tiny DictionaryState via from_tables (so the stop-word fold path
    under test is the real one), one term with an expanding case map."""
    import pyarrow as pa

    from kgref.matcher import fold_upper

    norm = fold_upper("Straße")  # 'STRAßE' (NOT 'STRASSE')
    classes = pa.table({
        "class_uri": ["C1"], "ontology": ["ONT"], "pref_label": ["Street"],
        "cui": ["CUI1"], "semantic_types": [["T1"]]})
    labels = pa.table({
        "term_id": pa.array([0], pa.int64()), "term_norm": [norm],
        "class_uri": ["C1"], "ontology": ["ONT"], "match_type": ["PREF"]})
    empty_clo = pa.table({
        "class_uri": pa.array([], pa.string()),
        "ancestor_uri": pa.array([], pa.string()),
        "distance": pa.array([], pa.int32())})
    empty_map = pa.table({
        "class_uri": pa.array([], pa.string()),
        "mapped_class_uri": pa.array([], pa.string()),
        "mapped_ontology": pa.array([], pa.string())})
    stops = pa.table({"word": pa.array(list(stop_words), pa.string())})
    return DictionaryState.from_tables(classes, labels, empty_clo,
                                       empty_map, stops)


@pytest.mark.parametrize("via", ["default_list", "extra_stop_words"])
def test_stop_word_with_expanding_case_map_fires(via):
    """ADVICE round 2: stop words folded with str.upper() ('straße' →
    'STRASSE') could never equal the fold_upper surface ('STRAßE'), so
    the M5 filter silently missed non-ASCII stop words.  Both the
    default-list and per-call paths must use the same fold."""
    from kgref.schemas import AnnotateOptions

    texts = ["die Straße ist lang"]
    if via == "default_list":
        state = _mini_state(stop_words=("straße",))
        opts = AnnotateOptions()
    else:
        state = _mini_state()
        opts = AnnotateOptions(extra_stop_words=("straße",))

    control = annotate_rows(["c0"], [0], texts, _mini_state(),
                            AnnotateOptions())
    assert control.num_rows == 1  # the term matches without the stop word
    got = annotate_rows(["c0"], [0], texts, state, opts)
    assert got.num_rows == 0  # the folded stop word filters it
