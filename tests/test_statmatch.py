"""Statistical (Mallet-style) recognizer engine: determinism, span
agreement with the dictionary engine on real corpus text, and the
pipeline-level plugin swap (SURVEY.md §2.10 — third engine through the
same seam as TermDictionary and RegexTermScanner)."""

import numpy as np
import pyarrow.parquet as pq

from kgref import docdict
from kgref.matcher import fold_upper
from kgref.statmatch import PerceptronTagger, StatisticalTermScanner, \
    _synth_corpus

SF = "/root/testdata/sf0.001"


def test_training_is_deterministic():
    terms = list(docdict.state().term_ids_by_norm)
    a = PerceptronTagger.train(_synth_corpus(terms))
    b = PerceptronTagger.train(_synth_corpus(terms))
    np.testing.assert_array_equal(a.weights, b.weights)
    assert a.weights.any()  # it actually learned something


def test_agreement_floor_on_real_corpus():
    """Quantified gate (the sketch-recall-floor pattern): span-level
    precision AND recall vs the dictionary engine must clear 0.95 on
    the real sf0.001 corpus.  Grounding makes false positives
    structurally rare (an emitted span must resolve through the term
    dictionary); recall measures what the MODEL proposes."""
    st = docdict.state()
    sc = StatisticalTermScanner(st.term_ids_by_norm)
    td = st.term_dictionary()
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    tp = fp = fn = 0
    for tx in texts[:200]:
        u = fold_upper(tx)
        want = {(m.term_id, m.start0, m.end0)
                for m in td.match_whole_word(u)}
        got = {(m.term_id, m.start0, m.end0) for m in sc.match(u)}
        tp += len(want & got)
        fp += len(got - want)
        fn += len(want - got)
    assert tp / max(1, tp + fp) >= 0.95, (tp, fp, fn)
    assert tp / max(1, tp + fn) >= 0.95, (tp, fp, fn)


def test_unseen_background_defaults_to_O():
    """Tokens never seen in training must argmax to O (class order +
    zero weights), so random real-world vocabulary cannot fire spans."""
    st = docdict.state()
    sc = StatisticalTermScanner(st.term_ids_by_norm)
    assert sc.match("ZZGIBBERISH WORDS NOWHERE IN ANY LEXICON QQ") == []


def test_pipeline_plugin_swap_statistical(ray_session, fixture_bundle):
    """build_triples(recognizer=StatisticalAnnotateTriples) over the
    fixture bundle produces the exact triple set of the default
    engine (the fixture dictionary has only word-edged terms, so the
    engines' reachable match sets coincide)."""
    import pyarrow as pa
    import ray

    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.schemas import AnnotateOptions, PipelineConfig
    from kgref.sources.transcripts import read_transcripts
    from kgref.stages.annotate import (AnnotateTriples,
                                       StatisticalAnnotateTriples)
    from kgref.state.dictionary import DictionaryState

    opts = AnnotateOptions()
    state_ref = ray.put(
        DictionaryState.from_dir(fixture_bundle["dict_dir"]))
    cfg = PipelineConfig(batch_size=512, annotate_concurrency=2)

    def collect(recognizer):
        ds = read_transcripts(fixture_bundle["transcripts_dir"])
        t = build_triples(ds, state_ref, opts, cfg,
                          recognizer=recognizer)
        tbl = pa.Table.from_pylist(t.take_all())
        return {tuple(r[c] for c in ("conv_id", "turn_idx", "from_1b",
                                     "to_1b", "pred", "obj"))
                for r in tbl.to_pylist()}

    default = collect(AnnotateTriples)
    stat = collect(StatisticalAnnotateTriples)
    assert default and default == stat
