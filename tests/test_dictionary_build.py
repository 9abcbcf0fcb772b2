"""Dictionary build job (E2): ids are dense/deterministic, labels round
trip into a DictionaryState equivalent to the fixture-built one, the
closure matches the BFS the fixtures compute, and the mgrep TSV has the
reference's ``id\tTERM`` shape."""

import os

import pyarrow.parquet as pq
import pytest

from kgref.pipelines.dictionary_build import build_dictionary
from kgref.state.dictionary import DictionaryState


@pytest.fixture(scope="module")
def built(ray_session, fixture_bundle, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dict_build"))
    classes_path = os.path.join(fixture_bundle["dict_dir"], "classes.parquet")
    metrics = build_dictionary(classes_path, out, write_mgrep_tsv=True)
    return out, classes_path, metrics


def test_ids_dense_and_deterministic(built):
    out, _cp, metrics = built
    labels = pq.read_table(os.path.join(out, "labels.parquet"))
    ids = sorted(set(labels.column("term_id").to_pylist()))
    assert ids == list(range(1, metrics["terms"] + 1))
    # sorted-term order == id order (A3 determinism)
    by_id = {}
    for tid, t in zip(labels.column("term_id").to_pylist(),
                      labels.column("term_norm").to_pylist()):
        by_id[tid] = t
    assert list(by_id[i] for i in ids) == sorted(by_id.values())


def test_matches_fixture_dictionary_tables(built, fixture_bundle):
    out, _cp, _m = built
    want = pq.read_table(os.path.join(fixture_bundle["dict_dir"],
                                      "labels.parquet"))
    got = pq.read_table(os.path.join(out, "labels.parquet"))
    key = lambda t: sorted(zip(t.column("term_norm").to_pylist(),
                               t.column("class_uri").to_pylist(),
                               t.column("match_type").to_pylist()))
    assert key(got) == key(want)
    wc = pq.read_table(os.path.join(fixture_bundle["dict_dir"],
                                    "isa_closure.parquet"))
    gc = pq.read_table(os.path.join(out, "isa_closure.parquet"))
    ckey = lambda t: sorted(zip(t.column("class_uri").to_pylist(),
                                t.column("ancestor_uri").to_pylist(),
                                t.column("distance").to_pylist()))
    assert ckey(gc) == ckey(wc)


def test_state_loads_from_built_dir(built, fixture_bundle):
    out, _cp, _m = built
    # complete the snapshot dir with the tables the build doesn't own
    for name in ("classes", "mappings", "stop_words"):
        src = os.path.join(fixture_bundle["dict_dir"], f"{name}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out,
                                                        f"{name}.parquet"))
    st = DictionaryState.from_dir(out)
    assert len(st.term_ids_by_norm) > 0
    td = st.term_dictionary()
    assert td.match("AGGREGATE HUMAN DATA IS HERE".upper())


def test_distributed_build_matches_driver_path(built, tmp_path):
    """VERDICT r2 task 10: the size-triggered distributed sort-rank path
    must emit the SAME labels table (rows and order) and the same mgrep
    TSV bytes as the driver path.  num_output_blocks=7 forces the sorted
    run to split across block boundaries so the continuation logic
    (first-term == previous-last-term) is actually exercised."""
    out, classes_path, driver_metrics = built
    assert driver_metrics["path"] == "driver"
    out2 = os.path.join(str(tmp_path), "dist")
    m2 = build_dictionary(classes_path, out2, write_mgrep_tsv=True,
                          force_distributed=True, num_output_blocks=7)
    assert m2["path"] == "distributed"
    for k in ("terms", "labels", "closure"):
        assert m2[k] == driver_metrics[k], (k, m2, driver_metrics)
    want = pq.read_table(os.path.join(out, "labels.parquet")).combine_chunks()
    got = pq.read_table(os.path.join(out2, "labels.parquet")).combine_chunks()
    assert got.equals(want)
    assert (open(os.path.join(out2, "mgrep_dictionary.tsv")).read()
            == open(os.path.join(out, "mgrep_dictionary.tsv")).read())
    # r4: the distributed closure (iterative relaxation, directory of
    # part files) must equal the driver BFS row-for-row
    ckey = lambda t: sorted(zip(t.column("class_uri").to_pylist(),
                                t.column("ancestor_uri").to_pylist(),
                                t.column("distance").to_pylist()))
    wc = pq.read_table(os.path.join(out, "isa_closure.parquet"))
    gc = pq.read_table(os.path.join(out2, "isa_closure.parquet"))
    assert os.path.isdir(os.path.join(out2, "isa_closure.parquet"))
    assert ckey(gc) == ckey(wc)


def test_rebuild_any_direction_starts_clean(built, tmp_path):
    """ADVICE r4 (medium): Ray 2.49 ``write_parquet`` APPENDs into an
    existing directory by default, so a re-run into the same out_dir must
    clear the prior closure snapshot whichever SHAPE it has: distributed
    over distributed used to silently DOUBLE isa_closure rows, and a
    driver rebuild over a distributed DIRECTORY used to crash at
    pq.write_table."""
    out, classes_path, driver_metrics = built
    out2 = os.path.join(str(tmp_path), "re")
    m1 = build_dictionary(classes_path, out2, force_distributed=True,
                          num_output_blocks=7)
    m2 = build_dictionary(classes_path, out2, force_distributed=True,
                          num_output_blocks=7)  # dist over dist: no append
    assert m1["closure"] == m2["closure"] == driver_metrics["closure"]
    clo = os.path.join(out2, "isa_closure.parquet")
    assert pq.read_table(clo).num_rows == driver_metrics["closure"]
    m3 = build_dictionary(classes_path, out2)  # driver over dist DIRECTORY
    assert m3["path"] == "driver"
    assert os.path.isfile(clo)
    assert pq.read_table(clo).num_rows == driver_metrics["closure"]


def test_block_boundary_continuation_offsets():
    """Pure-function pin of the distributed id math: slice a sorted
    label table INSIDE term runs and check the summary→offset recursion
    plus per-block dense-rank reproduce the global dense ids exactly
    (the fixture dictionary's runs are too short to split naturally)."""
    import pyarrow as pa

    from kgref.pipelines.dictionary_build import (_attach_ids_sorted_block,
                                                  _summarize_sorted_block)
    from kgref.schemas import LABELS

    terms = (["ALPHA"] * 3 + ["BETA"] * 4 + ["GAMMA"] * 1 + ["DELTA"] * 5)
    terms.sort()
    n = len(terms)
    tbl = pa.Table.from_arrays(
        [pa.array([0] * n, pa.int64()), pa.array(terms),
         pa.array([f"c{i}" for i in range(n)]),
         pa.array(["ONT"] * n), pa.array(["PREF"] * n)],
        schema=LABELS).select(
            ["term_id", "term_norm", "class_uri", "ontology", "match_type"])
    # cuts at 2, 5, 6, 9 fall inside the ALPHA, BETA and DELTA runs
    cuts = [0, 2, 5, 6, 9, n]
    blocks = [tbl.slice(a, b - a) for a, b in zip(cuts, cuts[1:])]
    prev_last_term, prev_last_id = None, 0
    got_ids, got_terms = [], []
    for blk in blocks:
        first, last, d, _rows = _summarize_sorted_block(blk)
        cont = first == prev_last_term
        start = prev_last_id if cont else prev_last_id + 1
        out, pairs = _attach_ids_sorted_block(blk, start)
        got_ids.extend(out.column("term_id").to_pylist())
        got_terms.extend(p for i, p in enumerate(pairs)
                         if not (cont and i == 0))
        prev_last_id = start + d - 1
        prev_last_term = last
    # global dense rank computed the obvious way
    uniq = sorted(set(terms))
    rank = {t: i + 1 for i, t in enumerate(uniq)}
    assert got_ids == [rank[t] for t in terms]
    assert got_terms == [(rank[t], t) for t in uniq]
    assert prev_last_id == len(uniq)


def test_mgrep_tsv_shape(built):
    out, _cp, metrics = built
    lines = open(os.path.join(out, "mgrep_dictionary.tsv")).read().splitlines()
    assert len(lines) == metrics["terms"]
    first = lines[0].split("\t")
    assert first[0] == "1" and first[1] == first[1].upper()
