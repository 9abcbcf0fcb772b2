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


def test_mgrep_tsv_shape(built):
    out, _cp, metrics = built
    lines = open(os.path.join(out, "mgrep_dictionary.tsv")).read().splitlines()
    assert len(lines) == metrics["terms"]
    first = lines[0].split("\t")
    assert first[0] == "1" and first[1] == first[1].upper()
