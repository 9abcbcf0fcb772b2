"""Incremental re-annotation (kgref.ops.incremental): the delta-probe /
cached-reuse / selective-recompute union must be value-identical to a
full v2 run, and the affected set must be a strict non-trivial subset
(otherwise the op silently degrades to a full recompute and the gate
proves nothing)."""

import duckdb
import pandas as pd

from kgref import docdict
from kgref.ops.incremental import (
    DELTA_CLASSES,
    _affected_keys,
    _split_tables,
    _state_of,
    annotate_incremental,
    annotate_incremental_sql,
)

SF = "/root/testdata/sf0.001"


def test_label_split_partitions_the_dictionary():
    t, v1_labels, probe_labels = _split_tables()
    full = t["labels"]
    delta_uris = {docdict._uri(n) for n in DELTA_CLASSES}
    # v1 = full minus delta-class rows, nothing else
    fdf = full.to_pandas()
    n_delta_rows = int(fdf["class_uri"].isin(delta_uris).sum())
    assert n_delta_rows > 0
    assert len(v1_labels) == len(full) - n_delta_rows
    assert not set(v1_labels.column("class_uri").to_pylist()) & delta_uris
    # probe covers every surface owned by a delta class (shared incl.)
    delta_surfaces = set(
        full.to_pandas().query("class_uri in @delta_uris")["term_norm"])
    assert set(probe_labels.column("term_norm").to_pylist()) == delta_surfaces


def test_affected_set_is_a_strict_nontrivial_subset(ray_session):
    from kgref.queries import _CFG
    from kgref.sources.transcripts import documents_as_transcripts

    t, _v1, probe_labels = _split_tables()
    ds = documents_as_transcripts(SF, turns_per_conv=docdict.TURNS_PER_CONV)
    keys = _affected_keys(ds, _state_of(t, probe_labels, "p"), _CFG)
    n = ds.count()
    assert 0 < len(keys) < n  # some turns recompute, most reuse the cache


def test_incremental_union_equals_full_run(ray_session):
    got = annotate_incremental(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(annotate_incremental_sql()).df()
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    w = (want[cols].sort_values(cols, kind="mergesort")
         .reset_index(drop=True).astype(g.dtypes.to_dict()))
    pd.testing.assert_frame_equal(g, w)
