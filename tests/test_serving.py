"""Per-request serving path (kgref.serving.annotate) vs the DuckDB
annotate oracle — the request shape must be bit-identical to the same
text flowing through the batch pipeline's independently-derived SQL
twin.  No Ray session needed."""

import duckdb
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _flatten(spans):
    out = set()
    for s in spans:
        for d in s["direct"]:
            out.add((s["from"], s["to"], "annotated_with",
                     d["class_uri"], 0))
        for h in s["hierarchy"]:
            out.add((s["from"], s["to"], "isa_closure",
                     h["class_uri"], h["distance"]))
        for m in s["mappings"]:
            out.add((s["from"], s["to"], "mapped_to",
                     m["class_uri"], 0))
    return out


def test_serving_matches_duckdb_oracle():
    from kgref import docdict
    from kgref.queries import annotate_oracle_sql
    from kgref.schemas import AnnotateOptions
    from kgref.serving import Annotator

    opts = AnnotateOptions(expand_hierarchy_levels=2, expand_mappings=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS"
                f" SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(annotate_oracle_sql(opts)).fetch_df()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ann = Annotator()
    tpc = docdict.TURNS_PER_CONV
    checked = nonempty = 0
    for rec in docs.head(40).itertuples():
        conv = f"conv-{rec.doc_id // tpc}"
        turn = rec.doc_id % tpc
        want_rows = oracle[(oracle["conv_id"] == conv)
                           & (oracle["turn_idx"] == turn)]
        want = {(int(r.from_1b), int(r.to_1b), r.pred, r.obj,
                 int(r.distance))
                for r in want_rows.itertuples()}
        got = _flatten(ann.annotate(rec.text, opts))
        assert got == want, rec.doc_id
        checked += 1
        nonempty += bool(got)
    assert checked == 40 and nonempty > 10


def test_serving_registry_cache_and_default_options():
    from kgref.schemas import AnnotateOptions
    from kgref.serving import Annotator, annotate

    a = Annotator()
    o1 = AnnotateOptions(longest_only=True)
    r1 = a.annotate("the spark operator uses a hash join", o1)
    r2 = a.annotate("the spark operator uses a hash join", o1)
    assert r1 == r2 and len(a._registries) == 1
    # module-level convenience builds one shared instance
    d1 = annotate("the spark operator")
    d2 = annotate("the spark operator")
    assert d1 == d2 and d1
    assert annotate("") == []
