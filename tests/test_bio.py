"""BIO export: brute-force tag reconstruction, wellformedness, and
span-count reconciliation on the driver's sf0.001 tables."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_tags():
    """Reference implementation straight from the flat triples."""
    from kgref import docdict
    from kgref.queries import _annotate_ds
    from kgref.schemas import AnnotateOptions

    tri = _annotate_ds(SF, AnnotateOptions(longest_only=True)).to_pandas()
    tri = tri[tri["pred"] == "annotated_with"]
    tpc = docdict.TURNS_PER_CONV
    ont = {docdict._uri(n): o for n, o, *_r in docdict.CLASS_DEFS}
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    spans = {}
    for r in tri.itertuples():
        d = int(r.conv_id[5:]) * tpc + r.turn_idx
        spans.setdefault(d, set()).add(
            (int(r.from_1b), int(r.to_1b), r.obj))
    out = {}
    for rec in docs.itertuples():
        toks = rec.text.split(" ")
        starts, pos = [], 1
        for t in toks:
            starts.append(pos)
            pos += len(t) + 1
        tags = ["O"] * len(toks)
        for i, t in enumerate(toks):
            f, to = starts[i], starts[i] + len(t) - 1
            cover = [(s_to - s_f, s_f, obj)
                     for (s_f, s_to, obj) in spans.get(rec.doc_id, ())
                     if s_f <= f and s_to >= to]
            if cover:
                # deterministic rule: longest, then min from, then
                # min obj
                cover.sort(key=lambda c: (-c[0], c[1], c[2]))
                ln, s_f, obj = cover[0]
                tags[i] = ("B-" if s_f == f else "I-") + ont[obj]
            out[(rec.doc_id, i + 1)] = (toks[i], tags[i])
    return out


def test_bio_tags_match_bruteforce(ray_session):
    from kgref.ops.bio import bio_tags

    got = bio_tags(SF).to_pandas()
    want = _brute_tags()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.doc_id, r.token_idx)] == (r.token, r.tag), (
            r.doc_id, r.token_idx)


def test_bio_tags_wellformed(ray_session):
    """No orphan I-: every I-<ont> follows a B-<ont> or I-<ont> of the
    same ontology within its document (pins the documented staggered-
    overlap caveat as absent from the fixtures), and at least one
    B- tag exists."""
    from kgref.ops.bio import bio_tags

    got = (bio_tags(SF).to_pandas()
           .sort_values(["doc_id", "token_idx"]).reset_index(drop=True))
    assert (got["tag"].str.startswith("B-")).any()
    prev_doc, prev_tag = None, "O"
    for r in got.itertuples():
        if r.tag.startswith("I-"):
            assert r.doc_id == prev_doc and prev_tag.endswith(r.tag[2:]) \
                and prev_tag != "O", (r.doc_id, r.token_idx, r.tag)
        prev_doc, prev_tag = r.doc_id, r.tag
    # token sequences reconstruct the documents exactly
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rebuilt = got.groupby("doc_id")["token"].agg(" ".join)
    for rec in docs.itertuples():
        assert rebuilt[rec.doc_id] == rec.text
