"""Round-trip contract for the reference-shape nested serializer
(kgref/stages/serialize.py): parsing the JSONL back must recover the
EXACT flat triple multiset it was built from, and the per-bucket file
sink must carry the same lines as the returned dataset."""

import json
import os

import pyarrow as pa
import ray

from kgref import docdict
from kgref.pipelines.annotate_pipeline import build_triples
from kgref.queries import _CFG
from kgref.schemas import AnnotateOptions
from kgref.sources.transcripts import documents_as_transcripts
from kgref.stages.serialize import (decode_dictionary_columns,
                                    nest_annotations,
                                    write_annotations_jsonl)

SF = "/root/testdata/sf0.001"
OPTS = AnnotateOptions(expand_hierarchy_levels=2, expand_mappings=True)

_PRED_OF = {"direct": "annotated_with", "hierarchy": "isa_closure",
            "mappings": "mapped_to"}


def _triples(sf_dir):
    ds = documents_as_transcripts(sf_dir,
                                  turns_per_conv=docdict.TURNS_PER_CONV)
    return build_triples(ds, ray.put(docdict.state()), OPTS, _CFG)


def _flat_from_json(line: str) -> set[tuple]:
    obj = json.loads(line)
    rows = set()
    for sp in obj["spans"]:
        for kind, pred in _PRED_OF.items():
            for c in sp[kind]:
                rows.add((obj["conv_id"], obj["turn_idx"], sp["from"],
                          sp["to"], pred, c["class_uri"],
                          c.get("distance", 0)))
    return rows


def test_nested_jsonl_round_trips_to_flat_triples(ray_session, tmp_path):
    t = _triples(SF)
    # dict-encoded triple columns: decode per batch before pandas (the
    # raw to_pandas can hit duplicate Categorical categories)
    flat = pa.concat_tables(
        [decode_dictionary_columns(b)
         for b in t.iter_batches(batch_format="pyarrow")]).to_pandas()
    want = {(r.conv_id, int(r.turn_idx), int(r.from_1b), int(r.to_1b),
             r.pred, r.obj, int(r.distance))
            for r in flat.itertuples()}

    out = str(tmp_path / "jsonl")
    n_lines = write_annotations_jsonl(_triples(SF), out, num_buckets=8)

    got: set[tuple] = set()
    lines = 0
    for f in sorted(os.listdir(out)):
        assert f.startswith("bucket-") and f.endswith(".jsonl")
        for line in open(os.path.join(out, f)):
            got |= _flat_from_json(line)
            lines += 1
    assert lines == n_lines
    assert got == want
    # every turn with at least one triple appears exactly once
    assert lines == flat[["conv_id", "turn_idx"]].drop_duplicates().shape[0]


def test_nested_dataset_is_deterministic_and_sorted(ray_session):
    a = nest_annotations(_triples(SF), num_buckets=8).to_pandas()
    b = nest_annotations(_triples(SF), num_buckets=4).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    # bucketing is a physical choice — the export must not depend on it
    assert a.equals(b)
    # span lists are (from, to)-sorted and json is canonical (sorted keys)
    row = json.loads(a["json"].iloc[0])
    spans = [(s["from"], s["to"]) for s in row["spans"]]
    assert spans == sorted(spans)
    assert a["json"].iloc[0] == json.dumps(row, sort_keys=True,
                                           separators=(",", ":"))
