"""Reference-shape annotation serializer (SURVEY §2.1 S5, data model D5).

The reference's REST layer returns NESTED annotation objects —
``annotatedClass`` + ``annotations[{from,to,matchType,text}]`` +
``hierarchy[{annotatedClass,distance}]`` + ``mappings[...]``
(`ref:lib/annotation.rb [H]`) — while this engine's north-star output is
FLAT triple rows (shuffle-friendly; SURVEY §1.1 D5 note says the nested
shape is recoverable by grouping).  This module is that recovery path:
a JSONL export with one object per turn, spans nested inside, direct /
hierarchy / mapping classes nested per span.

Shape per line::

    {"conv_id": c, "turn_idx": t, "spans": [
        {"from": f, "to": g, "text": s,
         "direct":    [{"class_uri", "match_type", "pref_label", "cui",
                        "score"}...],
         "hierarchy": [{"class_uri", "distance", "pref_label"}...],
         "mappings":  [{"class_uri", "pref_label"}...]}]}

All lists are deterministically ordered (spans by (from, to); classes
by class_uri; hierarchy by (distance, class_uri)) so the export is
byte-stable across runs and partitionings.

Scale shape: the input triples are grouped on the SAME coarse conv
bucket as the production materialize path (one shuffle, bounded
groups); JSON string building is inherently per-turn Python — it is the
serialization boundary, not a data-plane transform, and it runs
distributed inside map_groups.  Round-trip contract in
tests/test_serialize.py: parsing the JSONL back yields exactly the flat
triple rows it was built from.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def decode_dictionary_columns(t: pa.Table) -> pa.Table:
    """Cast dict-encoded columns back to their value types.

    The annotate exchange ships DictionaryArrays (small shuffle bytes);
    chunks arriving from different workers carry DIFFERENT dictionaries,
    and pyarrow's pandas bridge can surface those as a Categorical with
    duplicate categories (ValueError).  Casting each chunk to the plain
    value type sidesteps the unification entirely — do this only at the
    serialization boundary, never before a shuffle."""
    cols, names = [], []
    for name in t.column_names:
        col = t.column(name)
        if pa.types.is_dictionary(col.type):
            col = pc.cast(col, col.type.value_type)
        cols.append(col)
        names.append(name)
    return pa.Table.from_arrays(cols, names=names)


def _span_obj(sg: pd.DataFrame, f: int, t: int) -> dict:
    direct = sg[sg["pred"] == "annotated_with"]
    hier = sg[sg["pred"] == "isa_closure"]
    mapped = sg[sg["pred"] == "mapped_to"]
    text = (direct if len(direct) else sg)["matched_text"].iloc[0]
    return {
        "from": int(f),
        "to": int(t),
        "text": text,
        "direct": [
            {"class_uri": r.obj, "match_type": r.match_type,
             "pref_label": r.pref_label, "cui": r.cui,
             "score": float(r.score)}
            for r in direct.sort_values("obj").itertuples()
        ],
        "hierarchy": [
            {"class_uri": r.obj, "distance": int(r.distance),
             "pref_label": r.pref_label}
            for r in hier.sort_values(["distance", "obj"]).itertuples()
        ],
        "mappings": [
            {"class_uri": r.obj, "pref_label": r.pref_label}
            for r in mapped.sort_values("obj").itertuples()
        ],
    }


def _nest_bucket(df: pd.DataFrame,
                 out_dir: str | None = None) -> pd.DataFrame:
    """One conv bucket → one JSONL row per turn.  With ``out_dir``, the
    group also writes its lines to ``bucket-<id>.jsonl`` (atomic
    tmp+rename, worker-side — the same sidecar pattern as the manifest
    stats; no driver-side collection of the export)."""
    out_conv: list[str] = []
    out_turn: list[int] = []
    out_nspans: list[int] = []
    out_json: list[str] = []
    for (conv, turn), g in df.groupby(["conv_id", "turn_idx"], sort=True):
        spans = [
            _span_obj(sg, f, t)
            for (f, t), sg in g.groupby(["from_1b", "to_1b"], sort=True)
        ]
        out_conv.append(conv)
        out_turn.append(int(turn))
        out_nspans.append(len(spans))
        out_json.append(json.dumps(
            {"conv_id": conv, "turn_idx": int(turn), "spans": spans},
            sort_keys=True, separators=(",", ":")))
    if out_dir is not None and out_json:
        import os

        bid = int(df["bucket"].iloc[0])
        tmp = os.path.join(out_dir, f".bucket-{bid:04d}.jsonl.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(out_json) + "\n")
        os.rename(tmp, os.path.join(out_dir, f"bucket-{bid:04d}.jsonl"))
    return pd.DataFrame({"conv_id": out_conv,
                         "turn_idx": pd.array(out_turn, dtype="int32"),
                         "n_spans": pd.array(out_nspans, dtype="int32"),
                         "json": out_json})


def nest_annotations(triples, num_buckets: int = 32,
                     out_dir: str | None = None):
    """Flat TRIPLES Dataset → per-turn nested-JSON Dataset
    (conv_id, turn_idx, n_spans, json).  With ``out_dir``, each bucket
    group additionally writes its ``bucket-<id>.jsonl`` file."""
    from .materialize import add_bucket_column

    if out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)

    def run(t: pa.Table) -> pd.DataFrame:
        return _nest_bucket(decode_dictionary_columns(t).to_pandas(),
                            out_dir)

    return (triples.map_batches(
        lambda b: add_bucket_column(b, num_buckets),
        batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(run, batch_format="pyarrow"))


def write_annotations_jsonl(triples, out_dir: str,
                            num_buckets: int = 32) -> int:
    """Materialize the nested export as per-bucket JSONL files; returns
    the number of turn lines written."""
    nested = nest_annotations(triples, num_buckets, out_dir)
    return nested.count()
