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


_PRED_RANK = {"annotated_with": 0, "isa_closure": 1, "mapped_to": 2}


def _nest_bucket(df: pd.DataFrame,
                 out_dir: str | None = None) -> pd.DataFrame:
    """One conv bucket → one JSONL row per turn.  With ``out_dir``, the
    group also writes its lines to ``bucket-<id>.jsonl`` (atomic
    tmp+rename, worker-side — the same sidecar pattern as the manifest
    stats; no driver-side collection of the export).

    ONE sort puts every nested list in its contract order — turns by
    (conv, turn), spans by (from, to), then pred rank with direct /
    mappings by class_uri and hierarchy by (distance, class_uri); the
    distance key is a no-op for direct/mapped rows (always 0, pinned by
    test_nest_bucket_matches_naive) — after which a single boundary-walk
    pass builds the dicts.  The earlier per-span pandas
    groupby/mask/sort version cost ~2 ms per TRIPLE (124 s for 58k
    triples at sf0.001 — profiled r4); this one is bounded by
    json.dumps itself."""
    df = df.sort_values(
        ["conv_id", "turn_idx", "from_1b", "to_1b", "pred", "distance",
         "obj"],
        key=lambda s: s.map(_PRED_RANK) if s.name == "pred" else s,
        kind="mergesort")
    conv_a = df["conv_id"].tolist()
    turn_a = df["turn_idx"].tolist()
    from_a = df["from_1b"].tolist()
    to_a = df["to_1b"].tolist()
    pred_a = df["pred"].tolist()
    obj_a = df["obj"].tolist()
    mt_a = df["match_type"].tolist()
    text_a = df["matched_text"].tolist()
    dist_a = df["distance"].tolist()
    label_a = df["pref_label"].tolist()
    cui_a = df["cui"].tolist()
    score_a = df["score"].tolist()

    out_conv: list[str] = []
    out_turn: list[int] = []
    out_nspans: list[int] = []
    out_json: list[str] = []
    turn_key = span_key = None
    spans: list[dict] = []
    span: dict = {}

    def flush_turn() -> None:
        conv, turn = turn_key
        out_conv.append(conv)
        out_turn.append(int(turn))
        out_nspans.append(len(spans))
        out_json.append(json.dumps(
            {"conv_id": conv, "turn_idx": int(turn), "spans": spans},
            sort_keys=True, separators=(",", ":")))

    for i in range(len(conv_a)):
        tk = (conv_a[i], turn_a[i])
        sk = (from_a[i], to_a[i])
        if tk != turn_key:
            if turn_key is not None:
                flush_turn()
            turn_key, span_key, spans = tk, None, []
        if sk != span_key or not spans:
            span_key = sk
            span = {"from": int(from_a[i]), "to": int(to_a[i]),
                    "text": text_a[i], "direct": [], "hierarchy": [],
                    "mappings": []}
            spans.append(span)
        p = pred_a[i]
        if p == "annotated_with":
            span["direct"].append(
                {"class_uri": obj_a[i], "match_type": mt_a[i],
                 "pref_label": label_a[i], "cui": cui_a[i],
                 "score": float(score_a[i])})
        elif p == "isa_closure":
            span["hierarchy"].append(
                {"class_uri": obj_a[i], "distance": int(dist_a[i]),
                 "pref_label": label_a[i]})
        else:
            span["mappings"].append(
                {"class_uri": obj_a[i], "pref_label": label_a[i]})
    if turn_key is not None:
        flush_turn()
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
        # Scale bound (VERDICT r4 Next #8): this converts ONE bucket's
        # triples to pandas inside the group task, so a bucket
        # (~corpus_triples / num_buckets rows) must fit a worker's heap
        # alongside its JSON strings — at 10^12 turns that means sizing
        # ``num_buckets`` so buckets stay ≲256 MiB (the same
        # target-part-bytes rule as ops/pairs.n_parts_for; the flagship
        # materialize path already derives its bucket count that way).
        # A row-group-chunked walk is NOT possible here without a
        # second exchange: nesting needs every row of a turn — and the
        # per-conv JSONL file every row of a conversation — in one
        # task.
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


def nested_projection(nested):
    """Hash-gateable integer projection of the nested-JSON export.

    Parses each emitted JSON line back (``json.loads`` — independent of
    the ``json.dumps`` construction path) and reduces every nested list
    to exact-integer per-turn statistics: entry counts per list kind,
    span edge/distance sums, and M61-fold sums (mod 10^9) of every
    string field — class URIs, span texts, pref labels, CUIs, match
    types.  A dropped/duplicated/misgrouped/mislabeled entry anywhere
    in the nesting moves at least one column, and every column has an
    exact DuckDB twin built from the independently re-derived flat
    triples (queries.annotations_nested_sql), so the serializer is
    value-hash-gated end-to-end; byte-level JSON formatting is pinned
    separately by the exact round-trip test in tests/test_serialize.py.

    The per-row walk is Python by nature — this is the serialization
    boundary (same status as _nest_bucket), and it runs distributed
    inside map_batches."""
    import numpy as np

    def proj(batch: pa.Table) -> pa.Table:
        from ..ops.m61 import fold_m61_many

        mod = np.uint64(1_000_000_000)
        rows = batch.column("json").to_pylist()
        n = len(rows)
        n_spans = np.zeros(n, np.int32)
        n_direct = np.zeros(n, np.int32)
        n_hier = np.zeros(n, np.int32)
        n_map = np.zeros(n, np.int32)
        edge_sum = np.zeros(n, np.int64)
        dist_sum = np.zeros(n, np.int64)
        # (strings, owning row) per folded field, folded in ONE
        # vectorized pass per field after the walk
        acc: dict[str, tuple[list[str], list[int]]] = {
            k: ([], []) for k in ("uri", "text", "label", "cui", "mt")}

        def put(k: str, s: str, r: int) -> None:
            acc[k][0].append(s)
            acc[k][1].append(r)

        for r, js in enumerate(rows):
            obj = json.loads(js)
            spans = obj["spans"]
            n_spans[r] = len(spans)
            for sp in spans:
                edge_sum[r] += sp["from"] + sp["to"]
                put("text", sp["text"], r)
                for e in sp["direct"]:
                    n_direct[r] += 1
                    put("uri", e["class_uri"], r)
                    put("label", e["pref_label"], r)
                    put("cui", e["cui"], r)
                    put("mt", e["match_type"], r)
                for e in sp["hierarchy"]:
                    n_hier[r] += 1
                    dist_sum[r] += e["distance"]
                    put("uri", e["class_uri"], r)
                    put("label", e["pref_label"], r)
                for e in sp["mappings"]:
                    n_map[r] += 1
                    put("uri", e["class_uri"], r)
                    put("label", e["pref_label"], r)

        def fold9(k: str) -> np.ndarray:
            out = np.zeros(n, np.int64)
            strs, rws = acc[k]
            if strs:
                f = (fold_m61_many(strs) % mod).astype(np.int64)
                np.add.at(out, np.asarray(rws, np.int64), f)
            return out

        return pa.Table.from_arrays(
            [batch.column("conv_id"), batch.column("turn_idx"),
             pa.array(n_spans, pa.int32()), pa.array(n_direct, pa.int32()),
             pa.array(n_hier, pa.int32()), pa.array(n_map, pa.int32()),
             pa.array(edge_sum), pa.array(dist_sum),
             pa.array(fold9("uri")), pa.array(fold9("text")),
             pa.array(fold9("label")), pa.array(fold9("cui")),
             pa.array(fold9("mt"))],
            names=["conv_id", "turn_idx", "n_spans", "n_direct", "n_hier",
                   "n_map", "edge_sum", "dist_sum", "uri_fold9",
                   "text_fold9", "label_fold9", "cui_fold9", "mt_fold9"])

    return nested.map_batches(proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# N-Triples export (S5 interchange surface)
#
# The reference lives in an ontology/RDF ecosystem (OntoPortal), so the
# KG materialization needs an RDF-toolchain-consumable surface besides
# Parquet and nested JSONL.  This is the W3C N-Triples rendering of the
# flat triple rows: one `<span-IRI> <pred-IRI> <class-IRI> .` line per
# triple, subjects minted as `urn:kgref:span:<conv>/<turn>/<from>-<to>`
# (the same span encoding as TRIPLES.subj), predicates as
# `urn:kgref:pred:<pred>`, objects as the ontology class URIs verbatim.
# Optional `include_labels=True` additionally emits
# `<class-IRI> <urn:kgref:pred:pref_label> "label" .` literal triples.
#
# Everything is vectorized Arrow string kernels (no per-row Python in
# the line builder); the file sink reuses the coarse conv-bucket
# group-and-write pattern of the JSONL export (deterministic
# `bucket-<id>.nt` shard names, atomic tmp+rename, worker-side — a
# resumable, driver-free sink).  Duplicate (s,p,o) lines are possible
# when one span reaches the same class through two match types or two
# descendants; RDF graphs are SETS, so duplicate lines are harmless to
# any consumer, and the projection gate counts rows, not distinct
# lines, to stay bit-comparable with the flat-triples oracle.

_NT_IRI_ESC = ["\\", "<", ">", '"', "{", "}", "|", "^", "`",
               " ", "\t", "\n", "\r"]


def _escape_iri(col: pa.ChunkedArray | pa.Array):
    """Percent-encode the characters N-Triples forbids inside <IRIREF>
    (one-way sanitization for validity, not reversible encoding —
    fixture URIs/ids never contain them, pinned by the oracle gate)."""
    for ch in _NT_IRI_ESC:
        col = pc.replace_substring(col, pattern=ch,
                                   replacement=f"%{ord(ch):02X}")
    return col


def _escape_literal(col: pa.ChunkedArray | pa.Array):
    """N-Triples string-literal escaping (backslash FIRST, then quote
    and line breaks — ECHAR production)."""
    col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    col = pc.replace_substring(col, pattern='"', replacement='\\"')
    col = pc.replace_substring(col, pattern="\n", replacement="\\n")
    col = pc.replace_substring(col, pattern="\r", replacement="\\r")
    return col


def _nt_lines(t: pa.Table, include_labels: bool = False) -> pa.Table:
    """One triples batch → (pred, line) N-Triples rows, all-Arrow."""
    t = decode_dictionary_columns(t)
    s = pa.scalar

    def cat(*parts):
        return pc.binary_join_element_wise(*parts, s(""))

    conv = _escape_iri(t.column("conv_id").cast(pa.string()))
    pred = t.column("pred").cast(pa.string())
    obj = _escape_iri(t.column("obj").cast(pa.string()))
    subj = cat(conv, s("/"), t.column("turn_idx").cast(pa.string()),
               s("/"), t.column("from_1b").cast(pa.string()),
               s("-"), t.column("to_1b").cast(pa.string()))
    line = cat(s("<urn:kgref:span:"), subj, s("> <urn:kgref:pred:"),
               pred, s("> <"), obj, s("> ."))
    out = pa.table({"pred": pred, "line": line})
    if include_labels:
        # class-label literals: batch-local distinct (obj, pref_label)
        # — duplicates ACROSS batches are possible and harmless (RDF
        # set semantics); a global distinct would cost a shuffle.
        lab = t.select(["obj", "pref_label"]).group_by(
            ["obj", "pref_label"]).aggregate([])
        lab_line = cat(s("<"), _escape_iri(lab.column("obj")),
                       s('> <urn:kgref:pred:pref_label> "'),
                       _escape_literal(lab.column("pref_label")),
                       s('" .'))
        out = pa.concat_tables([out, pa.table({
            "pred": pa.array(["pref_label"] * len(lab), pa.string()),
            "line": lab_line})])
    return out.combine_chunks()


def to_ntriples(triples, include_labels: bool = False):
    """Flat TRIPLES Dataset → (pred, line) Dataset of N-Triples lines.
    Pure per-batch transform — no shuffle; the export is
    embarrassingly parallel."""
    return triples.map_batches(
        lambda b: _nt_lines(b, include_labels), batch_format="pyarrow")


def write_ntriples(triples, out_dir: str, num_buckets: int = 32,
                   include_labels: bool = False) -> int:
    """Materialize the export as deterministic per-bucket ``.nt``
    shards (bucket = crc32(conv_id) % num_buckets, lines sorted
    bytewise within a shard, atomic tmp+rename, written worker-side).
    Returns the number of lines written.  Same bucket-size bound as
    ``nest_annotations``: size ``num_buckets`` so one bucket's lines
    fit a worker's heap."""
    import os

    from .materialize import add_bucket_column

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(t: pa.Table) -> pa.Table:
        bid = int(t.column("bucket")[0].as_py())
        lines = _nt_lines(t, include_labels).column("line")
        lines = lines.take(pc.sort_indices(lines))
        tmp = os.path.join(out_dir, f".bucket-{bid:04d}.nt.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines.to_pylist()) + "\n")
        os.rename(tmp, os.path.join(out_dir, f"bucket-{bid:04d}.nt"))
        return pa.Table.from_arrays(
            [pa.array([bid], pa.int32()),
             pa.array([len(lines)], pa.int64())],
            names=["bucket", "n_lines"])

    counts = (triples.map_batches(
        lambda b: add_bucket_column(b, num_buckets),
        batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow"))
    return int(sum(r["n_lines"] for r in counts.take_all()))


def ntriples_projection(lines):
    """Hash-gateable reduction of the N-Triples export: per predicate,
    the line count and the Σ (M61-fold mod 10^9) of the raw line
    strings.  A dropped / duplicated / reformatted line anywhere moves
    a fold column, and the DuckDB twin (queries.annotations_ntriples
    _sql) rebuilds the exact line strings from the independently
    re-derived flat triples — so the RENDERED BYTES are value-gated,
    not just the triple multiset.  Combiner pattern: per-batch (pred,
    n, fold9) partials, then a 3-row Sum groupby."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from ..ops.m61 import fold_m61_many

        f9 = (fold_m61_many(t.column("line").to_pylist())
              % np.uint64(1_000_000_000)).astype(np.int64)
        df = pd.DataFrame({"pred": t.column("pred").to_pandas(),
                           "f9": f9})
        g = df.groupby("pred", sort=False).agg(
            n_lines=("f9", "size"), line_fold9=("f9", "sum"))
        g = g.reset_index()
        g["n_lines"] = g["n_lines"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (lines.map_batches(partial, batch_format="pyarrow")
            .groupby("pred")
            .aggregate(Sum("n_lines", alias_name="n_lines"),
                       Sum("line_fold9", alias_name="line_fold9")))
