"""Per-conversation materialization — THE shuffle (SURVEY.md §2.5–2.7, §4).

Re-expresses the reference's per-request "group matches by annotated
class into Annotation objects" (annotate_direct's in-memory hash, A1 [H])
as the corpus-scale group-by-conversation materialization the north_star
mandates: triples are hash-bucketed on conv_id, grouped per
(conv_id, salt), stable-sorted by turn order, deduped, and written as
partitioned Parquet edge tables with one lineage/metrics manifest per
bucket — the unit of checkpoint/resume.

Scale design (10^12 turns):
- ONE all-to-all exchange in the whole pipeline (the groupby here); every
  other join is broadcast map-side.  The groupby key is
  (conv_id, salt) — never a global sort.
- Skew: hot conversations (counted cheaply on the INPUT's conv_id column
  via partial per-batch counts, not on the exploded triples) are
  range-salted ``salt = turn_idx // salt_chunk`` so each salted group is
  a contiguous, disjoint turn range (SURVEY.md §7 hard-part 4; never
  hash-salt).  Ordering contract: rows are (conv, turn)-sorted WITHIN
  each output file; a hot conv's salt runs land in separate files of its
  bucket dir, so whole-conv order across files is recovered by a cheap
  per-conv sort on turn_idx (files are internally sorted runs — this is
  a k-way merge, not a re-sort).
- Resume: buckets listed in ``_manifest/`` are filtered out of the INPUT
  before the expensive annotate stage even runs; finished work is
  skipped, not recomputed.  Deterministic bucket = crc32(conv_id) % B.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schemas import PipelineConfig

MANIFEST_DIR = "_manifest"


def bucket_of(conv_id: str, num_buckets: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % num_buckets


def add_bucket_column(batch: pa.Table, num_buckets: int,
                      col: str = "conv_id") -> pa.Table:
    """Vectorized-ish deterministic bucket assignment: crc32 over the
    dictionary-encoded uniques (conv_ids repeat heavily within a block),
    then take — one Python call per UNIQUE conv, not per row."""
    c = batch.column(col).combine_chunks()
    if isinstance(c, pa.ChunkedArray):
        c = c.chunk(0) if c.num_chunks else pa.array([], pa.string())
    enc = c if pa.types.is_dictionary(c.type) else c.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    lut = pa.array([zlib.crc32(u.encode("utf-8")) % num_buckets for u in uniq],
                   pa.int32())
    buckets = lut.take(enc.indices)
    return batch.append_column("bucket", buckets)


def done_buckets(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("bucket-") and f.endswith(".json"):
            done.add(int(f[len("bucket-"):-len(".json")]))
    return done


def filter_done_buckets(ds: rd.Dataset, out_dir: str, num_buckets: int,
                        conv_col: str = "conv_id") -> rd.Dataset:
    """Drop rows of already-finished buckets (resume path) BEFORE the
    expensive stages.  No-op scan cost when nothing is done."""
    done = done_buckets(out_dir)
    if not done:
        return ds
    return filter_to_buckets(
        ds, set(range(num_buckets)) - done, num_buckets, conv_col)


def filter_to_buckets(ds: rd.Dataset, keep_buckets: set[int],
                      num_buckets: int,
                      conv_col: str = "conv_id") -> rd.Dataset:
    """Keep only rows whose conv bucket ∈ keep_buckets (wave/resume
    filter — runs on the column-pruned input, before annotate)."""
    keep_arr = pa.array(sorted(keep_buckets), pa.int32())

    def keep(batch: pa.Table) -> pa.Table:
        b = add_bucket_column(batch, num_buckets, conv_col)
        return batch.filter(pc.is_in(b.column("bucket"),
                                     value_set=keep_arr))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Hot-conversation pre-pass (O3): partial counts inside map_batches, then a
# tiny groupby over per-batch partials — the exchange moves one row per
# (batch, conv), not one per turn.


def hot_conversations(transcripts: rd.Dataset, threshold: int) -> dict[str, int]:
    def partial_counts(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column("conv_id")).combine_chunks()
        counts = pc.value_counts(enc.indices)
        uniq = enc.dictionary
        return pa.Table.from_arrays(
            [uniq.take(counts.field("values")), pc.cast(counts.field("counts"), pa.int64())],
            names=["conv_id", "n"],
        )

    from ray.data.aggregate import Sum

    partials = transcripts.select_columns(["conv_id"]).map_batches(
        partial_counts, batch_format="pyarrow"
    )
    agg = partials.groupby("conv_id").aggregate(Sum("n", alias_name="turns"))
    # push the ≥threshold filter into the workers so only hot rows (a
    # tiny set by definition) ever transit the driver — at 10^9 convs the
    # cold aggregate rows are dropped before iter_batches ships them
    hot_only = agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("turns"), threshold)),
        batch_format="pyarrow",
    )
    hot = {}
    for batch in hot_only.iter_batches(batch_format="pyarrow"):
        for cid, n in zip(batch.column("conv_id").to_pylist(),
                          batch.column("turns").to_pylist()):
            hot[cid] = int(n)
    return hot


def add_salt_column(ds: rd.Dataset, hot: dict[str, int], salt_chunk: int) -> rd.Dataset:
    """Range-salt hot conversations: salt = turn_idx // salt_chunk (0 for
    cold convs) — salt groups are disjoint, contiguous turn ranges.

    All-Arrow: the hot-membership mask is computed once per UNIQUE conv
    (dictionary path) or via one ``pc.is_in`` C kernel, and the salt
    value is ``pc.if_else(mask, turn_idx // salt_chunk, 0)`` — no
    per-row Python even on fully-hot corpora."""
    hot_arr = pa.array(sorted(hot), pa.string())
    zero = pa.scalar(0, pa.int32())
    chunk = pa.scalar(salt_chunk, pa.int32())

    def salt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if not len(hot_arr):
            import numpy as np

            return batch.append_column(
                "salt", pa.array(np.zeros(n, dtype=np.int32)))
        conv = batch.column("conv_id").combine_chunks()
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.chunk(0) if conv.num_chunks else pa.array([], pa.string())
        if pa.types.is_dictionary(conv.type):
            # membership test over the uniques only, broadcast via take
            mask = pc.is_in(conv.dictionary, value_set=hot_arr).take(conv.indices)
        else:
            mask = pc.is_in(conv, value_set=hot_arr)
        # integer divide on int32 == floor division for non-negative turn_idx
        div = pc.cast(pc.divide(pc.cast(batch.column("turn_idx"), pa.int32()),
                                chunk), pa.int32())
        s = pc.if_else(mask, div, zero)
        return batch.append_column("salt", s)

    return ds.map_batches(salt, batch_format="pyarrow")


# ---------------------------------------------------------------------------


def _key_codes(t: pa.Table, name: str) -> pa.Array:
    """Int sort/dedup codes for a column: dictionary indices for
    dict-encoded columns (deterministic within the unified table; code
    order ≠ lexicographic, which only affects tie-break order among
    rows with identical span+distance — per-conv turn ordering is
    governed by the preceding int keys), the column itself otherwise."""
    col = t.column(name)
    if pa.types.is_dictionary(col.type):
        return pc.cast(col.combine_chunks().indices, pa.int32())
    return col


def _order_dedup_bucket(t: pa.Table,
                        stats_dir: str | None = None,
                        write_root: str | None = None) -> pa.Table:
    """O1 + U2 over one whole (bucket, salt) group — all Arrow C
    kernels, no per-row Python.  Exact because a bucket holds entire
    conversations (bucket = crc32(conv_id) % B): a multi-key sort with
    conv_id leading yields per-conv turn order, and keep-first after the
    distance-ascending sort keeps the min-distance row (A2).

    ``subj`` was dropped before the exchange (derivable from
    conv/turn/span — no reason to shuffle ~25 redundant bytes/row) and
    is re-derived here with vectorized joins.  Per-group conversation
    stats go to sidecar JSONs (worker-side) so manifest finalization
    never re-reads data columns on the driver."""
    # exchange-byte accounting (VERDICT r4 Next #7): this table is one
    # group as it LANDED from THE shuffle — its Arrow byte size is the
    # per-group volume of the pipeline's single all-to-all, recorded
    # worker-side into the stats sidecars and rolled up into manifests
    xbytes = int(t.nbytes)
    t = t.unify_dictionaries()
    key_names = ["conv_id", "turn_idx", "from_1b", "to_1b", "pred", "obj",
                 "match_type"]
    keys = pa.Table.from_arrays(
        [_key_codes(t, n) for n in key_names] + [t.column("distance")],
        names=[f"k{i}" for i in range(len(key_names))] + ["k_dist"],
    )
    order = pc.sort_indices(
        keys, sort_keys=[(f"k{i}", "ascending")
                         for i in range(len(key_names))] + [("k_dist",
                                                             "ascending")])
    t = t.take(order)
    keys = keys.take(order)
    # keep-first dedup on the 7-part key: a sorted row survives iff any
    # key column differs from the previous row (vectorized neighbor diff)
    n = t.num_rows
    if n > 1:
        import numpy as np

        keep = np.zeros(n, dtype=bool)
        keep[0] = True
        for i in range(len(key_names)):
            col = keys.column(f"k{i}").combine_chunks().to_numpy(
                zero_copy_only=False)
            np.logical_or(keep[1:], col[1:] != col[:-1], out=keep[1:])
        t = t.filter(pa.array(keep))

    conv_str = pc.cast(t.column("conv_id"), pa.string())
    subj = pc.binary_join_element_wise(
        pc.binary_join_element_wise(
            conv_str, pc.cast(t.column("turn_idx"), pa.string()),
            pc.cast(t.column("from_1b"), pa.string()), "/"),
        pc.cast(t.column("to_1b"), pa.string()), "-")
    t = t.add_column(0, "subj", subj)
    if "score" not in t.column_names:
        # unscored runs drop the constant-0.0 column before the
        # exchange (~8 B/row of shuffle bytes); re-add for the contract
        t = t.append_column(
            "score", pa.array(np.zeros(t.num_rows) if t.num_rows else [],
                              pa.float64()))

    if stats_dir is not None and t.num_rows:
        bid = int(t.column("bucket")[0].as_py())
        salt = int(t.column("salt")[0].as_py())
        stats = {"bucket": bid, "salt": salt, "rows": int(t.num_rows),
                 "num_convs": int(pc.count_distinct(conv_str).as_py()),
                 "exchange_bytes": xbytes}
        tmp = os.path.join(stats_dir, f".{bid}-{salt}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(stats, fh)
        os.rename(tmp, os.path.join(stats_dir, f"{bid}-{salt}.json"))

    if write_root is not None:
        # Worker-side partitioned write: this group IS one (bucket, salt)
        # partition, already sorted/deduped, sitting in this worker's
        # heap — write it HERE instead of round-tripping 35M+ rows back
        # through the object store into Ray's partitioned sink (measured
        # ~20 s of pure overhead at 32 CPUs / REP=64, and it anti-scales:
        # the sink serializes on one node's FS metadata).  Hive layout
        # (bucket=NNNN/salt-S.parquet) is byte-compatible with the old
        # write_parquet(partition_cols=["bucket"]) output; tmp+rename
        # keeps a retried task idempotent (unique tmp, last rename wins).
        import uuid

        import pyarrow.parquet as pq
        bid = int(t.column("bucket")[0].as_py()) if t.num_rows else 0
        salt = int(t.column("salt")[0].as_py()) if t.num_rows else 0
        if t.num_rows:
            d = os.path.join(write_root, f"bucket={bid:04d}")
            os.makedirs(d, exist_ok=True)
            body = t.drop_columns(["bucket", "salt"])
            tmpf = os.path.join(d, f".salt-{salt}-{uuid.uuid4().hex}.tmp")
            pq.write_table(body, tmpf, compression="zstd")
            os.rename(tmpf, os.path.join(d, f"salt-{salt}.parquet"))
        # bucket-level metadata is all that flows downstream
        return pa.Table.from_arrays(
            [pa.array([bid], pa.int32()), pa.array([salt], pa.int32()),
             pa.array([t.num_rows], pa.int64())],
            names=["bucket", "salt", "rows"])
    return t


def materialize_conversations(
    triples: rd.Dataset,
    out_dir: str,
    cfg: PipelineConfig,
    *,
    hot: dict[str, int] | None = None,
    lineage: dict | None = None,
    unscored: bool = False,
) -> dict:
    """Group → order → dedup → partitioned write + per-bucket manifests.

    Returns summary metrics.  Buckets already present in ``_manifest/``
    must have been filtered upstream (filter_done_buckets) — this
    function writes only what it receives and manifests exactly the
    buckets it wrote."""
    t0 = time.time()
    _dbg = os.environ.get("KGREF_TIMING")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)

    B = cfg.num_buckets
    staging = os.path.join(out_dir, "_staging")
    stats_dir = os.path.join(out_dir, "_convstats")
    import shutil as _sh

    # a crashed previous run may have left partial parquet in _staging;
    # write_parquet would APPEND new uuid-named files next to them and
    # finalize would merge both into the bucket → duplicated triples.
    # Staging is never a resume unit (only manifested buckets are), so
    # always start clean.
    _sh.rmtree(staging, ignore_errors=True)
    _sh.rmtree(stats_dir, ignore_errors=True)
    os.makedirs(stats_dir, exist_ok=True)

    # subj is derivable from (conv, turn, span) — don't ship ~25
    # redundant bytes/row through the exchange; re-derived per bucket.
    # Unscored runs also drop the constant-0.0 score column (re-added
    # vectorized after the exchange).
    drop = ["subj", "score"] if unscored else ["subj"]
    salted = add_salt_column(triples.drop_columns(drop), hot or {},
                             cfg.salt_chunk)
    salted = salted.map_batches(lambda b: add_bucket_column(b, B),
                                batch_format="pyarrow")

    # THE shuffle: co-locate whole conversations by bucket (hot convs
    # additionally split by range-salt), then ONE vectorized sort+dedup
    # per group — not one pandas call per conversation — and the
    # partition file is written INSIDE the group task (each group is
    # exactly one bucket=NNNN/salt-S.parquet partition; zstd for ~30%
    # smaller files than snappy, measured wall-neutral).  Only bucket
    # metadata rows flow out of the stage: the old
    # write_parquet(partition_cols=...) sink re-shipped every triple
    # through the object store into a second task wave, measured as
    # ~20 s pure overhead at 32 CPUs / REP=64 (profile_phases.py) that
    # ANTI-scaled with CPU count.
    meta = salted.groupby(["bucket", "salt"]).map_groups(
        lambda t: _order_dedup_bucket(t, stats_dir, write_root=staging),
        batch_format="pyarrow",
    )
    # consume the (bucket, salt, rows) metadata stream — drives the
    # pipeline to completion; tiny (one row per salt group)
    meta.sum("rows")
    t_written = time.time()
    if _dbg:
        print(f"[materialize] shuffle+write {t_written - t0:.1f}s",
              file=__import__('sys').stderr, flush=True)

    # finalize: move bucket dirs into place atomically, then manifest them.
    # per-bucket row counts come from parquet footers (cheap metadata reads).
    import pyarrow.parquet as pq

    written = sorted(
        d for d in os.listdir(staging) if d.startswith("bucket=")
    ) if os.path.isdir(staging) else []
    metrics = {"buckets": 0, "rows": 0, "wall_sec": 0.0}

    # worker-side sidecars → per-bucket stats without re-reading data
    bucket_stats: dict[int, dict] = {}
    for f in os.listdir(stats_dir):
        if f.endswith(".json") and not f.startswith("."):
            s = json.load(open(os.path.join(stats_dir, f)))
            agg = bucket_stats.setdefault(s["bucket"],
                                          {"rows": 0, "num_convs": 0,
                                           "salt_groups": 0,
                                           "exchange_bytes": 0})
            agg["rows"] += s["rows"]
            # per-salt nunique; exact unless a hot conv spans salts, in
            # which case this is an upper bound (documented)
            agg["num_convs"] += s["num_convs"]
            agg["salt_groups"] += 1
            agg["exchange_bytes"] += s.get("exchange_bytes", 0)

    def _finalize_bucket(d: str) -> tuple[int, int]:
        bid = int(d.split("=")[1])
        src = os.path.join(staging, d)
        dst = os.path.join(out_dir, f"bucket={bid:04d}")
        if os.path.exists(dst):
            import shutil

            shutil.rmtree(dst)
        os.rename(src, dst)
        rows = 0
        for f in os.listdir(dst):
            if f.endswith(".parquet"):
                rows += pq.read_metadata(os.path.join(dst, f)).num_rows
        st = bucket_stats.get(bid, {})
        manifest = {
            "bucket": bid,
            "rows": rows,
            "num_convs": st.get("num_convs", 0),
            "salt_groups": st.get("salt_groups", 0),
            "exchange_bytes": st.get("exchange_bytes", 0),
            "completed_at": time.time(),
            "lineage": lineage or {},
        }
        tmp = os.path.join(out_dir, MANIFEST_DIR, f".bucket-{bid}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(out_dir, MANIFEST_DIR,
                                    f"bucket-{bid}.json"))
        return bid, rows

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        for _bid, rows in pool.map(_finalize_bucket, written):
            metrics["buckets"] += 1
            metrics["rows"] += rows
    metrics["exchange_bytes"] = sum(
        s["exchange_bytes"] for s in bucket_stats.values())
    if _dbg:
        print(f"[materialize] +manifests {time.time() - t0:.1f}s",
              file=__import__('sys').stderr, flush=True)
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    _sh.rmtree(stats_dir, ignore_errors=True)
    metrics["wall_sec"] = round(time.time() - t0, 3)
    # phase split for scaling attribution (scripts/profile_phases.py):
    # annotate+exchange+partitioned-write vs driver-side finalize
    metrics["pipeline_write_sec"] = round(t_written - t0, 3)
    metrics["finalize_sec"] = round(time.time() - t_written, 3)
    return metrics
