"""KG-embedding training-data preparation over the annotator's triples.

The step AFTER KG construction in a training pipeline: the extracted
(turn × class) annotation graph becomes supervision for a knowledge-
graph-embedding model (TransE-family, Bordes et al. 2013), which needs
three dataset-prep operators the reference never ships but any
production KG training run requires:

- ``kg_train_split``: leakage-safe train/valid/test split of the
  distinct positive triples.  The standard KGE split constraint is
  that EVERY entity appearing in valid/test must also appear in train
  (an embedding for an unseen entity is untrainable), enforced here by
  anchoring, per class, the positive with the minimum hash into train;
  the rest split 80/10/10 on an independent splitmix64 stream.
- ``kg_negative_sampling``: K deterministic corrupted triples per
  positive (replace the class with a pseudo-random OTHER vocabulary
  class), FILTERED against the true positives of the same document so
  no "negative" is actually a positive (the filtered-sampling variant
  of Bordes et al.).
- ``shuffle_shards``: the dataloader-facing finale — a deterministic
  global permutation of the corpus into N training shards with an
  exact in-shard position, so a multi-node reader can stream its shard
  in a reproducible shuffled order without coordination.

Everything is stateless splitmix64 arithmetic (ops/sampling.py's
stream machinery) so each op has an exact DuckDB twin: the same hash
chain is emitted in HUGEINT SQL (mod-2^64 multiplies via the split-at-
2^32 trick), and the gate compares full row sets hash-for-hash.

Scale shape: positives are deduplicated with per-batch partials
BEFORE one conv-bucket exchange (buckets hold whole conversations, so
bucket-local dedup is globally exact — stages/materialize.py's
flagship key, reused); the class vocabulary is the only collected side
(node-dimension, same documented budget as the annotate stage's
closure broadcast) and rides as one sorted broadcast array; negative
candidates are generated AND filtered inside the same bucket group, so
the true-positive membership check never leaves the partition it is
co-located with.  ``shuffle_shards`` never sorts globally: a
(shard × high-bits-of-hash) count combiner (≤ n_shards·n_parts rows)
plus broadcast exclusive offsets turn the permutation into one coarse
hash-range exchange with per-group vectorized ranks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import _C1, _C2, _C3, _M64, _sql_mul64, splitmix64

# independent hash streams (offsets added pre-finalizer, like
# sampling._STRAT_OFFSET keeps sample_stratified independent of
# sample_docs over the same ids)
_OFF_SPLIT = 7_777_777
_OFF_NEG = 13_131_131
_OFF_SHARD = 3_333_331

_SPLIT_BUCKETS = 32
TRAIN_PCT = 80  # train < 80, valid < 90, test otherwise
VALID_PCT = 10
NEG_K = 4
N_SHARDS = 16
_SHARD_PART_BITS = 6  # 64 coarse hash-range partitions


def _key_hash(doc_id: np.ndarray, rank: np.ndarray,
              offset: int) -> np.ndarray:
    """splitmix64 over the packed (doc, class-rank) key.  The pack is
    ``doc_id·2^32 + rank + offset`` in wrapping uint64 — a constant-
    multiplier form the SQL twin reproduces with one `_sql_mul64`; a
    wrap collision merely makes two triples share a stream value,
    which both sides compute identically."""
    key = (doc_id.astype(np.uint64) * np.uint64(1 << 32)
           + rank.astype(np.uint64) + np.uint64(offset))
    return splitmix64(key)


def _sql_hash_cols(x_expr: str, src: str) -> str:
    """CTE chain computing h = splitmix64(x_expr) over ``src``; the
    final relation is ``hh`` with all of ``src``'s columns plus h."""
    z2 = _sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)
    z3 = _sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)
    return f"""
hx AS (SELECT *, (({x_expr}) + {_C1}) % {_M64} AS z1 FROM {src}),
hy AS (SELECT *, {z2} AS z2 FROM hx),
hz AS (SELECT *, {z3} AS z3 FROM hy),
hh AS (SELECT * EXCLUDE (z1, z2, z3), xor(z3, z3 // {1 << 31}) AS h
       FROM hz)"""


def _turns_per_conv() -> int:
    from .. import docdict

    return docdict.TURNS_PER_CONV


def _positives(sf_dir: str):
    """Distinct (doc_id, class_uri) positives as a Dataset: per-batch
    partial dedup shrinks the exchange, then ONE conv-bucket groupby
    finishes it exactly (a bucket holds whole conversations)."""
    import pyarrow.compute as pc

    from .kgraph import _direct_triples

    tpc = _turns_per_conv()

    def partial(t: pa.Table) -> pa.Table:
        conv = pc.utf8_slice_codeunits(
            t.column("conv_id").cast(pa.string()), 5, 2**31 - 1)
        doc_id = pc.add(
            pc.multiply(pc.cast(conv, pa.int64()),
                        pa.scalar(tpc, pa.int64())),
            t.column("turn_idx").cast(pa.int64()))
        sub = pa.Table.from_arrays(
            [doc_id, t.column("obj").cast(pa.string())],
            names=["doc_id", "class_uri"])
        return sub.group_by(["doc_id", "class_uri"]).aggregate([])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_id", "class_uri"])[
            ["doc_id", "class_uri"]]

    return (_direct_triples(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda b: add_bucket_column_doc(b, _SPLIT_BUCKETS),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finish, batch_format="pandas"))


def add_bucket_column_doc(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Bucket by conversation derived arithmetically from doc_id (the
    string conv_id is already projected away by the partial)."""
    import pyarrow.compute as pc

    conv = pc.divide(batch.column("doc_id").cast(pa.int64()),
                     pa.scalar(_turns_per_conv(), pa.int64()))
    bucket = pc.cast(
        pc.bit_wise_and(conv, pa.scalar(num_buckets - 1, pa.int64())),
        pa.int32())
    return batch.append_column("bucket", bucket)


def _vocab(pos) -> tuple[pa.Array, int]:
    """Sorted distinct class-URI vocabulary (node-dimension-sized — the
    same documented broadcast budget as kgraph._edge_ids)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def uris(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.unique(t.column("class_uri").combine_chunks())],
            names=["u"])

    df = (pos.map_batches(uris, batch_format="pyarrow")
          .groupby("u").aggregate(Count(alias_name="_c"))
          .to_pandas())  # class-dimension-sized: documented small side
    arr = pa.array(sorted(df["u"].tolist()), pa.string())
    return arr, len(arr)


def _pos_cte() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    tpc = _turns_per_conv()
    return f"""
tri AS ({tri}),
pos AS (SELECT DISTINCT CAST(substr(conv_id, 6) AS BIGINT) * {tpc}
               + turn_idx AS doc_id,
               obj AS class_uri
        FROM tri WHERE pred = 'annotated_with'),
vocab AS (SELECT class_uri,
                 CAST(row_number() OVER (ORDER BY class_uri) - 1
                      AS HUGEINT) AS r
          FROM (SELECT DISTINCT class_uri FROM pos) q),
cnt AS (SELECT CAST(count(*) AS HUGEINT) AS c FROM vocab)"""


def _pack_sql(off: int) -> str:
    return (f"({_sql_mul64('CAST(doc_id AS HUGEINT)', 1 << 32)}"
            f" + r + {off}) % {_M64}")


# ---------------------------------------------------------------------------
# kg_train_split


def kg_train_split(sf_dir: str):
    """(doc_id, class_uri, split) — leakage-safe KGE dataset split.

    Per class, the positive with the minimum hash is anchored to
    'train' (every class is guaranteed trainable); the rest go
    train/valid/test at 80/10/10 on the same stream.  One class-keyed
    Min aggregate (combiner-shrunk) is the only exchange past the
    positives prologue; the per-class minimum rides back as a sorted
    broadcast pair of parallel arrays (the ops/lm.py searchsorted
    pattern)."""
    import ray
    from ray.data.aggregate import Min

    pos = _positives(sf_dir).materialize()
    uris, _n = _vocab(pos)
    uri_ref = ray.put(uris)
    uri_np = np.asarray(uris)

    def with_h(t: pa.Table) -> pa.Table:
        lut = np.asarray(ray.get(uri_ref))
        cls = t.column("class_uri").to_numpy(zero_copy_only=False)
        r = np.searchsorted(lut, cls)
        h = _key_hash(t.column("doc_id").to_numpy(zero_copy_only=False),
                      r, _OFF_SPLIT)
        return t.append_column("h", pa.array(h, pa.uint64()))

    hset = pos.map_batches(with_h, batch_format="pyarrow").materialize()

    def min_partial(t: pa.Table) -> pa.Table:
        g = t.select(["class_uri", "h"]).group_by("class_uri").aggregate(
            [("h", "min")])
        return pa.Table.from_arrays(  # select by NAME: pyarrow's
            [g.column("class_uri"), g.column("h_min")],  # key/agg column
            names=["class_uri", "h"])  # order varies across versions

    mins = (hset.map_batches(min_partial, batch_format="pyarrow")
            .groupby("class_uri").aggregate(Min("h", alias_name="mh"))
            .to_pandas())  # class-dimension-sized: documented small side
    mins = mins.sort_values("class_uri", kind="mergesort")
    assert (mins["class_uri"].to_numpy() == uri_np).all()
    min_ref = ray.put(mins["mh"].to_numpy().astype(np.uint64))

    def assign(t: pa.Table) -> pa.Table:
        lut = np.asarray(ray.get(uri_ref))
        mh = ray.get(min_ref)
        cls = t.column("class_uri").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        anchored = h == mh[np.searchsorted(lut, cls)]
        pct = h % np.uint64(100)
        split = np.where(
            anchored | (pct < TRAIN_PCT), "train",
            np.where(pct < TRAIN_PCT + VALID_PCT, "valid", "test"))
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()), t.column("class_uri"),
             pa.array(split, pa.string())],
            names=["doc_id", "class_uri", "split"])

    return hset.map_batches(assign, batch_format="pyarrow")


def kg_train_split_sql() -> str:
    return f"""
WITH {_pos_cte()},
keyed AS (SELECT doc_id, p.class_uri, r
          FROM pos p JOIN vocab v USING (class_uri)),
{_sql_hash_cols(_pack_sql(_OFF_SPLIT), 'keyed')},
m AS (SELECT class_uri, min(h) AS mh FROM hh GROUP BY class_uri)
SELECT hh.doc_id, hh.class_uri,
       CASE WHEN hh.h = m.mh OR hh.h % 100 < {TRAIN_PCT} THEN 'train'
            WHEN hh.h % 100 < {TRAIN_PCT + VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM hh JOIN m USING (class_uri)
"""


# ---------------------------------------------------------------------------
# kg_negative_sampling


def kg_negative_sampling(sf_dir: str, k: int = NEG_K):
    """(doc_id, pos_uri, j, neg_uri) — K deterministic filtered
    corruptions per positive.  neg_rank = (r + 1 + h_j % (C-1)) % C
    can never reproduce the corrupted positive itself; candidates that
    collide with ANOTHER true positive of the same document are
    dropped (filtered sampling).  Generation and filtering both run
    inside the conv-bucket group that already co-locates every
    positive of a document, so the membership anti-join is a per-group
    vectorized merge — no extra exchange, no broadcast of the
    triple-count-sized positive set."""
    import ray

    pos = _positives(sf_dir).materialize()
    uris, n = _vocab(pos)
    uri_ref = ray.put(uris)

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        lut = np.asarray(ray.get(uri_ref))
        c = np.uint64(n)
        doc = df["doc_id"].to_numpy(np.int64)
        r = np.searchsorted(lut, df["class_uri"].to_numpy())
        docs_k = np.repeat(doc, k)
        rs_k = np.repeat(r.astype(np.uint64), k)
        js = np.tile(np.arange(1, k + 1, dtype=np.uint64), len(df))
        h = splitmix64(docs_k.astype(np.uint64) * np.uint64(1 << 32)
                       + rs_k + js * np.uint64(_OFF_NEG))
        nr = (rs_k + np.uint64(1) + h % (c - np.uint64(1))) % c
        cand = pd.DataFrame({
            "doc_id": docs_k,
            "pos_uri": np.repeat(df["class_uri"].to_numpy(), k),
            "j": js.astype(np.int64), "nr": nr.astype(np.int64)})
        truth = pd.DataFrame({"doc_id": doc, "nr": r.astype(np.int64)})
        merged = cand.merge(truth, on=["doc_id", "nr"], how="left",
                            indicator=True)
        kept = merged[merged["_merge"] == "left_only"]
        out = kept[["doc_id", "pos_uri", "j"]].copy()
        out["neg_uri"] = lut[kept["nr"].to_numpy()]
        return out

    return (pos.map_batches(
        lambda b: add_bucket_column_doc(b, _SPLIT_BUCKETS),
        batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(corrupt, batch_format="pandas"))


def kg_negative_sampling_sql(k: int = NEG_K) -> str:
    return f"""
WITH {_pos_cte()},
keyed AS (SELECT doc_id, p.class_uri, r, j
          FROM pos p JOIN vocab v USING (class_uri)
          CROSS JOIN range(1, {k + 1}) t(j)),
{_sql_hash_cols(
    f"({_sql_mul64('CAST(doc_id AS HUGEINT)', 1 << 32)}"
    f" + r + CAST(j AS HUGEINT) * {_OFF_NEG}) % {_M64}", 'keyed')},
cand AS (SELECT hh.doc_id, hh.class_uri AS pos_uri,
                CAST(hh.j AS BIGINT) AS j,
                (hh.r + 1 + hh.h % (cnt.c - 1)) % cnt.c AS nr
         FROM hh, cnt)
SELECT c.doc_id, c.pos_uri, c.j, v.class_uri AS neg_uri
FROM cand c JOIN vocab v ON v.r = c.nr
ANTI JOIN pos p ON p.doc_id = c.doc_id AND p.class_uri = v.class_uri
"""


# ---------------------------------------------------------------------------
# shuffle_shards


def shuffle_shards(sf_dir: str, n_shards: int = N_SHARDS,
                   part_bits: int = _SHARD_PART_BITS):
    """(doc_id, shard, pos) — deterministic global shuffle of the
    corpus into ``n_shards`` training shards with exact in-shard
    positions (rank by hash within shard), WITHOUT a global sort:

    1. one column-pruned pass assigns h = splitmix64(doc_id), shard =
       h % n_shards, and a coarse hash-range part (top ``part_bits``
       of h);
    2. a (shard × part) count combiner — at most n_shards·2^part_bits
       rows ever reach the small groupby — yields broadcast exclusive
       offsets per shard in part order;
    3. ONE exchange co-locates each hash range; per-group vectorized
       rank-by-(h, doc_id) plus the offset is the global position.

    The hash-range part key means shard files can also be WRITTEN
    partition-resumably in position order."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    n_parts = 1 << part_bits

    def keyed(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64) + np.uint64(_OFF_SHARD))
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        part = (h >> np.uint64(64 - part_bits)).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()),
             pa.array(shard), pa.array(h, pa.uint64()), pa.array(part)],
            names=["doc_id", "shard", "h", "part"])

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
          .map_batches(keyed, batch_format="pyarrow").materialize())

    def count_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["shard", "part"]).group_by(["shard", "part"])
             .aggregate([("part", "count")]))
        return pa.Table.from_arrays(  # name-addressed: see min_partial
            [g.column("shard"), g.column("part"), g.column("part_count")],
            names=["shard", "part", "n"])

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["shard", "part"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())  # ≤ n_shards · n_parts rows: documented small
    counts = counts.sort_values(["shard", "part"], kind="mergesort")
    offs = np.zeros(n_shards * n_parts, np.int64)
    flat = (counts["shard"].to_numpy(np.int64) * n_parts
            + counts["part"].to_numpy(np.int64))
    per_shard = counts.groupby("shard", sort=True)["n"].cumsum().to_numpy()
    offs[flat] = per_shard - counts["n"].to_numpy(np.int64)
    off_ref = ray.put(offs)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(off_ref)
        df = df.sort_values(["shard", "h", "doc_id"], kind="mergesort")
        base = lut[df["shard"].to_numpy(np.int64) * n_parts
                   + df["part"].to_numpy(np.int64)]
        within = df.groupby("shard", sort=False).cumcount().to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "shard": df["shard"].to_numpy(np.int64),
            "pos": base + within})

    return ds.groupby("part").map_groups(rank, batch_format="pandas")


def shuffle_shards_sql(n_shards: int = N_SHARDS) -> str:
    return f"""
WITH d AS (SELECT doc_id,
                  (CAST(doc_id AS HUGEINT) + {_OFF_SHARD}) % {_M64} AS x
           FROM documents),
{_sql_hash_cols('x', 'd')}
SELECT doc_id, CAST(h % {n_shards} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {n_shards}
                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM hh
"""


def write_training_shards(sf_dir: str, out_dir: str,
                          n_shards: int = N_SHARDS,
                          part_bits: int = _SHARD_PART_BITS) -> dict:
    """Materialize the :func:`shuffle_shards` permutation as a
    RESUMABLE partitioned training corpus: one
    ``out_dir/shard=SSSS/part=PPPP.parquet`` file per (shard,
    hash-range part) — rows (pos, doc_id, lang, text) sorted by the
    exact global in-shard position — plus a ``_manifest/`` JSON per
    part (row count, shards touched) written atomically AFTER its
    data, so a re-run skips finished parts BEFORE the exchange (the
    flagship sink's resume contract, stages/materialize.py).  A
    dataloader streams shard S in permuted order by reading its part
    files in part order; never one giant file.  The corpus text moves
    exactly once, through the same single coarse exchange the
    assignment op uses."""
    import json
    import os

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    n_parts = 1 << part_bits
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    done = {int(f[5:-5]) for f in os.listdir(mdir)
            if f.startswith("part-") and f.endswith(".json")}

    def keyed(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64) + np.uint64(_OFF_SHARD))
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        part = (h >> np.uint64(64 - part_bits)).astype(np.int64)
        keep = ~np.isin(part, np.fromiter(done, np.int64, len(done))) \
            if done else np.ones(len(part), bool)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()).filter(pa.array(keep)),
             t.column("lang").filter(pa.array(keep)),
             t.column("text").filter(pa.array(keep)),
             pa.array(shard[keep]), pa.array(h[keep], pa.uint64()),
             pa.array(part[keep])],
            names=["doc_id", "lang", "text", "shard", "h", "part"])

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "lang", "text"])
          .map_batches(keyed, batch_format="pyarrow").materialize())

    def count_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["shard", "part"]).group_by(["shard", "part"])
             .aggregate([("part", "count")]))
        return pa.Table.from_arrays(
            [g.column("shard"), g.column("part"), g.column("part_count")],
            names=["shard", "part", "n"])

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["shard", "part"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())  # ≤ n_shards · n_parts rows
    if not len(counts):
        return {"parts": 0, "rows": 0}
    counts = counts.sort_values(["shard", "part"], kind="mergesort")
    # offsets must be GLOBAL (include rows in already-done parts), so a
    # partial resume reproduces the identical positions: recompute the
    # full per-(shard, part) counts from the manifests for done parts
    base_counts = {(int(s), int(p)): int(n) for s, p, n in
                   zip(counts["shard"], counts["part"], counts["n"])}
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                man = json.load(fh)
            for s, n in man["shard_rows"].items():
                base_counts[(int(s), man["part"])] = int(n)
    keys = sorted(base_counts)
    offs: dict[tuple[int, int], int] = {}
    acc_shard, acc = -1, 0
    for s, p in keys:
        if s != acc_shard:
            acc_shard, acc = s, 0
        offs[(s, p)] = acc
        acc += base_counts[(s, p)]
    off_ref = ray.put(offs)

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        lut = ray.get(off_ref)
        pid = int(df["part"].iloc[0])
        df = df.sort_values(["shard", "h", "doc_id"], kind="mergesort")
        within = df.groupby("shard", sort=False).cumcount().to_numpy()
        codes, uniq = pd.factorize(df["shard"].to_numpy())
        base = np.array([lut[(int(s), pid)] for s in uniq], np.int64)
        df = df.assign(pos=base[codes] + within)
        shard_rows = {}
        for s, g in df.groupby("shard", sort=True):
            sdir = os.path.join(out_dir, f"shard={int(s):04d}")
            os.makedirs(sdir, exist_ok=True)
            out = g.sort_values("pos")[["pos", "doc_id", "lang", "text"]]
            tmp = os.path.join(sdir, f".part={pid:04d}.parquet.tmp")
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                           tmp, compression="zstd")
            os.rename(tmp, os.path.join(sdir, f"part={pid:04d}.parquet"))
            shard_rows[int(s)] = len(g)
        tmp = os.path.join(mdir, f".part-{pid}.json.tmp")
        with open(tmp, "w") as fh:  # manifest AFTER data: crash-safe
            json.dump({"part": pid, "rows": len(df),
                       "shard_rows": shard_rows}, fh)
        os.rename(tmp, os.path.join(mdir, f"part-{pid}.json"))
        return pd.DataFrame({"part": [pid], "rows": [len(df)]})

    res = (ds.groupby("part")
           .map_groups(write_part, batch_format="pandas").to_pandas())
    return {"parts": int(len(res)), "rows": int(res["rows"].sum())}


def register(q: dict, o: dict | None = None) -> None:
    q["kg_train_split"] = kg_train_split
    q["kg_negative_sampling"] = kg_negative_sampling
    q["shuffle_shards"] = shuffle_shards
    if o is not None:
        o["kg_train_split"] = kg_train_split_sql()
        o["kg_negative_sampling"] = kg_negative_sampling_sql()
        o["shuffle_shards"] = shuffle_shards_sql()
