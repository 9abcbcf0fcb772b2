"""Distributed Lloyd's k-means over the embedding column — the
clustering stage a training-data pipeline uses for semantic dedup,
coreset selection, and domain discovery (cluster-then-filter).

Exactness design (what makes a FLOAT-mean iterative algorithm
hash-gateable): embeddings quantize once to int64 fixed point
(1e-4 — the label_centroids convention), every distance is an exact
int64 sum of squared diffs, ties break on the smallest centroid id,
and each round's new centroids are re-quantized to int64 via
``floor(sum / n + 0.5)`` — so accumulation order, batch boundaries and
iteration count can never flip a single bit, and the SQL twin (the
same rounds unrolled as CTE chains) matches bit-for-bit.

Scale shape (100 TB story): per iteration, ONE streaming pass over the
corpus — centroids broadcast via ``ray.put`` (k×d int64, KBs), each
batch computes assignments in a chunked numpy kernel and reduces to
(cluster, dim, partial_sum, n) long-form partials, so the all-to-all
carries k×d rows per batch regardless of corpus size; the groupby
output (k×d rows) is the ONLY thing the driver ever holds between
rounds.  Empty clusters drop out (both sides), documented Lloyd
variant.  The embedding matrix is never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

K_CLUSTERS = 8
N_ITERS = 4
_FX = 10000
_CHUNK = 1 << 19  # max distance-matrix cells per numpy chunk


def _fx_quant(flat: np.ndarray) -> np.ndarray:
    return np.floor(flat.astype(np.float64) * _FX + 0.5).astype(np.int64)


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: the k smallest vec_ids (filter pushed into
    the read — k rows ever leave storage)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filter=pc.field("vec_id") < k)
    rows = sorted(ds.take_all(), key=lambda r: r["vec_id"])  # k rows
    return np.stack([_fx_quant(np.asarray(r["embedding"])) for r in rows])


def assign_chunk(fx: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact int64 argmin assignment; np.argmin takes the FIRST minimum,
    which with centroid rows ordered by id IS the smallest-id tie-break
    the SQL twin's ``ORDER BY dist, cid`` applies."""
    k, d = cent.shape
    rows = max(1, _CHUNK // (k * d))
    out = np.empty(len(fx), np.int64)
    for s in range(0, len(fx), rows):
        diff = fx[s:s + rows, None, :] - cent[None, :, :]
        out[s:s + rows] = np.argmin((diff * diff).sum(axis=2), axis=1)
    return out


def _round(ds, cent: np.ndarray, ids: np.ndarray):
    """One Lloyd round: returns the (cluster, dim) -> (sum_fx, n)
    aggregate as a Dataset (k×d rows).  ``cluster`` carries the
    ORIGINAL init id (``ids[argmin row]``) so cluster identity is
    stable across rounds and blocks — never a per-batch dense code."""
    import ray
    from ray.data.aggregate import Sum

    cref = ray.put((cent, ids))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray
        C, cids = _ray.get(cref)
        k, d = C.shape
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.table({"cluster": pa.array([], pa.int32()),
                             "dim": pa.array([], pa.int32()),
                             "sum_fx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        fx = _fx_quant(emb.flatten().to_numpy(
            zero_copy_only=False)).reshape(n, -1)
        assign = cids[assign_chunk(fx, C)]  # rows -> original init ids
        codes, inv = np.unique(assign, return_inverse=True)
        sums = np.zeros((len(codes), d), np.int64)
        np.add.at(sums, inv, fx)
        counts = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        g = len(codes)
        return pa.table({
            "cluster": pa.array(np.repeat(codes.astype(np.int32), d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int32), g)),
            "sum_fx": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(counts, d))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("sum_fx", alias_name="sum_fx"),
                       Sum("n", alias_name="n")))


def _refresh(agg_rows: list[dict], d: int) -> tuple[np.ndarray, np.ndarray]:
    """k×d driver-side centroid rebuild (the ONLY materialized state):
    new fx = floor(sum / n + 0.5); empty clusters drop out.  Returns
    (centroids sorted by original id, the surviving original ids)."""
    cent: dict[int, list[int]] = {}
    for r in agg_rows:
        row = cent.setdefault(int(r["cluster"]), [0] * d)
        row[int(r["dim"]) - 1] = int(np.floor(r["sum_fx"] / r["n"] + 0.5))
    ids = np.array(sorted(cent), np.int64)
    return np.stack([np.array(cent[c], np.int64) for c in ids]), ids


def kmeans_train(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS):
    """(cluster, dim, value, n) after ``iters`` Lloyd rounds: final
    cluster means (4-decimal fixed point) and sizes, keyed by the
    cluster's ORIGINAL init id (the seed row's vec_id)."""
    ds = _embeddings(sf_dir)
    cent = _init_centroids(sf_dir, k)
    ids = np.arange(k, dtype=np.int64)
    d = cent.shape[1]
    for _ in range(iters - 1):
        # k×d rows: bounded driver state between rounds
        cent, ids = _refresh(_round(ds, cent, ids).take_all(), d)
    final = _round(ds, cent, ids)

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("sum_fx").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        val = np.floor(s.astype(np.float64) / n + 0.5) / _FX
        return pa.table({"cluster": t.column("cluster"),
                         "dim": t.column("dim"),
                         "value": pa.array(val, pa.float64()),
                         "n": t.column("n")})

    return final.map_batches(finish, batch_format="pyarrow")


def kmeans_iteration(sf_dir: str):
    """Gate query: ONE Lloyd round from the deterministic init."""
    return kmeans_train(sf_dir, iters=1)


def _round_sql(i: int) -> str:
    """CTE chain for round i: distances d{i}, assignment a{i},
    per-cluster sums m{i}, re-quantized centroids c{i+1}."""
    return f"""
d{i} AS (SELECT e.vec_id, c.cid,
               sum((e.fx - c.cfx) * (e.fx - c.cfx)) AS dist
        FROM e JOIN c{i} c ON c.dim = e.dim GROUP BY e.vec_id, c.cid),
a{i} AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d{i}) WHERE rn = 1),
m{i} AS (SELECT a.cid, e.dim, sum(e.fx) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM a{i} a JOIN e ON e.vec_id = a.vec_id GROUP BY a.cid, e.dim),
c{i + 1} AS (SELECT cid, dim,
                    CAST(floor(s * 1.0 / n + 0.5) AS BIGINT) AS cfx
             FROM m{i})"""


def kmeans_train_sql(k: int = K_CLUSTERS, iters: int = N_ITERS) -> str:
    rounds = ",".join(_round_sql(i) for i in range(iters))
    last = iters - 1
    return f"""
WITH e AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_FX} + 0.5)
              AS BIGINT) AS fx
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, dim, fx AS cfx FROM e WHERE vec_id < {k}),
{rounds}
SELECT CAST(cid AS INTEGER) AS cluster, dim,
       floor(s * 1.0 / n + 0.5) / {_FX} AS value, n
FROM m{last}
"""


def kmeans_iteration_sql() -> str:
    return kmeans_train_sql(iters=1)


SEM_T = 160_000_000  # fixed-point squared-distance near-dup threshold


def semantic_dedup(sf_dir: str, k: int = K_CLUSTERS, thresh: int = SEM_T):
    """(vec_a, vec_b, dist2_fx) with vec_a < vec_b — SemDeDup-style
    semantic near-dup pairs (Abbas et al. 2023, public method): assign
    every embedding to its nearest centroid, then compare pairs WITHIN
    clusters only, keeping those with exact int64 fixed-point squared
    distance ≤ thresh.

    Scale shape: the whole point of clustering first is that pair cost
    drops from O(n²) to Σ m_i² over cluster sizes; the exchange is ONE
    cluster-keyed groupby moving (cluster, vec_id, quantized vector) —
    256 B/row at d=64 — and the per-cluster kernel is a chunked
    block-nested numpy loop (the ops/similarity.py bound), never a
    per-pair Python step.  Exactness: same fixed-point arithmetic as
    kmeans_train, so the SQL twin (assignment CTEs + within-cluster
    self-join) matches bit-for-bit."""
    import ray

    cent = _init_centroids(sf_dir, k)
    ids = np.arange(k, dtype=np.int64)
    cref = ray.put((cent, ids))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray
        C, cids = _ray.get(cref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "fx": pa.array([], pa.list_(pa.int64()))})
        fx = _fx_quant(emb.flatten().to_numpy(
            zero_copy_only=False)).reshape(n, -1)
        a = cids[assign_chunk(fx, C)]
        d = fx.shape[1]
        offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32),
                        pa.int32())
        return pa.table({
            "cluster": pa.array(a),
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "fx": pa.ListArray.from_arrays(offs,
                                           pa.array(fx.reshape(-1)))})

    def pairs(df) -> "pd.DataFrame":
        import pandas as pd
        vid = df["vec_id"].to_numpy(np.int64)
        order = np.argsort(vid, kind="stable")
        vid = vid[order]
        fx = np.stack(df["fx"].to_numpy()[order]).astype(np.int64)
        m, d = fx.shape
        rows_a, rows_b, dist = [], [], []
        blk = max(1, _CHUNK // max(1, m * d))  # block-nested-loop bound
        for s in range(0, m, blk):
            diff = fx[s:s + blk, None, :] - fx[None, :, :]
            d2 = (diff * diff).sum(axis=2)
            ai, bi = np.nonzero(d2 <= thresh)
            keep = (ai + s) < bi  # upper triangle in vec_id order
            rows_a.append(vid[ai[keep] + s])
            rows_b.append(vid[bi[keep]])
            dist.append(d2[ai[keep], bi[keep]])
        return pd.DataFrame({
            "vec_a": np.concatenate(rows_a) if rows_a else
            np.empty(0, np.int64),
            "vec_b": np.concatenate(rows_b) if rows_b else
            np.empty(0, np.int64),
            "dist2_fx": np.concatenate(dist) if dist else
            np.empty(0, np.int64)})

    return (_embeddings(sf_dir)
            .map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(lambda df: pairs(df.drop(columns=["cluster"])),
                        batch_format="pandas"))


def semantic_dedup_sql(k: int = K_CLUSTERS, thresh: int = SEM_T) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_FX} + 0.5)
              AS BIGINT) AS fx
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, dim, fx AS cfx FROM e WHERE vec_id < {k}),
d0 AS (SELECT e.vec_id, c.cid,
              sum((e.fx - c.cfx) * (e.fx - c.cfx)) AS dist
       FROM e JOIN c0 c ON c.dim = e.dim GROUP BY e.vec_id, c.cid),
a0 AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY dist, cid) AS rn
        FROM d0) WHERE rn = 1)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(sum((ea.fx - eb.fx) * (ea.fx - eb.fx)) AS BIGINT) AS dist2_fx
FROM a0 a JOIN a0 b ON b.cid = a.cid AND a.vec_id < b.vec_id
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
GROUP BY a.vec_id, b.vec_id
HAVING sum((ea.fx - eb.fx) * (ea.fx - eb.fx)) <= {thresh}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["kmeans_iteration"] = kmeans_iteration
    q["kmeans_train"] = kmeans_train
    q["semantic_dedup"] = semantic_dedup
    if o is not None:
        o["kmeans_iteration"] = kmeans_iteration_sql()
        o["kmeans_train"] = kmeans_train_sql()
        o["semantic_dedup"] = semantic_dedup_sql()
