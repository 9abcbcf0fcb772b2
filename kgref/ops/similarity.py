"""Similarity search over an embedding column (``list<float>``).

Ray-Data-first layout: the SMALL side (query matrix, or the deduped
corpus matrix for all-pairs) is normalized once on the driver and
broadcast via ``ray.put``; ``map_batches`` streams the big side through
a numpy float64 matmul per batch — zero-copy Arrow in, top-k partial
per batch, one tiny ``groupby(query_id)`` reduce at the end.  Nothing
materializes the full similarity matrix.

- ``ann_topk``        exact brute-force cosine top-k (the baseline the
                      judge can oracle with DuckDB list_cosine_similarity)
- ``ann_topk_lsh``    random-hyperplane LSH buckets + multi-probe — the
                      scale path (probes ≪ corpus per query; recall < 1)
- ``embedding_dup_pairs``  all-pairs cosine ≥ τ near-dup detection

At 100 TB the corpus side streams in blocks while only the probe /
query structures are resident per worker; for corpus×corpus all-pairs
beyond broadcast size, shard the normalized matrix into B column blocks
and run B broadcast passes (block-nested-loop), or switch to the LSH
variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import round_half_up

TOPK = 5
N_QUERIES = 8
DUP_TAU = 0.45
LSH_PLANES = 12
LSH_PROBES = 8  # buckets probed per query (own + nearest by sign-flip)


def _normalized_matrix(sf_dir: str, where_max_id: int | None = None):
    """Driver-side load of the small/broadcast side (documented
    assumption: query/index matrix ≪ worker heap)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    if where_max_id is not None:
        keep = ids < where_max_id
        ids, mat = ids[keep], mat[keep]
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def _batch_to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    flat = emb.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def ann_topk(sf_dir: str, k: int = TOPK, n_queries: int = N_QUERIES):
    """Exact cosine top-k for query vectors (vec_id < n_queries) over the
    whole embeddings table.  Per-batch partial top-k keeps the shuffle at
    O(batches × queries × k) rows."""
    import ray
    import ray.data as rd

    qids, qmat = _normalized_matrix(sf_dir, where_max_id=n_queries)
    qref = ray.put((qids, qmat))

    class PartialTopK:
        def __init__(self, qref, k):
            self.qids, self.qmat = ray.get(qref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _batch_to_matrix(batch)
            sims = mat @ self.qmat.T  # (batch, nq)
            out_q, out_n, out_c = [], [], []
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                mask = ids != self.qids[qi]  # exclude self
                cids, cs = ids[mask], col[mask]
                if len(cids) == 0:
                    continue
                take = min(self.k, len(cids))
                # ties at the k-boundary break by SMALLER neighbor_id
                # (the oracle's ORDER BY c DESC, neighbor_id): lexsort,
                # not argpartition, so boundary ties are deterministic
                top = np.lexsort((cids, -cs))[:take]
                out_q.extend([int(self.qids[qi])] * take)
                out_n.extend(cids[top].tolist())
                out_c.extend(cs[top].tolist())
            return pa.Table.from_arrays(
                [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
                 pa.array(out_c, pa.float64())],
                names=["query_id", "neighbor_id", "cos_raw"],
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(PartialTopK, fn_constructor_args=(qref, k),
                             batch_format="pyarrow", concurrency=2)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos_raw", "neighbor_id"],
                            ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        return pd.DataFrame(
            {"query_id": df["query_id"],
             "rank": np.arange(1, len(df) + 1, dtype=np.int32),
             "neighbor_id": df["neighbor_id"],
             "cos": [round_half_up(c) for c in df["cos_raw"]]}
        )

    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")


def ann_topk_sql(k: int = TOPK, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, x.v) AS c
      FROM e q JOIN e x ON x.vec_id <> q.vec_id
      WHERE q.vec_id < {n_queries}),
r AS (SELECT query_id, neighbor_id, c,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY c DESC, neighbor_id) AS rnk
      FROM s)
SELECT query_id, CAST(rnk AS INTEGER) AS rank, neighbor_id,
       floor(c * 10000 + 0.5) / 10000 AS cos
FROM r WHERE rnk <= {k}
"""


def embedding_dup_pairs(sf_dir: str, tau: float = DUP_TAU):
    """All-pairs cosine ≥ τ.  Broadcast the normalized corpus matrix,
    stream row blocks against it; emit only (a < b) pairs."""
    import ray
    import ray.data as rd

    all_ids, all_mat = _normalized_matrix(sf_dir)
    ref = ray.put((all_ids, all_mat))

    class PairBlock:
        def __init__(self, ref, tau):
            self.ids, self.mat = ray.get(ref)
            self.tau = tau

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _batch_to_matrix(batch)
            sims = mat @ self.mat.T  # (batch, n_all)
            bi, aj = np.nonzero((sims >= self.tau)
                                & (ids[:, None] < self.ids[None, :]))
            return pa.Table.from_arrays(
                [pa.array(ids[bi], pa.int64()),
                 pa.array(self.ids[aj], pa.int64()),
                 pa.array([round_half_up(c) for c in sims[bi, aj]],
                          pa.float64())],
                names=["vec_a", "vec_b", "cos"],
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ds.map_batches(PairBlock, fn_constructor_args=(ref, tau),
                          batch_format="pyarrow", concurrency=2)


def embedding_dup_sql(tau: float = DUP_TAU) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor(list_cosine_similarity(a.v, b.v) * 10000 + 0.5) / 10000 AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {tau}
"""


def ann_topk_lsh(sf_dir: str, k: int = TOPK, n_queries: int = N_QUERIES):
    """LSH-bucketed approximate top-k (rows-only check: recall < 1 by
    design).  Index side: each vector lands in one of 2^PLANES sign
    buckets; query side probes its own bucket plus the PROBES-1 buckets
    at hamming distance 1 with the smallest margins (multi-probe)."""
    import ray
    import ray.data as rd

    rng = np.random.RandomState(7)
    qids, qmat = _normalized_matrix(sf_dir, where_max_id=n_queries)
    planes = rng.standard_normal((qmat.shape[1], LSH_PLANES))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        proj = m @ planes
        bits = (proj > 0).astype(np.int64)
        return (bits * (1 << np.arange(LSH_PLANES, dtype=np.int64))).sum(axis=1)

    # probe set per query: own bucket + hamming-1 flips of lowest-margin planes
    probe_sets = []
    qproj = qmat @ planes
    for qi in range(len(qids)):
        base = int(bucket_of(qmat[qi : qi + 1])[0])
        order = np.argsort(np.abs(qproj[qi]))[: LSH_PROBES - 1]
        probes = {base} | {base ^ (1 << int(p)) for p in order}
        probe_sets.append(probes)
    ref = ray.put((qids, qmat, probe_sets))

    class ProbeTopK:
        def __init__(self, ref, k):
            self.qids, self.qmat, self.probes = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _batch_to_matrix(batch)
            buckets = bucket_of(mat)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(buckets, list(self.probes[qi])) \
                    & (ids != self.qids[qi])
                if not mask.any():
                    continue
                cs = mat[mask] @ self.qmat[qi]
                cids = ids[mask]
                take = min(self.k, len(cids))
                top = np.lexsort((cids, -cs))[:take]  # deterministic ties
                out_q.extend([int(self.qids[qi])] * take)
                out_n.extend(cids[top].tolist())
                out_c.extend(cs[top].tolist())
            return pa.Table.from_arrays(
                [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
                 pa.array(out_c, pa.float64())],
                names=["query_id", "neighbor_id", "cos_raw"],
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(ProbeTopK, fn_constructor_args=(ref, k),
                             batch_format="pyarrow", concurrency=2)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos_raw", "neighbor_id"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame(
            {"query_id": df["query_id"].reset_index(drop=True),
             "rank": np.arange(1, len(df) + 1, dtype=np.int32),
             "neighbor_id": df["neighbor_id"].reset_index(drop=True),
             "cos": [round_half_up(c) for c in df["cos_raw"]]}
        )

    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")


def register(q: dict, o: dict | None = None) -> None:
    q["ann_topk"] = ann_topk
    q["ann_topk_lsh"] = ann_topk_lsh
    q["dedup_embedding"] = embedding_dup_pairs
    if o is not None:
        o["ann_topk"] = ann_topk_sql()
        o["dedup_embedding"] = embedding_dup_sql()
