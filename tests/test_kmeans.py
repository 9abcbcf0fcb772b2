"""kmeans (kgref.ops.kmeans): exact fixed-point Lloyd rounds — kernel
tie-break, chunked/unchunked equality, multi-round parity against a
single-process numpy reference (bit-exact, thanks to int64 fixed
point), and the empty-cluster drop convention."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import duckdb
import pandas as pd

from kgref.ops.kmeans import (_fx_quant, _refresh, assign_chunk,
                              kmeans_train, semantic_dedup,
                              semantic_dedup_sql)


def test_assign_chunk_tie_break_smallest_id():
    cent = np.array([[0, 0], [0, 0], [2, 2]], np.int64)  # 0 and 1 tie
    fx = np.array([[0, 1], [2, 2]], np.int64)
    assert list(assign_chunk(fx, cent)) == [0, 2]


def test_assign_chunk_matches_unchunked():
    rng = np.random.default_rng(7)
    fx = rng.integers(-30000, 30000, (5000, 8), dtype=np.int64)
    cent = rng.integers(-30000, 30000, (6, 8), dtype=np.int64)
    want = np.argmin(((fx[:, None, :] - cent[None, :, :]) ** 2).sum(2), 1)
    got = assign_chunk(fx, cent)  # internal chunk = 2^19 // 48 rows
    assert (got == want).all()


def test_refresh_rounding_and_empty_cluster_drop():
    rows = [  # cluster 0: sums 3/2 -> floor(1.5+0.5)=2; cluster 5 gone
        {"cluster": 0, "dim": 1, "sum_fx": 3, "n": 2},
        {"cluster": 0, "dim": 2, "sum_fx": -3, "n": 2},
        {"cluster": 7, "dim": 1, "sum_fx": 10, "n": 1},
        {"cluster": 7, "dim": 2, "sum_fx": 0, "n": 1},
    ]
    cent, ids = _refresh(rows, d=2)
    assert list(ids) == [0, 7]
    # floor(-1.5 + 0.5) = -1 (the SQL floor convention, not trunc)
    assert cent.tolist() == [[2, -1], [10, 0]]


def _reference_kmeans(M, k, iters):
    """Single-process twin of kmeans_train in plain numpy — exact
    because both sides run identical int64 fixed-point arithmetic."""
    fx = _fx_quant(M.astype(np.float64).reshape(-1)).reshape(M.shape)
    cent, ids = fx[:k].copy(), np.arange(k, dtype=np.int64)
    for it in range(iters):
        a = ids[assign_chunk(fx, cent)]
        surv = np.unique(a)
        new = np.stack([
            np.floor(fx[a == c].sum(0) / (a == c).sum() + 0.5).astype(
                np.int64) for c in surv])
        if it == iters - 1:
            return {(int(c), j + 1):
                    (float(np.floor(fx[a == c].sum(0)[j]
                                    / (a == c).sum() + 0.5) / 10000),
                     int((a == c).sum()))
                    for c in surv for j in range(M.shape[1])}
        cent, ids = new, surv


def test_kmeans_train_matches_numpy_reference(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    # 3 tight blobs of 40 points in 6 dims -> clusters must converge
    M = np.concatenate([rng.normal(c, 0.05, (40, 6))
                        for c in (-2.0, 0.0, 2.0)]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(M)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(M), pa.int32())})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    got = kmeans_train(str(tmp_path), k=4, iters=3).to_pandas()
    want = _reference_kmeans(M, k=4, iters=3)
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        v, n = want[(int(r.cluster), int(r.dim))]
        assert (r.value, r.n) == (v, n)
    # blob structure recovered: every cluster size is a multiple of a
    # blob (40) or the union of blobs seeded twice
    sizes = sorted(got.groupby("cluster")["n"].first())
    assert sum(sizes) == len(M)


def test_semantic_dedup_finds_planted_pair_within_cluster(
        ray_session, tmp_path):
    rng = np.random.default_rng(3)
    # two far blobs; vec 10/11 near-identical (same blob), vec 12 is a
    # near-copy of 10 but displaced into the OTHER blob — the known
    # SemDeDup tradeoff: cross-cluster near-dups are invisible
    M = np.concatenate([rng.normal(-2.0, 0.3, (20, 8)),
                        rng.normal(2.0, 0.3, (20, 8))]).astype(np.float32)
    M[11] = M[10] + 0.001
    M[12] = -M[10]  # lands in the opposite blob
    tbl = pa.table({
        "vec_id": pa.array(range(len(M)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(M), pa.int32())})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    got = (semantic_dedup(str(tmp_path), k=2, thresh=10_000).to_pandas()
           .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = (con.execute(semantic_dedup_sql(k=2, thresh=10_000)).df()
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns], want.astype(got[want.columns].dtypes.to_dict()))
    assert [10, 11] in got[["vec_a", "vec_b"]].values.tolist()
    # exact fixed-point distance: 8 dims x (10 fx units)^2 = 800
    planted = got[(got.vec_a == 10) & (got.vec_b == 11)]
    assert int(planted["dist2_fx"].iloc[0]) == 800
