"""DeepWalk/node2vec-style random-walk corpus over the class
co-occurrence graph — the KG-embedding training-data generator
(Perozzi et al. 2014; public algorithm): W walks of L steps from every
node, next hop = deterministic splitmix64 choice among the current
node's neighbors.

Determinism makes this HASH-GATEABLE despite being "random": the hop
chooser is ``splitmix64(walk_id · SALT + step) mod degree`` (the
sampling ops' stream convention), neighbors rank by dense id, and the
SQL twin replays the identical uint64 arithmetic (HUGEINT mod-2^64)
through unrolled per-step CTEs.

Scale shape: the edge set stays a Dataset end to end (the r5
distributed prologue, kgref/ops/kgraph._edge_ids); each step is ONE
tagged-union grouped exchange of (static edges ∪ walk frontier) on a
coarse node-hash partition — the PageRank/label-propagation shape this
repo already runs — with a vectorized per-group kernel (lexsorted
neighbor runs + searchsorted + one splitmix64 batch).  Frontiers
materialize per step (walk-count-sized, NOT edge-sized) so step i+1
never replays step i's exchange.  Output is (walk_id, step, class_uri)
— written as a streaming union of the per-step frontiers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WALKS_PER_NODE = 2
WALK_LEN = 4          # hops; a walk visits WALK_LEN + 1 nodes
_SALT = 1_000_003     # walk_id stream offset; steps < SALT stay unique
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
_M64 = 1 << 64


def step_kernel(df: pd.DataFrame, step: int, salt: int) -> pd.DataFrame:
    """One coarse partition of (edges ∪ frontier): advance every walk
    one hop.  Edge rows have walk_id = -1; frontier rows have nb = -1.
    All edges of a node share its partition, so neighbor runs and
    degrees are globally exact."""
    from .sampling import splitmix64

    is_edge = df["walk_id"].to_numpy() < 0
    e, f = df[is_edge], df[~is_edge]
    if not len(f):
        return pd.DataFrame({"walk_id": np.empty(0, np.int64),
                             "cur": np.empty(0, np.int64)})
    ev = e["v"].to_numpy(np.int64)
    enb = e["nb"].to_numpy(np.int64)
    order = np.lexsort((enb, ev))
    ev, enb = ev[order], enb[order]
    uniq, starts, counts = np.unique(ev, return_index=True,
                                     return_counts=True)
    fv = f["v"].to_numpy(np.int64)
    wid = f["walk_id"].to_numpy(np.int64)
    pos = np.searchsorted(uniq, fv)
    h = splitmix64(wid.astype(np.uint64) * np.uint64(salt)
                   + np.uint64(step))
    idx = (h % counts[pos].astype(np.uint64)).astype(np.int64)
    return pd.DataFrame({"walk_id": wid, "cur": enb[starts[pos] + idx]})


def kg_random_walks(sf_dir: str, walks_per_node: int = WALKS_PER_NODE,
                    walk_len: int = WALK_LEN):
    """(walk_id, step, class_uri) — W·|V| deterministic random walks of
    ``walk_len`` hops over the symmetric co-occurrence graph."""
    import ray
    import ray.data as rd

    from .kgraph import _edge_ids
    from .pairs import n_parts_for_rows

    uri_ref, n, eds = _edge_ids(sf_dir)
    n_parts = n_parts_for_rows(2 * eds.count(), min_parts=16)

    def tag_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.r_[a, b]
        nb = np.r_[b, a]
        return pa.table({"v": pa.array(v), "nb": pa.array(nb),
                         "walk_id": pa.array(np.full(len(v), -1, np.int64)),
                         "part": pa.array((v % n_parts).astype(np.int32))})

    edges_tagged = eds.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    def tag_frontier(t: pa.Table) -> pa.Table:
        cur = t.column("cur").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"v": pa.array(cur),
                         "nb": pa.array(np.full(len(cur), -1, np.int64)),
                         "walk_id": t.column("walk_id").cast(pa.int64()),
                         "part": pa.array((cur % n_parts).astype(np.int32))})

    def seed(t: pa.Table) -> pa.Table:
        wid = t.column("id").cast(pa.int64())
        return pa.table({"walk_id": wid,
                         "cur": pc.divide(wid, pa.scalar(
                             walks_per_node, pa.int64()))})

    frontier = (rd.range(n * walks_per_node)
                .map_batches(seed, batch_format="pyarrow").materialize())
    steps = [frontier]
    for i in range(1, walk_len + 1):
        frontier = (edges_tagged
                    .union(frontier.map_batches(tag_frontier,
                                                batch_format="pyarrow"))
                    .groupby("part")
                    .map_groups(lambda df, s=i: step_kernel(
                        df.drop(columns=["part"]), s, _SALT),
                        batch_format="pandas")
                    .materialize())  # walk-count-sized checkpoint
        steps.append(frontier)

    def back(i: int):
        def fn(t: pa.Table) -> pa.Table:
            lut = ray.get(uri_ref)
            cur = t.column("cur").cast(pa.int64())
            return pa.table({
                "walk_id": t.column("walk_id").cast(pa.int64()),
                "step": pa.array(np.full(len(t), i, np.int64)),
                "class_uri": lut.take(cur)})
        return fn

    out = steps[0].map_batches(back(0), batch_format="pyarrow")
    for i, s in enumerate(steps[1:], start=1):
        out = out.union(s.map_batches(back(i), batch_format="pyarrow"))
    return out


def _sql_mul64(a: str, b: int) -> str:
    return (f"(( ({a}) % 4294967296 ) * {b} + "
            f"(( ({a}) // 4294967296 ) * {b} % 4294967296) * 4294967296) "
            f"% {_M64}")


def _step_ctes(i: int, salt: int) -> str:
    key = (f"((CAST(walk_id AS HUGEINT) * {salt} + {i}) % {_M64} "
           f"+ {_C1}) % {_M64}")
    return f"""
a{i} AS (SELECT walk_id, cur, {key} AS z1 FROM w{i - 1}),
b{i} AS (SELECT walk_id, cur,
         {_sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)} AS z2 FROM a{i}),
c{i} AS (SELECT walk_id, cur,
         {_sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)} AS z3 FROM b{i}),
w{i} AS (SELECT c.walk_id, nb.nb AS cur
         FROM c{i} c JOIN nbr nb ON nb.v = c.cur
          AND nb.rk = CAST(xor(c.z3, c.z3 // {1 << 31})
                           % CAST(nb.deg AS HUGEINT) AS BIGINT))"""


def kg_random_walks_sql(walks_per_node: int = WALKS_PER_NODE,
                        walk_len: int = WALK_LEN) -> str:
    from .kgraph import _cooc_cte

    steps = ",".join(_step_ctes(i, _SALT) for i in range(1, walk_len + 1))
    outs = "\nUNION ALL ".join(
        f"SELECT w.walk_id, CAST({i} AS BIGINT) AS step, u.uri AS class_uri "
        f"FROM w{i} w JOIN ids u ON u.id = w.cur"
        for i in range(walk_len + 1))
    return f"""
WITH {_cooc_cte()},
uv AS (SELECT class_a AS uri FROM cooc
       UNION SELECT class_b FROM cooc),
ids AS (SELECT uri, CAST(dense_rank() OVER (ORDER BY uri) - 1 AS BIGINT)
               AS id FROM uv),
sym AS (SELECT ia.id AS v, ib.id AS nb
        FROM cooc e JOIN ids ia ON ia.uri = e.class_a
                    JOIN ids ib ON ib.uri = e.class_b
        UNION ALL
        SELECT ib.id, ia.id
        FROM cooc e JOIN ids ia ON ia.uri = e.class_a
                    JOIN ids ib ON ib.uri = e.class_b),
nbr AS (SELECT v, nb,
               row_number() OVER (PARTITION BY v ORDER BY nb) - 1 AS rk,
               CAST(count(*) OVER (PARTITION BY v) AS BIGINT) AS deg
        FROM sym),
w0 AS (SELECT id * {walks_per_node} + CAST(j AS BIGINT) AS walk_id,
              id AS cur
       FROM ids, (SELECT unnest(range({walks_per_node})) AS j) t),
{steps}
{outs}
"""


SKIP_WINDOW = 2


def walk_skipgrams(sf_dir: str, window: int = SKIP_WINDOW):
    """(center_uri, context_uri, n) — skip-gram training pairs from the
    walk corpus (the word2vec step of DeepWalk): for every walk, each
    (center, context) pair within ``window`` hops, both directions,
    counted over all walks.

    Scale shape: walks arrive already keyed by walk_id; ONE coarse
    walk-bucket exchange co-locates each walk, the per-group kernel is
    a sort + ``window`` shifted-array comparisons (no per-walk Python),
    and per-group partial counts shrink the final pair groupby to
    distinct pairs per bucket."""
    from ray.data.aggregate import Sum

    walks = kg_random_walks(sf_dir)
    n_parts = 16

    def add_part(t: pa.Table) -> pa.Table:
        wid = t.column("walk_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return t.append_column(
            "part", pa.array((wid % n_parts).astype(np.int32)))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["walk_id", "step"], kind="stable")
        wid = df["walk_id"].to_numpy(np.int64)
        uri = df["class_uri"].to_numpy()
        cs, xs = [], []
        for d in range(1, window + 1):
            same = wid[d:] == wid[:-d] if len(wid) > d else np.empty(
                0, bool)
            a, b = uri[:-d][same], uri[d:][same]
            cs.extend((a, b))
            xs.extend((b, a))
        if not cs:
            return pd.DataFrame({"center_uri": [], "context_uri": [],
                                 "n": np.empty(0, np.int64)})
        out = (pd.DataFrame({"center_uri": np.concatenate(cs),
                             "context_uri": np.concatenate(xs)})
               .groupby(["center_uri", "context_uri"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    return (walks.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda df: kernel(df.drop(columns=["part"])),
                        batch_format="pandas")
            .groupby(["center_uri", "context_uri"])
            .aggregate(Sum("n", alias_name="n")))


def walk_skipgrams_sql(window: int = SKIP_WINDOW) -> str:
    return f"""
WITH walks AS ({kg_random_walks_sql()})
SELECT a.class_uri AS center_uri, b.class_uri AS context_uri,
       CAST(count(*) AS BIGINT) AS n
FROM walks a JOIN walks b
  ON b.walk_id = a.walk_id AND b.step != a.step
 AND abs(b.step - a.step) <= {window}
GROUP BY center_uri, context_uri
"""


def register(q: dict, o: dict | None = None) -> None:
    q["kg_random_walks"] = kg_random_walks
    q["walk_skipgrams"] = walk_skipgrams
    if o is not None:
        o["kg_random_walks"] = kg_random_walks_sql()
        o["walk_skipgrams"] = walk_skipgrams_sql()
