"""metapath2vec-style bipartite walks (Dong et al. 2017, public
method): conv → class → conv → … alternating hops over the DISTINCT
(conversation, class) annotation pairs — heterogeneous KG-embedding
training data that captures "conversations about the same entities"
rather than class-class co-occurrence.

Unlike ``kg_random_walks`` (whose edge set is class²-bounded), the
bipartite adjacency here is CORPUS-scale — one row per distinct
(conv, class) pair — so the per-step exchange demonstrates the walk
machinery at corpus dimension: two direction-tagged edge Datasets
materialize once, every hop is ONE tagged-union grouped exchange
(reusing ops/walks.step_kernel verbatim: lexsorted neighbor runs,
searchsorted, one splitmix64 batch), and frontiers checkpoint at
walk-count size.  The hop chooser is the same deterministic
splitmix64 stream (own salt), so the twin SQL replays it exactly
through unrolled CTEs alternating the two neighbor tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WALKS_PER_CONV = 2
MP_LEN = 4            # hops; a walk visits MP_LEN + 1 nodes
_SALT = 2_000_003     # distinct stream vs kg_random_walks
_M64 = 1 << 64
_C1 = 0x9E3779B97F4A7C15


def _pairs(sf_dir: str):
    """Distinct (conv, class-id) pairs + the sorted class vocabulary."""
    import ray
    from ray.data.aggregate import Count

    from ..queries import _annotate_ds
    from ..schemas import AnnotateOptions

    tri = _annotate_ds(sf_dir, AnnotateOptions())

    def to_pairs(t: pa.Table) -> pa.Table:
        conv = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(t.column("conv_id"), pa.string()), 5, 2**31 - 1),
            pa.int64())
        keyed = pa.Table.from_arrays([conv, t.column("obj")],
                                     names=["conv", "obj"])
        return pa.TableGroupBy(keyed, ["conv", "obj"]).aggregate([])

    cp = (tri.map_batches(to_pairs, batch_format="pyarrow")
          .groupby(["conv", "obj"]).aggregate(Count(alias_name="_c"))
          .materialize())

    # class vocabulary: distributed per-batch unique + one node-keyed
    # groupby, so the driver only ever holds the class-DIMENSION rows
    # (the _edge_ids convention); sorted for dense-rank parity with
    # the SQL twin's dense_rank ORDER BY obj
    udf = (cp.map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.unique(t.column("obj"))], names=["u"]),
        batch_format="pyarrow")
        .groupby("u").aggregate(Count(alias_name="_n"))
        .to_pandas())  # class-dimension-sized: documented small side
    lut = pa.array(sorted(udf["u"].tolist()), pa.string())
    lut_ref = ray.put(lut)
    return cp, lut_ref, len(lut)


def metapath_walks(sf_dir: str, walks_per_conv: int = WALKS_PER_CONV,
                   walk_len: int = MP_LEN):
    """(walk_id, step, node) — node is 'conv-<n>' on even steps and the
    class URI on odd steps."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max

    from .pairs import n_parts_for_rows
    from .walks import step_kernel

    cp, lut_ref, n_cls = _pairs(sf_dir)
    n_parts = n_parts_for_rows(2 * cp.count(), min_parts=16)

    def tag(direction: str):
        def fn(t: pa.Table) -> pa.Table:
            lut = ray.get(lut_ref)
            conv = t.column("conv").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cid = pc.index_in(t.column("obj").cast(pa.string()),
                              value_set=lut).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            v, nb = (conv, cid) if direction == "cv" else (cid, conv)
            return pa.table({
                "v": pa.array(v), "nb": pa.array(nb),
                "walk_id": pa.array(np.full(len(v), -1, np.int64)),
                "part": pa.array((v % n_parts).astype(np.int32))})
        return fn

    e_cv = cp.map_batches(tag("cv"), batch_format="pyarrow").materialize()
    e_vc = cp.map_batches(tag("vc"), batch_format="pyarrow").materialize()

    def tag_frontier(t: pa.Table) -> pa.Table:
        cur = t.column("cur").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"v": pa.array(cur),
                         "nb": pa.array(np.full(len(cur), -1, np.int64)),
                         "walk_id": t.column("walk_id").cast(pa.int64()),
                         "part": pa.array((cur % n_parts).astype(np.int32))})

    # seeds: walks_per_conv walks per distinct conversation
    convs = cp.groupby("conv").aggregate(Max("_c", alias_name="_m"))

    def seed(t: pa.Table) -> pa.Table:
        conv = t.column("conv").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wid = (np.repeat(conv * walks_per_conv, walks_per_conv)
               + np.tile(np.arange(walks_per_conv, dtype=np.int64),
                         len(conv)))
        return pa.table({"walk_id": pa.array(wid),
                         "cur": pa.array(np.repeat(conv, walks_per_conv))})

    frontier = convs.map_batches(seed, batch_format="pyarrow").materialize()
    steps = [frontier]
    for i in range(1, walk_len + 1):
        edges = e_cv if i % 2 == 1 else e_vc  # conv→class on odd hops
        frontier = (edges
                    .union(frontier.map_batches(tag_frontier,
                                                batch_format="pyarrow"))
                    .groupby("part")
                    .map_groups(lambda df, s=i: step_kernel(
                        df.drop(columns=["part"]), s, _SALT),
                        batch_format="pandas")
                    .materialize())
        steps.append(frontier)

    def back(i: int):
        def fn(t: pa.Table) -> pa.Table:
            cur = t.column("cur").cast(pa.int64())
            if i % 2 == 1:  # class step
                node = ray.get(lut_ref).take(cur)
            else:
                node = pc.binary_join_element_wise(
                    pa.array(["conv-"] * len(t), pa.string()),
                    pc.cast(cur, pa.string()), "")
            return pa.table({
                "walk_id": t.column("walk_id").cast(pa.int64()),
                "step": pa.array(np.full(len(t), i, np.int64)),
                "node": node})
        return fn

    out = steps[0].map_batches(back(0), batch_format="pyarrow")
    for i, s in enumerate(steps[1:], start=1):
        out = out.union(s.map_batches(back(i), batch_format="pyarrow"))
    return out


def _sql_mul64(a: str, b: int) -> str:
    return (f"(( ({a}) % 4294967296 ) * {b} + "
            f"(( ({a}) // 4294967296 ) * {b} % 4294967296) * 4294967296) "
            f"% {_M64}")


def _step_ctes(i: int) -> str:
    from .walks import _C2, _C3  # same splitmix constants

    nbr = "nbr_cv" if i % 2 == 1 else "nbr_vc"
    key = (f"((CAST(walk_id AS HUGEINT) * {_SALT} + {i}) % {_M64} "
           f"+ {_C1}) % {_M64}")
    return f"""
a{i} AS (SELECT walk_id, cur, {key} AS z1 FROM w{i - 1}),
b{i} AS (SELECT walk_id, cur,
         {_sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)} AS z2 FROM a{i}),
c{i} AS (SELECT walk_id, cur,
         {_sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)} AS z3 FROM b{i}),
w{i} AS (SELECT c.walk_id, nb.nb AS cur
         FROM c{i} c JOIN {nbr} nb ON nb.v = c.cur
          AND nb.rk = CAST(xor(c.z3, c.z3 // {1 << 31})
                           % CAST(nb.deg AS HUGEINT) AS BIGINT))"""


def metapath_walks_sql(walks_per_conv: int = WALKS_PER_CONV,
                       walk_len: int = MP_LEN) -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    steps = ",".join(_step_ctes(i) for i in range(1, walk_len + 1))
    outs = "\nUNION ALL ".join(
        f"SELECT w.walk_id, CAST({i} AS BIGINT) AS step, "
        + (f"c.obj AS node FROM w{i} w JOIN cls c ON c.cid = w.cur"
           if i % 2 == 1 else
           f"'conv-' || CAST(w.cur AS VARCHAR) AS node FROM w{i} w")
        for i in range(walk_len + 1))
    return f"""
WITH tri AS ({tri}),
cp AS (SELECT DISTINCT CAST(substr(conv_id, 6) AS BIGINT) AS conv, obj
       FROM tri WHERE pred = 'annotated_with'),
cls AS (SELECT obj, CAST(dense_rank() OVER (ORDER BY obj) - 1 AS BIGINT)
               AS cid
        FROM (SELECT DISTINCT obj FROM cp)),
cpi AS (SELECT cp.conv, cls.cid FROM cp JOIN cls ON cls.obj = cp.obj),
nbr_cv AS (SELECT conv AS v, cid AS nb,
                  row_number() OVER (PARTITION BY conv ORDER BY cid) - 1
                    AS rk,
                  CAST(count(*) OVER (PARTITION BY conv) AS BIGINT) AS deg
           FROM cpi),
nbr_vc AS (SELECT cid AS v, conv AS nb,
                  row_number() OVER (PARTITION BY cid ORDER BY conv) - 1
                    AS rk,
                  CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS deg
           FROM cpi),
w0 AS (SELECT conv * {walks_per_conv} + CAST(j AS BIGINT) AS walk_id,
              conv AS cur
       FROM (SELECT DISTINCT conv FROM cp),
            (SELECT unnest(range({walks_per_conv})) AS j) t),
{steps}
{outs}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["metapath_walks"] = metapath_walks
    if o is not None:
        o["metapath_walks"] = metapath_walks_sql()
