"""Distributed transitive closure of the is-a parent graph (D7 at scale).

The reference computes each ontology's ancestor closure inside its
submission process (ref:lib/ncbo_annotator.rb create_term_cache [M]);
``pipelines.dictionary_build`` reproduces that with a driver-side BFS,
which is the right call while the CLASS DIMENSION fits the driver.  The
object that does NOT stay small is the closure itself: a bushy
10^6-class ontology with average ancestor-set size in the hundreds
yields 10^8–10^9 (class, ancestor, distance) rows — the quadratic-ish
blowup a web-scale KG build must produce and consume WITHOUT landing it
on one machine.

``transitive_closure`` keeps the enumeration driver-side (URI↔int over
the class dimension — the same documented small side as
``ops.kgraph._dense_edges``) and distributes the closure construction:

- seed state = the parent edges at distance 1;
- static side = the same edges keyed by CHILD, coarse-partitioned on
  ``child % n_parts`` and materialized ONCE;
- per round, the (node, anc, d) state co-locates with the edges via one
  grouped exchange on ``anc % n_parts``; ONE vectorized pandas merge
  per coarse partition emits (node, edge.parent, d+1) for every state
  row whose ancestor has a parent, plus the pass-through of known
  rows; a native (node, anc)-keyed ``Min`` groupby combines.
- convergence: a round that adds NO new (node, anc) pair can never
  enable a later one (a pair first reachable at distance k appears in
  round k−1, so growth stops exactly at the graph depth) — the loop
  exits when the materialized row count stops changing, after at most
  ``max_rounds``.

Per round, only the state table moves; the minimum distance per pair is
monotone (extensions of min-distance rows are produced the first round
they become possible, identical to the BFS the driver path runs), so
the result is bit-identical to the driver BFS — asserted by
``tests.test_ops.test_transitive_closure_*`` and by the
``isa_closure_full`` gate query's independent recursive-CTE oracle over
the PARENT EDGES (DuckDB derives the closure itself; nothing is shared
with the Ray side but the edge list).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def transitive_closure(child: np.ndarray, parent: np.ndarray,
                       *, max_rounds: int = 64):
    """(node, anc, d) Dataset: min-distance ancestor closure of the DAG
    given by dense int64 ``child → parent`` edges.  See module doc."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Min

    from .pairs import n_parts_for_rows

    child = np.asarray(child, dtype=np.int64)
    parent = np.asarray(parent, dtype=np.int64)
    if not len(child):
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64())] * 3, names=["node", "anc", "d"]))
    n_parts = n_parts_for_rows(len(child))

    # static edge side: x=child (join key), y=parent, d=-1 marks an edge
    edges_tagged = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(child), pa.array(parent),
         pa.array(np.full(len(child), -1, np.int64)),
         pa.array((child % n_parts).astype(np.int32))],
        names=["x", "y", "d", "part"])).materialize()

    # seed: every edge is a distance-1 closure row
    state = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(child), pa.array(parent),
         pa.array(np.ones(len(child), np.int64))],
        names=["node", "anc", "d"])).materialize()

    def tag_state(t: pa.Table) -> pa.Table:
        anc = t.column("anc").cast(pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [t.column("node").cast(pa.int64()), anc,
             t.column("d").cast(pa.int64()),
             pa.array((anc.to_numpy() % n_parts).astype(np.int32))],
            names=["x", "y", "d", "part"])

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        is_edge = df["d"].to_numpy() < 0
        edg = df.loc[is_edge, ["x", "y"]]
        st = df.loc[~is_edge, ["x", "y", "d"]]
        # state.anc (y) == edge.child (x) → (state.node, edge.parent, d+1)
        m = st.merge(edg, left_on="y", right_on="x",
                     suffixes=("", "_e"), how="inner")
        return pd.DataFrame({
            "node": np.concatenate([st["x"].to_numpy(np.int64),
                                    m["x"].to_numpy(np.int64)]),
            "anc": np.concatenate([st["y"].to_numpy(np.int64),
                                   m["y_e"].to_numpy(np.int64)]),
            "d": np.concatenate([st["d"].to_numpy(np.int64),
                                 m["d"].to_numpy(np.int64) + 1])})

    prev = state.count()
    for _ in range(max_rounds):
        state = (edges_tagged
                 .union(state.map_batches(tag_state, batch_format="pyarrow"))
                 .groupby("part").map_groups(relax, batch_format="pandas")
                 .groupby(["node", "anc"]).aggregate(Min("d", alias_name="d"))
                 .materialize())
        cur = state.count()
        if cur == prev:  # no new pair ⇒ no later round can add one
            break
        prev = cur
    return state


def isa_closure_full(sf_dir: str):
    """(class_uri, ancestor_uri, distance) — the full is-a ancestor
    closure of the shared docdict ontology, built by the DISTRIBUTED
    relaxation above (the annotate family consumes the same closure as
    a broadcast; this query gates the construction path itself).
    sf-independent by design — the dictionary, like the reference's
    ontology submissions, is not scaled with the corpus.  The oracle
    hands DuckDB only the PARENT EDGES and lets a recursive CTE derive
    the closure independently — nothing shared with the Ray side but
    the edge list."""
    import ray.data as rd

    from ..docdict import CLASS_DEFS, _uri

    edges = [(_uri(n), _uri(p))
             for n, _o, _p, _s, _st, parents, _c in CLASS_DEFS
             for p in parents]
    if not edges:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.int64())],
            names=["class_uri", "ancestor_uri", "distance"]))
    uris = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(uris)}
    child = np.array([idx[c] for c, _ in edges], np.int64)
    parent = np.array([idx[p] for _, p in edges], np.int64)
    lut = pa.array(uris)

    def back(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [lut.take(t.column("node").cast(pa.int32())),
             lut.take(t.column("anc").cast(pa.int32())),
             t.column("d").cast(pa.int64())],
            names=["class_uri", "ancestor_uri", "distance"])

    return (transitive_closure(child, parent)
            .map_batches(back, batch_format="pyarrow"))


def isa_closure_full_sql() -> str:
    from ..docdict import CLASS_DEFS, _q, _uri

    rows = [f"({_q(_uri(n))}, {_q(_uri(p))})"
            for n, _o, _p, _s, _st, parents, _c in CLASS_DEFS
            for p in parents]
    return f"""
WITH RECURSIVE par(c, p) AS (VALUES {', '.join(rows)}),
reach(c, a, d) AS (
    SELECT c, p, 1 FROM par
    UNION
    SELECT r.c, p.p, r.d + 1 FROM reach r JOIN par p ON p.c = r.a
    WHERE r.d < 64
)
SELECT c AS class_uri, a AS ancestor_uri,
       CAST(min(d) AS BIGINT) AS distance
FROM reach GROUP BY c, a
"""


def class_depth(sf_dir: str):
    """(class_uri, depth) — every dictionary class's minimum distance
    to a ROOT of the is-a DAG (a class with no parents): the ontology
    depth statistic BioPortal-style semantic-similarity measures
    normalize by.  Roots have depth 0; every non-root's maximal chain
    ends at a root, so depth = min closure distance over root
    ancestors.  Consumes the DISTRIBUTED closure Dataset; the root set
    is class-dimension-sized and broadcast (the same budget as the
    annotate stage's closure)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..docdict import CLASS_DEFS, _uri

    all_uris = sorted(_uri(n) for n, *_rest in CLASS_DEFS)
    roots = sorted(_uri(n) for n, _o, _p, _s, _st, parents, _c
                   in CLASS_DEFS if not parents)
    root_rows = pa.Table.from_arrays(
        [pa.array(roots, pa.string()),
         pa.array([0] * len(roots), pa.int64())],
        names=["class_uri", "depth"])
    roots_ref = ray.put(pa.array(roots, pa.string()))

    def to_root(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rs = ray.get(roots_ref)
        m = pc.is_in(t.column("ancestor_uri"), value_set=rs)
        kept = t.filter(m)
        return pa.Table.from_arrays(
            [kept.column("class_uri"),
             kept.column("distance").cast(pa.int64())],
            names=["class_uri", "depth"])

    non_root = (isa_closure_full(sf_dir)
                .map_batches(to_root, batch_format="pyarrow")
                .groupby("class_uri")
                .aggregate(Min("depth", alias_name="depth")))
    # assert-by-construction: len(all_uris) == len(roots) + non-root
    # rows (every non-root reaches a root) — pinned in tests
    del all_uris
    return non_root.union(rd.from_arrow(root_rows))


def class_depth_sql() -> str:
    from ..docdict import CLASS_DEFS, _q, _uri

    base = isa_closure_full_sql()
    roots = sorted(_uri(n) for n, _o, _p, _s, _st, parents, _c
                   in CLASS_DEFS if not parents)
    root_rows = ", ".join(f"({_q(r)})" for r in roots)
    return f"""
WITH clo AS ({base}),
roots(u) AS (VALUES {root_rows}),
nr AS (SELECT class_uri, CAST(min(distance) AS BIGINT) AS depth
       FROM clo JOIN roots ON clo.ancestor_uri = roots.u
       GROUP BY class_uri)
SELECT class_uri, depth FROM nr
UNION ALL
SELECT u AS class_uri, CAST(0 AS BIGINT) AS depth FROM roots
"""


def register(q: dict, o: dict | None = None) -> None:
    q["isa_closure_full"] = isa_closure_full
    q["class_depth"] = class_depth
    if o is not None:
        o["isa_closure_full"] = isa_closure_full_sql()
        o["class_depth"] = class_depth_sql()
