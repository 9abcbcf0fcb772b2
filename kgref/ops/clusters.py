"""Near-duplicate CLUSTER resolution — connected components over the
dup-pair graph via distributed min-label propagation (hash-min).

Dedup pair ops (exact / n-gram Jaccard / MinHash-LSH) emit PAIRS; a
training-data pipeline needs per-doc CLUSTER ids to keep one canonical
doc per component (A~B and B~C must collapse even when A!~C).  This is
the classic iterative-algorithm case the Dataset API "can't express" in
one pass — expressed here as a bounded driver loop of groupby stages,
NOT raw actors:

  labels(x) <- min over {labels(x)} ∪ {labels(n) : n adjacent to x}

Per iteration: one cogroup (labels ∪ edge endpoints, grouped on node —
the join of labels onto edges, expressed as groupby.map_groups) + one
Min aggregate.  Converges in ≤ diameter(G) iterations; convergence is
detected with a scalar monotone invariant (sum of labels strictly
decreases until fixpoint) — no change-join, one cheap aggregate per
iteration.

Scale shape: the working set is the DUP-PAIR GRAPH (nodes that appear
in ≥1 pair), typically orders of magnitude smaller than the corpus; it
is materialized between iterations (iterating over lazy lineage would
re-execute the whole upstream chain each round).  All exchanges are
8-byte int keys.  Near-dup components in web corpora are shallow
(template families), so the loop usually terminates in ≤5 rounds; the
64-round cap is a runaway guard, not a tuning knob.

Oracle: DuckDB recursive CTE computing min-reachable-node over the same
edge set (the n-gram Jaccard pair SQL nested as a CTE).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import JACCARD_TAU, ngram_jaccard_pairs, ngram_jaccard_sql

MAX_ROUNDS = 64


def _undirect(batch: pa.Table) -> pa.Table:
    a = batch.column("doc_a").combine_chunks()
    b = batch.column("doc_b").combine_chunks()
    return pa.Table.from_arrays(
        [pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
         pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])],
        names=["node", "nbr"])


def label_propagation(edges, max_rounds: int = MAX_ROUNDS):
    """(node, nbr) undirected edge Dataset → (doc_id, cluster_id) with
    cluster_id = min node id in the connected component."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = edges.materialize()
    if edges.count() == 0:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_id", "cluster_id"]))

    # labels(x) = x, folded with one propagation step for free:
    # min(x, min nbr)
    labels = (edges.groupby("node").aggregate(Min("nbr", alias_name="m"))
              .map_batches(lambda b: pa.Table.from_arrays(
                  [b.column("node"),
                   pc.min_element_wise(b.column("node"), b.column("m"))],
                  names=["node", "label"]), batch_format="pyarrow")
              .materialize())
    prev_sum = labels.sum("label")

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        # rows of one node: exactly one label row (nbr == -1) + its edges
        lbl = int(df.loc[df["nbr"] < 0, "label"].iloc[0])
        out_nodes = df.loc[df["nbr"] >= 0, "nbr"].tolist()
        out_nodes.append(int(df["node"].iloc[0]))
        return pd.DataFrame({"n": out_nodes, "label": lbl})

    for _ in range(max_rounds):
        tagged_labels = labels.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("node"),
                 pa.array([-1] * len(b), pa.int64()),
                 b.column("label")],
                names=["node", "nbr", "label"]), batch_format="pyarrow")
        tagged_edges = edges.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("node"), b.column("nbr"),
                 pa.array([-1] * len(b), pa.int64())],
                names=["node", "nbr", "label"]), batch_format="pyarrow")
        from ray.data.aggregate import Min as _Min

        labels = (tagged_labels.union(tagged_edges)
                  .groupby("node").map_groups(propagate,
                                              batch_format="pandas")
                  .groupby("n").aggregate(_Min("label", alias_name="label"))
                  .map_batches(lambda b: b.rename_columns(["node", "label"]),
                               batch_format="pyarrow")
                  .materialize())
        s = labels.sum("label")
        if s == prev_sum:  # labels only decrease; equal sum = fixpoint
            break
        prev_sum = s

    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow")


def dup_clusters(sf_dir: str, tau: float = JACCARD_TAU):
    """Gate query: connected components over the n-gram Jaccard dup
    pairs — (doc_id, cluster_id) for every doc in at least one pair."""
    pairs = ngram_jaccard_pairs(sf_dir, tau)
    return label_propagation(
        pairs.map_batches(_undirect, batch_format="pyarrow"))


def dup_clusters_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH RECURSIVE
pair AS ({ngram_jaccard_sql(tau)}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pair
          UNION SELECT doc_b, doc_a FROM pair),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT r0.node, e.b FROM reach r0 JOIN edges e ON e.a = r0.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""


def register(q: dict, o: dict | None = None) -> None:
    q["dedup_clusters"] = dup_clusters
    if o is not None:
        o["dedup_clusters"] = dup_clusters_sql()
