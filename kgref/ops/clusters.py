"""Near-duplicate CLUSTER resolution — connected components over the
dup-pair graph via distributed min-label propagation (hash-min).

Dedup pair ops (exact / n-gram Jaccard / MinHash-LSH) emit PAIRS; a
training-data pipeline needs per-doc CLUSTER ids to keep one canonical
doc per component (A~B and B~C must collapse even when A!~C).  This is
the classic iterative-algorithm case the Dataset API "can't express" in
one pass — expressed here as a bounded driver loop of groupby stages,
NOT raw actors:

  labels(x) <- min over {labels(x)} ∪ {labels(n) : n adjacent to x}

Per iteration: TWO coarse int-key exchanges, each with ~n_parts big
groups and ONE vectorized pandas pass per group (the agg_pairs_by_part
shape) — never a group per graph node:

  1. co-locate labels with the static edge partitions on
     ``node % n_parts`` and attach each node's label to its out-edges
     with one pandas merge (emitting (nbr, label) + the self row);
  2. co-locate the emitted rows on ``target % n_parts`` and take the
     per-node min with one pandas groupby.

The edge side of exchange 1 is partitioned and materialized ONCE
before the loop (the graph is static); only the label table — one row
per node — moves per round.  Converges in ≤ diameter(G) iterations;
convergence is detected with a scalar monotone invariant (sum of
labels strictly decreases until fixpoint) — no change-join, one cheap
aggregate per iteration.

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
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Min

    from .pairs import n_parts_for_rows

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_id", "cluster_id"]))

    n_parts = n_parts_for_rows(n_edges)

    # Static edge side of the per-round exchange, partitioned by source
    # node and materialized ONCE (label rows are tagged nbr = -1 so one
    # grouped exchange carries both sides).
    def tag_edges(b: pa.Table) -> pa.Table:
        node = b.column("node").cast(pa.int64()).combine_chunks()
        part = pa.array((node.to_numpy() % n_parts).astype(np.int32))
        return pa.Table.from_arrays(
            [node, b.column("nbr").cast(pa.int64()),
             pa.array(np.full(len(b), -1, np.int64)), part],
            names=["node", "nbr", "label", "part"])

    edges_tagged = edges.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    # labels(x) = x, folded with one propagation step for free:
    # min(x, min nbr)
    labels = (edges.groupby("node").aggregate(Min("nbr", alias_name="m"))
              .map_batches(lambda b: pa.Table.from_arrays(
                  [b.column("node"),
                   pc.min_element_wise(b.column("node"), b.column("m"))],
                  names=["node", "label"]), batch_format="pyarrow")
              .materialize())
    prev_sum = labels.sum("label")

    def tag_labels(b: pa.Table) -> pa.Table:
        node = b.column("node").cast(pa.int64()).combine_chunks()
        part = pa.array((node.to_numpy() % n_parts).astype(np.int32))
        return pa.Table.from_arrays(
            [node, pa.array(np.full(len(b), -1, np.int64)),
             b.column("label").cast(pa.int64()), part],
            names=["node", "nbr", "label", "part"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        # One coarse partition (all rows with node % n_parts == p): one
        # merge attaches each node's label to its out-edges; every edge
        # endpoint has a label row by construction, so inner == left.
        lbl_mask = df["nbr"].to_numpy() < 0
        lbl = df.loc[lbl_mask, ["node", "label"]]
        edg = df.loc[~lbl_mask, ["node", "nbr"]]
        m = edg.merge(lbl, on="node", how="inner")
        n_out = np.concatenate([m["nbr"].to_numpy(np.int64),
                                lbl["node"].to_numpy(np.int64)])
        l_out = np.concatenate([m["label"].to_numpy(np.int64),
                                lbl["label"].to_numpy(np.int64)])
        return pd.DataFrame({"n": n_out, "label": l_out,
                             "part2": (n_out % n_parts).astype(np.int32)})

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", as_index=False)["label"].min()
        return pd.DataFrame({"node": g["n"].to_numpy(np.int64),
                             "label": g["label"].to_numpy(np.int64)})

    for _ in range(max_rounds):
        labels = (labels.map_batches(tag_labels, batch_format="pyarrow")
                  .union(edges_tagged)
                  .groupby("part").map_groups(attach, batch_format="pandas")
                  .groupby("part2").map_groups(take_min,
                                               batch_format="pandas")
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


def dedup_apply(sf_dir: str, tau: float = JACCARD_TAU):
    """The end of the dedup story: the corpus AFTER near-dup removal.
    Keeper per cluster = the min doc_id (== cluster_id); every other
    clustered doc is a loser; unclustered docs pass through.

    Shape: a SHUFFLE anti-join (documents ∖ losers co-located by
    doc_id hash) — the scale-correct form: the loser side is
    dup-graph-sized but NOT guaranteed driver-small (a 30%-duplicate
    web crawl makes it corpus-scale), so no broadcast set and no
    driver materialization anywhere on this path.  It is built as a
    tagged union + coarse-partition groupby with ONE vectorized isin
    pass per partition rather than ``Dataset.join(left_anti)``
    because the iterative label-propagation output carries empty
    schema-less pandas blocks that Ray 2.49's Acero-backed join
    rejects ("No match for FieldRef" on the empty block) — the
    groupby/sort exchange handles them fine.  Native left_anti on
    clean inputs is exercised by relational.customers_anti_native."""
    import functools

    import pandas as pd
    import ray.data as rd

    from .pairs import n_parts_for

    losers = dup_clusters(sf_dir, tau).map_batches(
        lambda b: b.filter(pc.not_equal(b.column("doc_id"),
                                        b.column("cluster_id")))
        .select(["doc_id"]),
        batch_format="pyarrow")

    def tag(flag: int, batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = pa.Table.from_arrays(
            [batch.column("doc_id"),
             batch.column("lang") if "lang" in batch.column_names
             else pa.array([""] * n, pa.string()),
             batch.column("n_chars") if "n_chars" in batch.column_names
             else pa.array([0] * n, pa.int64()),
             pa.array([flag] * n, pa.int8())],
            names=["doc_id", "lang", "n_chars", "is_loser"])
        return t

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    n_parts = n_parts_for(f"{sf_dir}/documents.parquet")
    both = (docs.map_batches(functools.partial(tag, 0),
                             batch_format="pyarrow")
            .union(losers.map_batches(functools.partial(tag, 1),
                                      batch_format="pyarrow")))

    def part(batch: pa.Table) -> pa.Table:
        import numpy as np

        p = pa.array((batch.column("doc_id").to_numpy()
                      % n_parts).astype("int32"))
        return batch.append_column("part", p)

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["is_loser"] == 0]
        drop = df.loc[df["is_loser"] == 1, "doc_id"]
        out = keep[~keep["doc_id"].isin(drop)]
        return out[["doc_id", "lang", "n_chars"]]

    return (both.map_batches(part, batch_format="pyarrow")
            .groupby("part").map_groups(anti, batch_format="pandas"))


def dedup_apply_sql(tau: float = JACCARD_TAU) -> str:
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
),
losers AS (SELECT node AS doc_id FROM reach GROUP BY node
           HAVING node != min(r))
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
"""


def register(q: dict, o: dict | None = None) -> None:
    q["dedup_clusters"] = dup_clusters
    q["dedup_apply"] = dedup_apply
    if o is not None:
        o["dedup_clusters"] = dup_clusters_sql()
        o["dedup_apply"] = dedup_apply_sql()
