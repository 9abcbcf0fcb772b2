"""Knowledge-graph construction over the annotator's triple output.

The flagship pipeline turns transcripts into (turn × class) annotation
triples; these operators build the GRAPH a KG-construction run derives
from them — the step after annotation in the north-star pipeline:

- ``class_cooccurrence``: weighted co-occurrence edges — classes
  directly annotated in the same turn, weight = number of turns.
- ``class_degree``: per-class (degree, weighted degree) over that edge
  list.
- ``cooccur_components``: connected components of the co-occurrence
  graph, labelled by each component's lexicographically smallest class
  URI (reuses the distributed min-label propagation from ops/clusters —
  the same machinery that resolves dup clusters).

Scale shape: a turn's triples can straddle batch boundaries, so pair
induction needs turns co-located — ONE coarse exchange on the conv
bucket (the flagship's own partitioning key, reused as SURVEY §1.1
prescribes), then per-bucket pair generation is a lexsort +
``pairs_in_runs`` (pure numpy, exact — no per-turn Python).  Edge
weights use the combiner pattern (per-bucket partial counts, then an
edges-sized groupby).  The class-URI ↔ dense-int mapping for the
component solver is built from the EDGE set (class-dimension-sized,
the justified driver-side small side) with sorted enumeration, so
min-int labels round-trip to lexicographic-min URIs exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_COOC_BUCKETS = 32


def _direct_triples(sf_dir: str):
    from ..queries import _annotate_ds
    from ..schemas import AnnotateOptions

    return _annotate_ds(sf_dir, AnnotateOptions())


def class_cooccurrence(sf_dir: str):
    """(class_a, class_b, n_turns) with class_a < class_b: distinct
    direct-annotation class pairs per turn, counted over turns."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.materialize import add_bucket_column
    from .pairs import pairs_in_runs

    tri = _direct_triples(sf_dir).map_batches(
        lambda b: add_bucket_column(
            b.select(["conv_id", "turn_idx", "obj"]), _COOC_BUCKETS),
        batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (turn, class) then exact pairs within each turn run
        sub = df.drop_duplicates(["conv_id", "turn_idx", "obj"])
        enc_t = pd.factorize(
            sub["conv_id"].astype(str) + "\x1f"
            + sub["turn_idx"].astype(str), sort=True)[0]
        order = np.lexsort((sub["obj"].to_numpy(), enc_t))
        keys = enc_t[order].astype(np.int64)
        objs = sub["obj"].to_numpy()[order]
        ia, ib = pairs_in_runs(keys, None)  # exact: oracle-gated
        # pairs_in_runs pairs each element with its run predecessors in
        # sort order, so objs[ia] < objs[ib] within a turn already
        pairs = pd.DataFrame({"class_a": objs[ia], "class_b": objs[ib]})
        out = (pairs.groupby(["class_a", "class_b"], sort=False)
               .size().reset_index(name="n"))
        return out

    return (tri.groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["class_a", "class_b"])
            .aggregate(Sum("n", alias_name="n_turns")))


def _cooc_cte() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
tri AS ({tri}),
cls AS (SELECT DISTINCT conv_id, turn_idx, obj FROM tri
        WHERE pred = 'annotated_with'),
cooc AS (
  SELECT a.obj AS class_a, b.obj AS class_b,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM cls a JOIN cls b USING (conv_id, turn_idx)
  WHERE a.obj < b.obj
  GROUP BY a.obj, b.obj)
"""


def class_cooccurrence_sql() -> str:
    return f"WITH {_cooc_cte()} SELECT * FROM cooc"


def class_degree(sf_dir: str):
    """(class_uri, degree, wdegree) from the co-occurrence edges: how
    connected each class is in the induced graph.  Edge list is
    class-dimension-sized, so one symmetric expansion + groupby."""
    from ray.data.aggregate import Count, Sum

    edges = class_cooccurrence(sf_dir)

    def both_ways(batch: pa.Table) -> pa.Table:
        a = batch.column("class_a").combine_chunks()
        b = batch.column("class_b").combine_chunks()
        w = batch.column("n_turns").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.cast(pa.string()), b.cast(pa.string())]),
             pa.concat_arrays([w.cast(pa.int64()), w.cast(pa.int64())])],
            names=["class_uri", "w"])

    return (edges.map_batches(both_ways, batch_format="pyarrow")
            .groupby("class_uri")
            .aggregate(Count(alias_name="degree"),
                       Sum("w", alias_name="wdegree")))


def class_degree_sql() -> str:
    return f"""
WITH {_cooc_cte()},
sym AS (SELECT class_a AS class_uri, n_turns FROM cooc
        UNION ALL SELECT class_b, n_turns FROM cooc)
SELECT class_uri, CAST(count(*) AS BIGINT) AS degree,
       CAST(sum(n_turns) AS BIGINT) AS wdegree
FROM sym GROUP BY class_uri
"""


def cooccur_components(sf_dir: str):
    """(class_uri, component) — connected components of the
    co-occurrence graph, component = lexicographically smallest class
    URI reachable.  URIs map to dense ints by sorted enumeration (edge
    set is class-dimension-sized — the documented driver-side small
    side), min-label propagation runs on ints (ops/clusters), and the
    sorted mapping makes min-int == min-URI exact."""
    import ray.data as rd

    from .clusters import label_propagation

    edges = class_cooccurrence(sf_dir).take_all()
    uris = sorted({r["class_a"] for r in edges}
                  | {r["class_b"] for r in edges})
    idx = {u: i for i, u in enumerate(uris)}
    a = np.array([idx[r["class_a"]] for r in edges], np.int64)
    b = np.array([idx[r["class_b"]] for r in edges], np.int64)
    eds = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(np.r_[a, b]), pa.array(np.r_[b, a])],
        names=["node", "nbr"]))
    comp = label_propagation(eds)
    lut = pa.array(uris)

    def back(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [lut.take(batch.column("doc_id").cast(pa.int32())),
             lut.take(batch.column("cluster_id").cast(pa.int32()))],
            names=["class_uri", "component"])

    return comp.map_batches(back, batch_format="pyarrow")


def cooccur_components_sql() -> str:
    return f"""
WITH RECURSIVE {_cooc_cte()},
edges AS (SELECT class_a AS a, class_b AS b FROM cooc
          UNION SELECT class_b, class_a FROM cooc),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT r0.node, e.b FROM reach r0 JOIN edges e ON e.a = r0.r
)
SELECT node AS class_uri, min(r) AS component FROM reach GROUP BY node
"""


def register(q: dict, o: dict | None = None) -> None:
    q["class_cooccurrence"] = class_cooccurrence
    q["class_degree"] = class_degree
    q["cooccur_components"] = cooccur_components
    if o is not None:
        o["class_cooccurrence"] = class_cooccurrence_sql()
        o["class_degree"] = class_degree_sql()
        o["cooccur_components"] = cooccur_components_sql()
