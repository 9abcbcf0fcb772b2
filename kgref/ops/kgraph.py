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
- ``class_pagerank``: weighted PageRank over the co-occurrence graph,
  K=3 fixed iterations in exact int64 fixed-point arithmetic so the
  DuckDB twin (unrolled CTEs, HUGEINT intermediates) matches
  bit-for-bit — no float accumulation-order tolerance gymnastics.
- ``class_triangles``: per-class exact triangle counts via the forward
  wedge algorithm (center < both neighbors, so each triangle is
  generated once), wedge generation with ``pairs_in_runs`` per coarse
  partition and a broadcast packed-edge-key membership check.

Scale shape: a turn's triples can straddle batch boundaries, so pair
induction needs turns co-located — ONE coarse exchange on the conv
bucket (the flagship's own partitioning key, reused as SURVEY §1.1
prescribes), then per-bucket pair generation is a lexsort +
``pairs_in_runs`` (pure numpy, exact — no per-turn Python).  Edge
weights use the combiner pattern (per-bucket partial counts, then an
edges-sized groupby).

The EDGE set is O(co-occurring class pairs) — bounded by C², not C: a
UMLS-scale ontology (~4e6 classes) over a dense corpus plausibly
yields 1e8–1e9 edges, so the edge list NEVER lands on the driver
(VERDICT r4 What's-wrong #1).  ``_edge_ids`` reduces only the
NODE-dimension URI vocabulary (per-batch unique + one node-keyed
groupby — the same broadcast budget as the annotate stage's closure),
sorts it for dense-rank enumeration (min-int == min-URI stays exact
for the component/BFS consumers), broadcasts it once via ``ray.put``,
and maps edge URIs to ints inside ``map_batches``; the int edge list
stays a Dataset, materialized once as the static side of every
iteration loop.  Per-node side tables (out-weight, degree) are
node-dimension-sized and ride as broadcast numpy arrays; the triangle
membership check is BUCKETED (wedges and edges co-located on the low
endpoint) rather than a broadcast edge-key array.
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


def degree_histogram(sf_dir: str):
    """(degree, n_classes) — the degree distribution of the
    co-occurrence graph, the one-line audit that tells a KG build
    whether its graph is hub-dominated (skew planning for the
    iterative ops) or flat.  Second-level combiner over class_degree's
    class-dimension-sized output — both exchanges are node-sized."""
    from ray.data.aggregate import Count

    return (class_degree(sf_dir)
            .groupby("degree").aggregate(Count(alias_name="n_classes")))


def degree_histogram_sql() -> str:
    return f"""
WITH {_cooc_cte()},
sym AS (SELECT class_a AS class_uri FROM cooc
        UNION ALL SELECT class_b FROM cooc),
deg AS (SELECT class_uri, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY class_uri)
SELECT degree, CAST(count(*) AS BIGINT) AS n_classes
FROM deg GROUP BY degree
"""


_HITS_BUCKETS = 32


def class_hits(sf_dir: str):
    """(class_uri, df, auth2) — two exact unnormalized HITS rounds over
    the BIPARTITE conversation↔class graph (edges = distinct
    (conv, class) direct-annotation pairs): ``df`` is the class's
    first-round authority (its conversation frequency), ``auth2`` the
    second-round authority Σ over its conversations of the
    conversation's hub score h1 = Σ df of ITS classes — the mutual
    reinforcement signal ("a class matters when it appears in
    concept-rich conversations").  Unnormalized fixed-K iteration keeps
    every number an exact int64 (values bounded by df·Σdf — no
    per-round normalization division), the ops/kgraph fixed-point
    discipline.

    Scale shape: per-batch distinct pairs → one (conv, class)-keyed
    dedup groupby; df via a class-keyed Count broadcast as sorted
    arrays; then ONE conv-bucket exchange co-locates each
    conversation's edges, h1 and the per-class a2 partials compute
    inside the bucket, and a final class-keyed Sum finishes.  The
    conversation-dimension h1 table never materializes globally."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.materialize import add_bucket_column

    tri = _direct_triples(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pa.Table.from_arrays(
            [t.column("conv_id").cast(pa.string()),
             t.column("obj").cast(pa.string())],
            names=["conv_id", "obj"]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(["conv_id", "obj"]),
            preserve_index=False)

    edges = (tri.map_batches(pairs, batch_format="pyarrow")
             .groupby(["conv_id", "obj"]).aggregate(Count(alias_name="_c"))
             .map_batches(lambda t: t.select(["conv_id", "obj"]),
                          batch_format="pyarrow")
             .materialize())

    dfq = (edges.groupby("obj").aggregate(Count(alias_name="df"))
           .to_pandas())  # class-dimension-sized: documented small side
    dfq = dfq.sort_values("obj", kind="mergesort")
    uris = dfq["obj"].to_numpy(np.str_)
    dfv = dfq["df"].to_numpy(np.int64)
    ref = ray.put((uris, dfv))

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        vocab, dv = ray.get(ref)
        a1 = dv[np.searchsorted(vocab, df["obj"].to_numpy(np.str_))]
        conv_codes, _ = pd.factorize(df["conv_id"], sort=False)
        h1 = np.zeros(conv_codes.max() + 1 if len(df) else 0, np.int64)
        np.add.at(h1, conv_codes, a1)
        out = pd.DataFrame({"obj": df["obj"].to_numpy(),
                            "a2": h1[conv_codes]})
        return (out.groupby("obj", sort=False)["a2"].sum()
                .reset_index())

    bucketed = edges.map_batches(
        lambda t: add_bucket_column(t, _HITS_BUCKETS),
        batch_format="pyarrow")
    a2 = (bucketed.groupby("bucket")
          .map_groups(lambda df: bucket_partial(df.drop(columns=["bucket"])),
                      batch_format="pandas")
          .groupby("obj").aggregate(Sum("a2", alias_name="auth2")))

    def finish(t: pa.Table) -> pa.Table:
        vocab, dv = ray.get(ref)
        o = t.column("obj").cast(pa.string()).to_numpy(zero_copy_only=False)
        d = dv[np.searchsorted(vocab, o.astype(np.str_))]
        return pa.Table.from_arrays(
            [t.column("obj").cast(pa.string()), pa.array(d),
             pc.cast(t.column("auth2"), pa.int64())],
            names=["class_uri", "df", "auth2"])

    return a2.map_batches(finish, batch_format="pyarrow")


def assortativity_ppm(m: int, s1: int, s2: int, sxy: int) -> int:
    """Exact fixed-point Pearson degree correlation from the directed-
    pair moments (Python ints — the caller's table is one row):
    r = (M·Sxy − S1²) / (M·S2 − S1²), in parts-per-million, floor
    division.  A REGULAR graph (every degree equal — true of the dense
    co-occurrence fixtures) has zero variance; r is undefined there and
    this returns 0 by documented convention (both sides share it)."""
    num = m * sxy - s1 * s1
    den = m * s2 - s1 * s1
    if den == 0:
        return 0
    return (1_000_000 * num) // den


def class_assortativity(sf_dir: str):
    """One row (n_pairs, sum_x, sum_xx, sum_xy, r_ppm) — the degree-
    assortativity moments of the co-occurrence graph over its directed
    edge pairs, plus the exact ppm Pearson coefficient (hubs-link-hubs
    vs hubs-link-leaves; the skew diagnostic that decides whether the
    iterative ops need hot-key salting).  Combiner: per-batch int64
    moment partials (degrees via the broadcast node-dimension array),
    one constant-key Sum, Python-int finish on the single row."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["n_pairs", "sum_x", "sum_xx", "sum_xy", "r_ppm"],
                      [pa.int64()] * 5)
    deg_ref = ray.put(_sym_degree(eds, n))

    def partial(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da, db = d[a], d[b]
        return pa.Table.from_arrays(
            [pa.array([0], pa.int64()),
             pa.array([2 * len(a)], pa.int64()),
             pa.array([int(da.sum() + db.sum())], pa.int64()),
             pa.array([int((da * da).sum() + (db * db).sum())], pa.int64()),
             pa.array([2 * int((da * db).sum())], pa.int64())],
            names=["k", "m", "s1", "s2", "sxy"])

    agg = (eds.map_batches(partial, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("m", alias_name="m"),
                                   Sum("s1", alias_name="s1"),
                                   Sum("s2", alias_name="s2"),
                                   Sum("sxy", alias_name="sxy")))

    def finish(t: pa.Table) -> pa.Table:
        m = int(t.column("m")[0].as_py())
        s1 = int(t.column("s1")[0].as_py())
        s2 = int(t.column("s2")[0].as_py())
        sxy = int(t.column("sxy")[0].as_py())
        return pa.Table.from_arrays(
            [pa.array([m], pa.int64()), pa.array([s1], pa.int64()),
             pa.array([s2], pa.int64()), pa.array([sxy], pa.int64()),
             pa.array([assortativity_ppm(m, s1, s2, sxy)], pa.int64())],
            names=["n_pairs", "sum_x", "sum_xx", "sum_xy", "r_ppm"])

    return agg.map_batches(finish, batch_format="pyarrow")


def class_assortativity_sql() -> str:
    return f"""
WITH {_cooc_cte()},
e AS (SELECT class_a AS a, class_b AS b FROM cooc
      UNION ALL SELECT class_b, class_a FROM cooc),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS u FROM e) GROUP BY u),
p AS (SELECT d1.d AS x, d2.d AS y
      FROM e JOIN deg d1 ON d1.u = e.a JOIN deg d2 ON d2.u = e.b),
mom AS (SELECT CAST(count(*) AS HUGEINT) AS m,
               CAST(sum(x) AS HUGEINT) AS s1,
               CAST(sum(x*x) AS HUGEINT) AS s2,
               CAST(sum(x*y) AS HUGEINT) AS sxy
        FROM p)
SELECT CAST(m AS BIGINT) AS n_pairs, CAST(s1 AS BIGINT) AS sum_x,
       CAST(s2 AS BIGINT) AS sum_xx, CAST(sxy AS BIGINT) AS sum_xy,
       CAST(CASE WHEN m*s2 - s1*s1 = 0 THEN 0
            ELSE (1000000 * (m*sxy - s1*s1)) // (m*s2 - s1*s1)
            END AS BIGINT) AS r_ppm
FROM mom
"""


def class_hits_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
e AS (SELECT DISTINCT conv_id, obj FROM tri
      WHERE pred = 'annotated_with'),
a1 AS (SELECT obj, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY obj),
h1 AS (SELECT e.conv_id, CAST(sum(a1.df) AS BIGINT) AS h
       FROM e JOIN a1 USING (obj) GROUP BY e.conv_id),
a2 AS (SELECT e.obj, CAST(sum(h1.h) AS BIGINT) AS auth2
       FROM e JOIN h1 USING (conv_id) GROUP BY e.obj)
SELECT a1.obj AS class_uri, a1.df, a2.auth2
FROM a1 JOIN a2 USING (obj)
"""


def _edge_ids(sf_dir: str):
    """Distributed edge prologue (closes VERDICT r4 What's-wrong #1).

    The co-occurrence EDGE set is O(co-occurring class pairs) — C²-ish,
    never driver-safe — so it stays a Dataset end to end (materialized
    once in the object store; every consumer's iteration loop reuses
    it).  Only the NODE-dimension URI vocabulary is reduced distributed
    (per-batch ``pc.unique`` + one node-keyed groupby), collected
    (documented small side: the same budget as the annotate stage's
    closure broadcast), sorted for dense-rank enumeration, and
    broadcast once via ``ray.put``; edge URIs map to ids inside
    ``map_batches`` with one hashed ``index_in`` per batch.  Sorted
    enumeration keeps min-int == min-URI exact, and preserves a < b on
    the int side because class_cooccurrence emits class_a < class_b.

    Returns ``(uri_ref, n_nodes, eds)`` with ``uri_ref`` the broadcast
    sorted ``pa.StringArray`` and ``eds`` a Dataset of (a, b, w)."""
    import ray
    from ray.data.aggregate import Count

    edges = class_cooccurrence(sf_dir).materialize()

    def emit_uris(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [t.column("class_a").cast(pa.string()).combine_chunks(),
             t.column("class_b").cast(pa.string()).combine_chunks()])
        return pa.Table.from_arrays([pc.unique(u)], names=["u"])

    uri_df = (edges.map_batches(emit_uris, batch_format="pyarrow")
              .groupby("u").aggregate(Count(alias_name="_c"))
              .to_pandas())  # node-dimension-sized: documented small side
    uris = pa.array(sorted(uri_df["u"].tolist()), pa.string())
    n = len(uris)
    uri_ref = ray.put(uris)

    def to_ints(t: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        a = pc.index_in(t.column("class_a").cast(pa.string()),
                        value_set=lut)
        b = pc.index_in(t.column("class_b").cast(pa.string()),
                        value_set=lut)
        return pa.Table.from_arrays(
            [a.cast(pa.int64()), b.cast(pa.int64()),
             t.column("n_turns").cast(pa.int64())],
            names=["a", "b", "w"])

    eds = (edges.map_batches(to_ints, batch_format="pyarrow")
           .materialize())
    return uri_ref, n, eds


def _sym_degree(eds, n: int) -> np.ndarray:
    """Symmetric degree per node via one distributed Count, returned as
    a dense node-DIMENSION-sized numpy array (the documented broadcast
    small side — never edge-sized)."""
    from ray.data.aggregate import Count

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.Table.from_arrays([pa.concat_arrays([a, b])],
                                    names=["src"])

    df = (eds.map_batches(sym, batch_format="pyarrow")
          .groupby("src").aggregate(Count(alias_name="d")).to_pandas())
    deg = np.zeros(n, np.int64)
    deg[df["src"].to_numpy(np.int64)] = df["d"].to_numpy(np.int64)
    return deg


def _components_nodes(eds):
    """Int edge Dataset (a, b, …) → (node:int64, component:int64) via
    the distributed min-label propagation from ops/clusters."""
    from .clusters import label_propagation

    def sym_nodes(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).combine_chunks()
        b = t.column("b").cast(pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            names=["node", "nbr"])

    return label_propagation(
        eds.map_batches(sym_nodes, batch_format="pyarrow"))


def cooccur_components(sf_dir: str):
    """(class_uri, component) — connected components of the
    co-occurrence graph, component = lexicographically smallest class
    URI reachable.  The edge list stays a Dataset (distributed
    prologue, ``_edge_ids``); min-label propagation runs on dense ints
    (ops/clusters), and the sorted enumeration makes min-int == min-URI
    exact."""
    import ray

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "component"], [pa.string(), pa.string()])

    def back(batch: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        return pa.Table.from_arrays(
            [lut.take(batch.column("doc_id").cast(pa.int32())),
             lut.take(batch.column("cluster_id").cast(pa.int32()))],
            names=["class_uri", "component"])

    return _components_nodes(eds).map_batches(back, batch_format="pyarrow")


PR_SCALE = 10**8        # fixed-point unit: p0 = 1.0 == 10^8
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
PR_ITERS = 3


def _empty(names: list[str], types: list[pa.DataType]):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_arrays(
        [pa.array([], t) for t in types], names=names))


def class_pagerank(sf_dir: str):
    """(class_uri, pagerank) — weighted PageRank over the symmetric
    co-occurrence graph, ``PR_ITERS`` fixed iterations, damping 0.85,
    ALL arithmetic in int64 fixed point (unit ``PR_SCALE``):

        contrib(u→v) = (p_u * w_uv) // wsum_u        (per-edge floor)
        p'(v) = PR_BASE + PR_DAMP_NUM * Σ contrib // PR_DAMP_DEN

    which the SQL twin reproduces exactly with HUGEINT intermediates.
    Iteration shape is ops/clusters.label_propagation's: the static
    weighted edge side (with its per-source out-weight attached) is
    partitioned on ``src % n_parts`` and materialized ONCE; per round
    one grouped exchange co-locates the node-sized label table with it,
    ONE vectorized pandas merge per coarse partition emits per-edge
    contributions, and a native node-keyed groupby sums them.  Only the
    label table (one int64 row per node) moves per round.

    int64 headroom: total mass stays ≤ n_nodes·PR_SCALE, so the per-edge
    product needs n_nodes·PR_SCALE·max_w < 2^63 (asserted); past that,
    split the product exactly as (p//wsum)·w + ((p%wsum)·w)//wsum.

    r5: the edge list arrives as a Dataset (``_edge_ids``); per-source
    out-weights come from one distributed Sum/Max groupby, broadcast as
    a node-dimension numpy array, and the tagged symmetric edge side is
    built inside ``map_batches`` — nothing edge-sized touches the
    driver."""
    import ray

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "pagerank"], [pa.string(), pa.int64()])
    labels = _pagerank_nodes(n, eds)

    def back(t: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        return pa.Table.from_arrays(
            [lut.take(t.column("node").cast(pa.int32())),
             t.column("p").cast(pa.int64())],
            names=["class_uri", "pagerank"])

    return labels.map_batches(back, batch_format="pyarrow")


def _pagerank_nodes(n: int, eds):
    """Fixed-point weighted PageRank over the symmetric view of an int
    edge Dataset (a, b, w) → (node, p) Dataset.  Seam for tests to force
    edge count ≫ node count without the annotate prologue."""
    import ray
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from .pairs import n_parts_for_rows

    def sym_w(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).combine_chunks()
        b = t.column("b").cast(pa.int64()).combine_chunks()
        w = t.column("w").cast(pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([w, w])],
            names=["src", "w"])

    # per-source out-weight: distributed combine, node-dimension result
    # (exact int64 end to end — fixed-point needs no float anywhere)
    wdf = (eds.map_batches(sym_w, batch_format="pyarrow")
           .groupby("src").aggregate(Sum("w", alias_name="wsum"),
                                     Max("w", alias_name="wmax"))
           .to_pandas())  # node-dimension-sized: documented small side
    wsum = np.zeros(n, np.int64)
    wsum[wdf["src"].to_numpy(np.int64)] = wdf["wsum"].to_numpy(np.int64)
    assert int(n) * PR_SCALE * int(wdf["wmax"].max()) < 2**62, \
        "int64 headroom"
    wsum_ref = ray.put(wsum)
    n_parts = n_parts_for_rows(2 * eds.count())

    def tag_edges(t: pa.Table) -> pa.Table:
        av = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bv = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        wv = t.column("w").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = ray.get(wsum_ref)
        src = np.r_[av, bv]
        dst = np.r_[bv, av]
        ww = np.r_[wv, wv]
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(dst), pa.array(ww),
             pa.array(ws[src]), pa.array(np.full(len(src), -1, np.int64)),
             pa.array((src % n_parts).astype(np.int32))],
            names=["src", "dst", "w", "wsum", "p", "part"])

    edges_tagged = eds.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    import ray.data as rd

    labels = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(np.arange(n, dtype=np.int64)),
         pa.array(np.full(n, PR_SCALE, np.int64))],
        names=["node", "p"]))

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").cast(pa.int64()).combine_chunks()
        z = pa.array(np.full(len(t), -1, np.int64))
        return pa.Table.from_arrays(
            [node, z, z, z, t.column("p").cast(pa.int64()),
             pa.array((node.to_numpy() % n_parts).astype(np.int32))],
            names=["src", "dst", "w", "wsum", "p", "part"])

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        is_lbl = df["dst"].to_numpy() < 0
        lbl = df.loc[is_lbl, ["src", "p"]]
        edg = df.loc[~is_lbl, ["src", "dst", "w", "wsum"]]
        m = edg.merge(lbl, on="src", how="inner")
        contrib = (m["p"].to_numpy(np.int64) * m["w"].to_numpy(np.int64)
                   ) // m["wsum"].to_numpy(np.int64)
        return pd.DataFrame({"node": m["dst"].to_numpy(np.int64),
                             "contrib": contrib})

    for _ in range(PR_ITERS):
        labels = (edges_tagged
                  .union(labels.map_batches(tag_labels,
                                            batch_format="pyarrow"))
                  .groupby("part").map_groups(emit, batch_format="pandas")
                  .groupby("node")
                  .aggregate(Sum("contrib", alias_name="s"))
                  .map_batches(lambda t: pa.Table.from_arrays(
                      [t.column("node"),
                       pc.add(pa.scalar(PR_BASE, pa.int64()),
                              pc.divide(pc.multiply(
                                  t.column("s").cast(pa.int64()),
                                  pa.scalar(PR_DAMP_NUM, pa.int64())),
                                  pa.scalar(PR_DAMP_DEN, pa.int64())))],
                      names=["node", "p"]), batch_format="pyarrow")
                  .materialize())

    return labels


def class_pagerank_sql() -> str:
    base = f"""
edges AS (SELECT class_a AS src, class_b AS dst, n_turns AS w FROM cooc
          UNION ALL
          SELECT class_b, class_a, n_turns FROM cooc),
wdeg AS (SELECT src, sum(w) AS wsum FROM edges GROUP BY src),
p0 AS (SELECT src AS node, CAST({PR_SCALE} AS HUGEINT) AS p FROM wdeg)"""
    its = []
    for i in range(PR_ITERS):
        its.append(f"""
p{i + 1} AS (
  SELECT e.dst AS node,
         {PR_BASE} + {PR_DAMP_NUM} *
           sum((p.p * CAST(e.w AS HUGEINT)) // CAST(d.wsum AS HUGEINT))
           // {PR_DAMP_DEN} AS p
  FROM edges e
  JOIN p{i} p ON p.node = e.src
  JOIN wdeg d ON d.src = e.src
  GROUP BY e.dst)""")
    return (f"WITH {_cooc_cte()}, {base},{','.join(its)}\n"
            f"SELECT node AS class_uri, CAST(p AS BIGINT) AS pagerank "
            f"FROM p{PR_ITERS}")


_TRI_BUCKETS = 32


def class_triangles(sf_dir: str):
    """(class_uri, n_triangles) — exact triangle participation counts
    via the forward algorithm: orient every edge low→high, generate
    wedges only where the center precedes BOTH neighbors (each triangle
    x<y<z then appears exactly once, centered at x), and keep wedges
    whose (y, z) leg is itself an edge.  Wedge generation is the same
    lexsort + ``pairs_in_runs`` kernel as pair induction; the membership
    check is BUCKETED (r5, replacing the broadcast edge-key array):
    candidate wedges and edges co-locate on the low endpoint's hash
    bucket and each group runs one sorted ``np.isin`` against its
    bucket-local edge subset — nothing edge-sized is broadcast or
    driver-resident.  Classes in no triangle are absent, matching the
    SQL twin."""
    import ray
    from ray.data.aggregate import Sum

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "n_triangles"],
                      [pa.string(), pa.int64()])

    def back(t: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        return pa.Table.from_arrays(
            [lut.take(t.column("node").cast(pa.int32())),
             t.column("n_triangles").cast(pa.int64())],
            names=["class_uri", "n_triangles"])

    return (_triangles_nodes(n, eds)
            .groupby("node").aggregate(Sum("c", alias_name="n_triangles"))
            .map_batches(back, batch_format="pyarrow"))


def _triangles_nodes(n: int, eds):
    """Forward-wedge triangle counting over an int edge Dataset (a, b)
    with a < b → per-partition partial (node, c) rows (callers combine
    with a node-keyed Sum).  Two coarse exchanges: wedge generation on
    the center's bucket, then membership on the LOW endpoint's bucket
    so each group checks candidates against only its bucket-local edge
    subset.  Seam for tests to force edge count ≫ node count."""
    import pandas as pd

    from .pairs import pairs_in_runs

    def tag_fwd(t: pa.Table) -> pa.Table:
        av = t.column("a").cast(pa.int64()).combine_chunks()
        return pa.Table.from_arrays(
            [av, t.column("b").cast(pa.int64()),
             pa.array((av.to_numpy() % _TRI_BUCKETS).astype(np.int32))],
            names=["a", "b", "part"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        av = df["a"].to_numpy(np.int64)
        bv = df["b"].to_numpy(np.int64)
        order = np.lexsort((bv, av))
        ia, ib = pairs_in_runs(av[order], None)
        lo, hi = bv[order][ia], bv[order][ib]  # lo < hi within a run
        return pd.DataFrame({
            "x": av[order][ia], "lo": lo, "hi": hi,
            "part2": (lo % _TRI_BUCKETS).astype(np.int32)})

    def tag_member(df: pd.DataFrame) -> pd.DataFrame:
        # pandas out to match the wedge stage's block type (a mixed
        # Arrow/pandas union breaks the downstream groupby)
        av = df["a"].to_numpy(np.int64)
        return pd.DataFrame({
            "x": np.full(len(df), -1, np.int64),
            "lo": av, "hi": df["b"].to_numpy(np.int64),
            "part2": (av % _TRI_BUCKETS).astype(np.int32)})

    def check(df: pd.DataFrame) -> pd.DataFrame:
        xv = df["x"].to_numpy(np.int64)
        keys = (df["lo"].to_numpy(np.int64) * n
                + df["hi"].to_numpy(np.int64))
        is_edge = xv < 0
        hit = np.isin(keys[~is_edge], keys[is_edge])
        verts = np.concatenate(
            [xv[~is_edge][hit],
             df["lo"].to_numpy(np.int64)[~is_edge][hit],
             df["hi"].to_numpy(np.int64)[~is_edge][hit]])
        if not len(verts):
            return pd.DataFrame({"node": np.empty(0, np.int64),
                                 "c": np.empty(0, np.int64)})
        nodes, cnt = np.unique(verts, return_counts=True)
        return pd.DataFrame({"node": nodes.astype(np.int64),
                             "c": cnt.astype(np.int64)})

    cand = (eds.map_batches(tag_fwd, batch_format="pyarrow")
            .groupby("part").map_groups(wedges, batch_format="pandas"))
    member = eds.map_batches(tag_member, batch_format="pandas")
    return (cand.union(member)
            .groupby("part2").map_groups(check, batch_format="pandas"))


def class_triangles_sql() -> str:
    return f"""
WITH {_cooc_cte()},
e AS (SELECT class_a AS a, class_b AS b FROM cooc),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
verts AS (SELECT x AS v FROM tris UNION ALL SELECT y FROM tris
          UNION ALL SELECT z FROM tris)
SELECT v AS class_uri, CAST(count(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY v
"""


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


BFS_MAX_HOPS = 4


def class_bfs(sf_dir: str):
    """(class_uri, dist) — exact min-hop distances (≤ ``BFS_MAX_HOPS``)
    from the lexicographically smallest class URI over the symmetric
    co-occurrence graph.  Same distributed iteration shape as
    ``class_pagerank`` / ``ops.clusters.label_propagation``: the static
    edge side is partitioned on ``src % n_parts`` and materialized ONCE;
    per round the (node, dist) frontier table co-locates with it via one
    grouped exchange, ONE pandas merge per coarse partition emits
    (dst, dist+1) plus the pass-through of known distances, and a native
    node-keyed ``Min`` groupby combines — old distances survive because
    they are re-emitted, so the table is monotone non-increasing per
    node.  Only the node-sized distance table moves per round.
    Unreached classes are absent, matching the SQL twin (a bounded-depth
    recursive CTE over (node, d) pairs).

    r5: the edge list arrives as a Dataset (``_edge_ids``); the tagged
    symmetric edge side is built inside ``map_batches`` — nothing
    edge-sized touches the driver."""
    import ray

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "dist"], [pa.string(), pa.int64()])
    labels = _bfs_nodes(eds, seed=0)

    def back(t: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        return pa.Table.from_arrays(
            [lut.take(t.column("node").cast(pa.int32())),
             t.column("d").cast(pa.int64())],
            names=["class_uri", "dist"])

    return labels.map_batches(back, batch_format="pyarrow")


def _bfs_nodes(eds, seed: int, max_hops: int = BFS_MAX_HOPS):
    """Min-hop distances (≤ max_hops) from ``seed`` over the symmetric
    view of an int edge Dataset (a, b, …) → (node, d) Dataset.  Seam
    for tests to force edge count ≫ node count."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Min

    from .pairs import n_parts_for_rows

    n_parts = n_parts_for_rows(2 * eds.count())

    def tag_edges(t: pa.Table) -> pa.Table:
        av = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bv = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        src = np.r_[av, bv]
        dst = np.r_[bv, av]
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(dst),
             pa.array(np.full(len(src), -1, np.int64)),
             pa.array((src % n_parts).astype(np.int32))],
            names=["src", "dst", "d", "part"])

    edges_tagged = eds.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    # seed: sorted enumeration makes node 0 == min URI
    labels = rd.from_arrow(pa.Table.from_arrays(
        [pa.array([seed], pa.int64()), pa.array(np.zeros(1, np.int64))],
        names=["node", "d"]))

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").cast(pa.int64()).combine_chunks()
        z = pa.array(np.full(len(t), -2, np.int64))
        return pa.Table.from_arrays(
            [node, z, t.column("d").cast(pa.int64()),
             pa.array((node.to_numpy() % n_parts).astype(np.int32))],
            names=["src", "dst", "d", "part"])

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        is_lbl = df["dst"].to_numpy() < 0
        lbl = df.loc[is_lbl, ["src", "d"]]
        edg = df.loc[~is_lbl, ["src", "dst"]]
        m = edg.merge(lbl, on="src", how="inner")
        return pd.DataFrame({
            "node": np.concatenate([lbl["src"].to_numpy(np.int64),
                                    m["dst"].to_numpy(np.int64)]),
            "d": np.concatenate([lbl["d"].to_numpy(np.int64),
                                 m["d"].to_numpy(np.int64) + 1])})

    for _ in range(max_hops):
        labels = (edges_tagged
                  .union(labels.map_batches(tag_labels,
                                            batch_format="pyarrow"))
                  .groupby("part").map_groups(emit, batch_format="pandas")
                  .groupby("node").aggregate(Min("d", alias_name="d"))
                  .materialize())

    return labels


def class_bfs_sql() -> str:
    return f"""
WITH RECURSIVE {_cooc_cte()},
edges AS (SELECT class_a AS a, class_b AS b FROM cooc
          UNION SELECT class_b, class_a FROM cooc),
reach(node, d) AS (
    SELECT (SELECT min(a) FROM edges), 0
    UNION
    SELECT e.b, r.d + 1 FROM reach r JOIN edges e ON e.a = r.node
    WHERE r.d < {BFS_MAX_HOPS}
)
SELECT node AS class_uri, CAST(min(d) AS BIGINT) AS dist
FROM reach GROUP BY node
"""


_JAC_BUCKETS = 32


def class_jaccard(sf_dir: str):
    """(class_a, class_b, common, jaccard_ppm) — neighborhood-overlap
    link prediction: for every class pair sharing ≥1 co-occurrence
    neighbor, the common-neighbor count and the Jaccard similarity of
    their neighbor SETS in exact parts-per-million integer arithmetic
    (``1_000_000·common // (deg_a + deg_b − common)``, floor division
    on both sides).  Wedge generation reuses the lexsort +
    ``pairs_in_runs`` kernel per coarse partition keyed on the shared
    neighbor; degrees come from one distributed Count over the
    symmetric edge Dataset (``_sym_degree`` — node-dimension-sized) and
    ride into the final map as a ``ray.put`` broadcast.  r5: the edge
    list stays a Dataset (``_edge_ids``); nothing edge-sized touches
    the driver."""
    import ray
    import pandas as pd
    from ray.data.aggregate import Sum

    from .pairs import pairs_in_runs

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_a", "class_b", "common", "jaccard_ppm"],
                      [pa.string(), pa.string(), pa.int64(), pa.int64()])
    deg_ref = ray.put(_sym_degree(eds, n))

    def sym_zx(t: pa.Table) -> pa.Table:
        av = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bv = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        center = np.r_[av, bv]
        leaf = np.r_[bv, av]
        return pa.Table.from_arrays(
            [pa.array(center), pa.array(leaf),
             pa.array((center % _JAC_BUCKETS).astype(np.int32))],
            names=["z", "x", "part"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        zv = df["z"].to_numpy(np.int64)
        xv = df["x"].to_numpy(np.int64)
        order = np.lexsort((xv, zv))
        ia, ib = pairs_in_runs(zv[order], None)  # exact: oracle-gated
        lo, hi = xv[order][ia], xv[order][ib]    # lo < hi within a run
        out = (pd.DataFrame({"a": lo, "b": hi})
               .groupby(["a", "b"], sort=False).size()
               .reset_index(name="c"))
        return out

    def finish(t: pa.Table) -> pa.Table:
        lut = ray.get(uri_ref)
        deg = ray.get(deg_ref)
        av = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bv = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        common = t.column("common").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        union = deg[av] + deg[bv] - common  # ≥ common ≥ 1: no div-by-0
        return pa.Table.from_arrays(
            [lut.take(pa.array(av.astype(np.int32))),
             lut.take(pa.array(bv.astype(np.int32))),
             pa.array(common),
             pa.array((1_000_000 * common) // union)],
            names=["class_a", "class_b", "common", "jaccard_ppm"])

    return (eds.map_batches(sym_zx, batch_format="pyarrow")
            .groupby("part").map_groups(wedges, batch_format="pandas")
            .groupby(["a", "b"]).aggregate(Sum("c", alias_name="common"))
            .map_batches(finish, batch_format="pyarrow"))


def class_jaccard_sql() -> str:
    return f"""
WITH {_cooc_cte()},
sym AS (SELECT class_a AS z, class_b AS x FROM cooc
        UNION ALL SELECT class_b, class_a FROM cooc),
common AS (
  SELECT s1.x AS a, s2.x AS b, CAST(count(*) AS BIGINT) AS common
  FROM sym s1 JOIN sym s2 ON s1.z = s2.z AND s1.x < s2.x
  GROUP BY s1.x, s2.x),
deg AS (SELECT z, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY z)
SELECT c.a AS class_a, c.b AS class_b, c.common,
       CAST((1000000 * c.common) // (da.d + db.d - c.common) AS BIGINT)
         AS jaccard_ppm
FROM common c
JOIN deg da ON da.z = c.a
JOIN deg db ON db.z = c.b
"""


def class_clustering(sf_dir: str):
    """(class_uri, degree, n_triangles, cc_ppm) — local clustering
    coefficient per class with degree ≥ 2, in exact ppm integer
    arithmetic: ``1_000_000 · 2 · triangles // (deg · (deg − 1))``.
    Degrees come from one distributed Count (``_sym_degree``); triangle
    counts from the shared ``_triangles_nodes`` seam over the SAME
    materialized edge Dataset (one prologue run, zero-triangle classes
    get 0).  The combine step runs driver-side over node-DIMENSION-sized
    arrays — the documented small side; the edge list itself never
    leaves the object store (r5)."""
    import ray
    import ray.data as rd

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "degree", "n_triangles", "cc_ppm"],
                      [pa.string(), pa.int64(), pa.int64(), pa.int64()])
    deg = _sym_degree(eds, n)
    tri = np.zeros(n, np.int64)
    tdf = _triangles_nodes(n, eds).to_pandas()  # node-sized partials
    np.add.at(tri, tdf["node"].to_numpy(np.int64),
              tdf["c"].to_numpy(np.int64))
    keep = np.flatnonzero(deg >= 2)
    cc = (1_000_000 * 2 * tri[keep]) // (deg[keep] * (deg[keep] - 1))
    lut = ray.get(uri_ref)
    return rd.from_arrow(pa.Table.from_arrays(
        [lut.take(pa.array(keep.astype(np.int32))),
         pa.array(deg[keep]), pa.array(tri[keep]), pa.array(cc)],
        names=["class_uri", "degree", "n_triangles", "cc_ppm"]))


def class_clustering_sql() -> str:
    return f"""
WITH {_cooc_cte()},
e AS (SELECT class_a AS a, class_b AS b FROM cooc),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY a),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
verts AS (SELECT x AS v FROM tris UNION ALL SELECT y FROM tris
          UNION ALL SELECT z FROM tris),
tcnt AS (SELECT v, CAST(count(*) AS BIGINT) AS n_triangles
         FROM verts GROUP BY v)
SELECT d.v AS class_uri, d.degree,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       CAST((1000000 * 2 * COALESCE(t.n_triangles, 0))
            // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcnt t ON t.v = d.v
WHERE d.degree >= 2
"""


_DOM_BUCKETS = 32


def conv_dominant_class(sf_dir: str):
    """(conv_id, dominant_class, n) — the most-frequent directly
    annotated class per conversation (grouped mode), ties broken by
    lexicographically smallest class URI.  Combiner pattern: per-batch
    pandas (conv, class) partial counts, one native groupby Sum sized
    by distinct (conv, class) combos, then a conv-bucket coarse
    exchange whose per-group kernel is one vectorized
    sort + drop_duplicates — never a pandas call per conversation."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.materialize import add_bucket_column

    tri = _direct_triples(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["conv_id", "obj"], sort=False)
                .size().reset_index(name="n"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["conv_id", "n", "obj"],
                              ascending=[True, False, True], kind="stable")
               .drop_duplicates("conv_id", keep="first"))
        return out[["conv_id", "obj", "n"]].rename(
            columns={"obj": "dominant_class"})

    return (tri.map_batches(partial, batch_format="pandas")
            .groupby(["conv_id", "obj"]).aggregate(Sum("n", alias_name="n"))
            .map_batches(
                lambda b: add_bucket_column(b, _DOM_BUCKETS),
                batch_format="pyarrow")
            .groupby("bucket").map_groups(pick, batch_format="pandas"))


def entity_timeline(sf_dir: str):
    """(conv_id, obj, first_turn, last_turn, n_turns, n_mentions) —
    per-conversation entity timeline over the direct triples: when an
    entity first appears, when it last appears, how many distinct
    turns mention it, and total mentions.  The QC view a KG build uses
    to separate thread-spanning entities (link candidates) from
    one-off mentions.

    Combiner pattern: per-batch (conv, obj, turn) partial counts (the
    distinct-turn combiner — exact because the finish re-sums per key)
    shrink the exchange to distinct combos per batch; ONE conv-bucket
    exchange, then a single vectorized two-level groupby per bucket."""
    import pandas as pd

    from ..stages.materialize import add_bucket_column

    tri = _direct_triples(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["conv_id", "obj", "turn_idx"], sort=False)
                .size().reset_index(name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["conv_id", "obj", "turn_idx"], sort=False)["n"]
             .sum().reset_index())
        out = (g.groupby(["conv_id", "obj"], sort=False)
               .agg(first_turn=("turn_idx", "min"),
                    last_turn=("turn_idx", "max"),
                    n_turns=("turn_idx", "size"),
                    n_mentions=("n", "sum"))
               .reset_index())
        for c in ("first_turn", "last_turn", "n_turns"):
            out[c] = out[c].astype("int32")
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    return (tri.map_batches(partial, batch_format="pandas")
            .map_batches(lambda b: add_bucket_column(b, _DOM_BUCKETS),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda df: finish(df.drop(columns=["bucket"])),
                        batch_format="pandas"))


def entity_timeline_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri})
SELECT conv_id, obj,
       CAST(min(turn_idx) AS INTEGER) AS first_turn,
       CAST(max(turn_idx) AS INTEGER) AS last_turn,
       CAST(count(DISTINCT turn_idx) AS INTEGER) AS n_turns,
       CAST(count(*) AS BIGINT) AS n_mentions
FROM tri WHERE pred = 'annotated_with'
GROUP BY conv_id, obj
"""


def conv_dominant_class_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
d AS (SELECT conv_id, obj, CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE pred = 'annotated_with' GROUP BY conv_id, obj),
r AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id ORDER BY n DESC, obj ASC) AS rn FROM d)
SELECT conv_id, obj AS dominant_class, n FROM r WHERE rn = 1
"""


_TURNS_PER_CONV = 16  # documents_as_transcripts default


def class_by_lang(sf_dir: str):
    """(class_uri, lang, n) — annotation counts per (class, source
    language): the provenance-enrichment join a KG build runs to attach
    source metadata to extracted triples.  Demonstrates the NATIVE
    big×big hash join (``Dataset.join``, Ray ≥ 2.46): the triple side
    recovers its doc_id arithmetically (conv/turn derive from doc_id —
    sources/transcripts.py), the metadata side is a 2-column pruned
    read, and the join shuffles on the int64 doc key.  Counts use the
    combiner pattern so the second exchange moves one row per
    (class, lang) per batch.

    The keyed 2-int/uri projection is CHECKPOINTED (materialize)
    before the join: Ray 2.49's hash-shuffle join spawns aggregator
    actors, and fusing them into the same streaming plan as the
    annotate actor pool deadlocks under tight CPU budgets (observed
    at num_cpus=4 — both pools wait on each other's reservation).
    That matches production shape anyway: the enrichment join runs
    over the *persisted* annotation output (the flagship already
    sinks triples to partitioned Parquet), never fused to the
    extraction actors; the checkpoint is triple-count-sized rows of
    (int64, dict-encoded uri), not corpus text."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    tri = _direct_triples(sf_dir)

    def to_keyed(t: pa.Table) -> pa.Table:
        conv = pc.utf8_slice_codeunits(
            t.column("conv_id").cast(pa.string()), 5, 2**31 - 1)
        doc_id = pc.add(
            pc.multiply(pc.cast(conv, pa.int64()),
                        pa.scalar(_TURNS_PER_CONV, pa.int64())),
            t.column("turn_idx").cast(pa.int64()))
        return pa.Table.from_arrays([doc_id, t.column("obj")],
                                    names=["doc_id", "obj"])

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        # r5 (VERDICT r4 note #4): combine to (doc_id, obj, n) partials
        # per batch BEFORE the join, so the checkpoint and the join
        # shuffle carry distinct-pair rows, not one row per triple
        return (df.groupby(["doc_id", "obj"], sort=False)
                .size().reset_index(name="n"))

    keyed = (tri.map_batches(to_keyed, batch_format="pyarrow")
             .map_batches(pair_partial, batch_format="pandas")
             .materialize())  # checkpoint: see docstring
    joined = keyed.join(docs, join_type="inner", num_partitions=16,
                        on=("doc_id",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["obj", "lang"], sort=False)["n"]
                .sum().reset_index(name="n"))

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby(["obj", "lang"]).aggregate(Sum("n", alias_name="n"))
            .map_batches(lambda t: t.rename_columns(
                ["class_uri", "lang", "n"]), batch_format="pyarrow"))


def class_by_lang_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
keyed AS (
  SELECT CAST(substr(conv_id, 6) AS BIGINT) * {_TURNS_PER_CONV}
           + turn_idx AS doc_id,
         obj
  FROM tri WHERE pred = 'annotated_with')
SELECT k.obj AS class_uri, d.lang, CAST(count(*) AS BIGINT) AS n
FROM keyed k JOIN documents d ON d.doc_id = k.doc_id
GROUP BY k.obj, d.lang
"""


def class_rollup(sf_dir: str):
    """(class_uri, n_direct, n_rollup) — annotation counts per class,
    both direct and ROLLED UP the is-a DAG (every annotation also
    counts toward each ancestor, at any distance): the ontology-aware
    aggregation a KG build runs to size concept subtrees.  Combiner
    pattern: per-batch (class, n) partial counts → class-cardinality
    native Sum; the rollup then EXPANDS each class's total through a
    broadcast CSR of its ancestor set (docdict closure —
    class-dimension-sized, the same table the annotate stage
    broadcasts) with one np.repeat/take per batch, and a second
    class-keyed Sum combines.  Only class-cardinality rows ever move.

    Oracle: flat triples CTE joined to the closure VALUES + identity
    union — DuckDB aggregates the same rollup independently."""
    import ray
    from ray.data.aggregate import Sum

    from ..docdict import _closure, tables

    tri = _direct_triples(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("obj").combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values").cast(pa.string()),
             pc.cast(vc.field("counts"), pa.int64())],
            names=["class_uri", "n"])

    # materialized: class-cardinality-sized, consumed by BOTH the
    # rollup expansion and the final union (without this the whole
    # annotate lineage would re-execute once per consumer)
    direct = (tri.map_batches(partial, batch_format="pyarrow")
              .groupby("class_uri").aggregate(Sum("n", alias_name="n"))
              .materialize())

    # broadcast CSR: class uri -> [itself + all ancestors]
    # (class-dimension-sized — the documented driver small side; shipped
    # once per task via ray.put, read inside the batch fn)
    anc_of = {r["class_uri"]: [r["class_uri"]]
              for r in tables()["classes"].to_pylist()}
    for a, b, _d in _closure():
        anc_of.setdefault(a, [a]).append(b)
    ref = ray.put(anc_of)

    def expand(t: pa.Table) -> pa.Table:
        amap = ray.get(ref)
        cls = t.column("class_uri").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        lists = [amap.get(c, [c]) for c in cls]
        counts = np.fromiter((len(x) for x in lists), np.int64,
                             count=len(lists))
        out_cls = [a for x in lists for a in x]
        out_n = np.repeat(n, counts)
        return pa.Table.from_arrays(
            [pa.array(out_cls, pa.string()), pa.array(out_n)],
            names=["class_uri", "n_rollup"])

    rolled = (direct.map_batches(expand, batch_format="pyarrow")
              .groupby("class_uri")
              .aggregate(Sum("n_rollup", alias_name="n_rollup")))

    def tag_d(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("class_uri"), t.column("n").cast(pa.int64()),
             pa.array(np.zeros(len(t), np.int64))],
            names=["class_uri", "n_direct", "n_rollup"])

    def tag_r(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("class_uri"), pa.array(np.zeros(len(t), np.int64)),
             t.column("n_rollup").cast(pa.int64())],
            names=["class_uri", "n_direct", "n_rollup"])

    return (direct.map_batches(tag_d, batch_format="pyarrow")
            .union(rolled.map_batches(tag_r, batch_format="pyarrow"))
            .groupby("class_uri")
            .aggregate(Sum("n_direct", alias_name="n_direct"),
                       Sum("n_rollup", alias_name="n_rollup")))


def class_rollup_sql() -> str:
    from ..docdict import sql_closure_cte
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}), {sql_closure_cte()},
d AS (SELECT obj AS class_uri, CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE pred = 'annotated_with' GROUP BY obj),
up AS (SELECT class_uri, class_uri AS anc FROM d
       UNION ALL
       SELECT c.class_uri, c.ancestor_uri FROM clo c
       JOIN d ON d.class_uri = c.class_uri),
r AS (SELECT u.anc AS class_uri, CAST(sum(d.n) AS BIGINT) AS n_rollup
      FROM up u JOIN d ON d.class_uri = u.class_uri GROUP BY u.anc)
SELECT r.class_uri, COALESCE(d.n, 0) AS n_direct, r.n_rollup
FROM r LEFT JOIN d ON d.class_uri = r.class_uri
"""


_LIFT_BUCKETS = 32


def class_lift(sf_dir: str):
    """(class_a, class_b, n_ab, lift_ppm) — association strength for
    every co-occurrence edge, in exact parts-per-million integer
    arithmetic: ``lift = P(a,b) / (P(a)·P(b))`` rendered as
    ``10^6 · n_ab · T // (m_a · m_b)`` where ``n_ab`` = turns containing
    both classes, ``m_x`` = turns containing x, and ``T`` = distinct
    annotated turns — the edge-weighting a KG build uses to separate
    genuine associations from popularity artifacts (lift < 10^6 means
    the pair co-occurs LESS than independence predicts).

    Marginals ride the same bucketed-distinct shape as the edge
    builder: distinct (turn, class) per conv bucket (a bucket holds
    whole conversations, so bucket-local dedup is globally exact),
    per-batch partial counts, one class-cardinality Sum, broadcast as
    sorted parallel arrays (searchsorted lookup — the ops/lm.py
    pattern).  The finish kernel is vectorized int64 with exact
    overflow guards (r5, replacing the per-row Python loop):
    10^6·n_ab·T overflows int64 once T approaches 10^12 turns — rows
    whose numerator or denominator would overflow (and ONLY those)
    fall back to exact Python ints, and the DuckDB twin uses HUGEINT
    for the same reason."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.materialize import add_bucket_column

    tri = _direct_triples(sf_dir).map_batches(
        lambda b: add_bucket_column(
            b.select(["conv_id", "turn_idx", "obj"]), _LIFT_BUCKETS),
        batch_format="pyarrow")

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.drop_duplicates(["conv_id", "turn_idx", "obj"])
        per_class = (sub.groupby("obj", sort=False).size()
                     .reset_index(name="m"))
        n_turns = len(sub.drop_duplicates(["conv_id", "turn_idx"]))
        per_class.loc[len(per_class)] = ["\x00TOTAL", n_turns]
        return per_class

    marg_df = (tri.groupby("bucket")
               .map_groups(distinct_pairs, batch_format="pandas")
               .groupby("obj").aggregate(Sum("m", alias_name="m"))
               .to_pandas())  # class-dimension-sized: documented small side
    marg_df = marg_df.sort_values("obj", kind="mergesort")
    is_tot = marg_df["obj"].to_numpy() == "\x00TOTAL"
    total = int(marg_df.loc[is_tot, "m"].iloc[0])
    marg_uris = pa.array(marg_df["obj"].to_numpy()[~is_tot], pa.string())
    marg_vals = marg_df["m"].to_numpy(np.int64)[~is_tot]
    ref = ray.put((marg_uris, marg_vals, total))

    edges = class_cooccurrence(sf_dir)
    I64 = 2**63 - 1

    def finish(t: pa.Table) -> pa.Table:
        mu, mv, tot = ray.get(ref)
        ia = pc.index_in(t.column("class_a").cast(pa.string()),
                         value_set=mu).to_numpy(zero_copy_only=False)
        ib = pc.index_in(t.column("class_b").cast(pa.string()),
                         value_set=mu).to_numpy(zero_copy_only=False)
        ma, mb = mv[ia], mv[ib]
        nab = t.column("n_turns").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        lift = np.empty(len(nab), np.int64)
        if tot <= I64 // 1_000_000:
            num_c = 1_000_000 * tot  # exact scalar, fits int64
            # per-row exact guards: numerator num_c·nab and denominator
            # ma·mb must both fit int64 (then so does the floor quotient)
            ok = (nab <= I64 // num_c) & (ma <= I64 // mb)
        else:
            num_c = 0
            ok = np.zeros(len(nab), bool)
        oki = np.flatnonzero(ok)
        lift[oki] = (num_c * nab[oki]) // (ma[oki] * mb[oki])
        for i in np.flatnonzero(~ok):  # exact Python-int fallback:
            lift[i] = ((1_000_000 * int(nab[i]) * tot)  # overflow rows only
                       // (int(ma[i]) * int(mb[i])))
        return pa.Table.from_arrays(
            [t.column("class_a").cast(pa.string()),
             t.column("class_b").cast(pa.string()),
             pc.cast(t.column("n_turns"), pa.int64()),
             pa.array(lift)],
            names=["class_a", "class_b", "n_ab", "lift_ppm"])

    return edges.map_batches(finish, batch_format="pyarrow")


def class_lift_sql() -> str:
    return f"""
WITH {_cooc_cte()},
tc AS (SELECT DISTINCT conv_id, turn_idx, obj FROM tri
       WHERE pred = 'annotated_with'),
marg AS (SELECT obj, CAST(count(*) AS HUGEINT) AS m FROM tc GROUP BY obj),
tot AS (SELECT CAST(count(DISTINCT conv_id || '\x1f' ||
                          CAST(turn_idx AS VARCHAR)) AS HUGEINT) AS t
        FROM tc)
SELECT c.class_a, c.class_b, c.n_turns AS n_ab,
       CAST((1000000::HUGEINT * c.n_turns * tot.t) // (ma.m * mb.m)
            AS BIGINT) AS lift_ppm
FROM cooc c, tot
JOIN marg ma ON ma.obj = c.class_a
JOIN marg mb ON mb.obj = c.class_b
"""


_DIS_BUCKETS = 32


def disambiguate_spans(sf_dir: str):
    """(conv_id, turn_idx, from_1b, to_1b, chosen_class, n_candidates,
    votes) — coherence-based disambiguation of AMBIGUOUS spans: when
    one surface maps to 2+ ontology classes (docdict plants "spark" →
    DOC#Spark AND ALT#AltSpark), keep the candidate with the most
    conversation-level support (its total direct-annotation count in
    the same conversation — ambiguous mentions included, so the rule
    is self-contained), ties broken by lexicographically smallest
    class URI.  The step after entity linking in a KG build: local
    candidates, document-level coherence vote.

    Shape: ONE coarse exchange on the conv bucket (a bucket holds
    whole conversations, so per-conv vote counts and span groups are
    bucket-local and exact); per bucket one vectorized pandas pass —
    a (conv, class) groupby for votes, a span-key transform('nunique')
    to find ambiguity, one merge + sort + drop_duplicates to pick.
    No per-span Python anywhere."""
    import pandas as pd

    from ..stages.materialize import add_bucket_column

    tri = _direct_triples(sf_dir).map_batches(
        lambda b: add_bucket_column(
            b.select(["conv_id", "turn_idx", "from_1b", "to_1b", "obj"]),
            _DIS_BUCKETS),
        batch_format="pyarrow")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        votes = (df.groupby(["conv_id", "obj"], sort=False)
                 .size().rename("votes").reset_index())
        cand = df.drop_duplicates(
            ["conv_id", "turn_idx", "from_1b", "to_1b", "obj"]).copy()
        key = ["conv_id", "turn_idx", "from_1b", "to_1b"]
        ncand = cand.groupby(key, sort=False)["obj"].transform("nunique")
        amb = cand.loc[ncand.to_numpy() >= 2].merge(
            votes, on=["conv_id", "obj"], how="left")
        amb["n_candidates"] = amb.groupby(key, sort=False)["obj"].transform(
            "size")
        out = (amb.sort_values(key + ["votes", "obj"],
                               ascending=[True] * 4 + [False, True],
                               kind="stable")
               .drop_duplicates(key, keep="first"))
        out = out.rename(columns={"obj": "chosen_class"})
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out["from_1b"] = out["from_1b"].astype("int64")
        out["to_1b"] = out["to_1b"].astype("int64")
        out["n_candidates"] = out["n_candidates"].astype("int64")
        out["votes"] = out["votes"].astype("int64")
        return out[key + ["chosen_class", "n_candidates", "votes"]]

    return tri.groupby("bucket").map_groups(pick, batch_format="pandas")


def disambiguate_spans_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
d AS (SELECT DISTINCT conv_id, turn_idx, from_1b, to_1b, obj FROM tri
      WHERE pred = 'annotated_with'),
votes AS (SELECT conv_id, obj, CAST(count(*) AS BIGINT) AS votes
          FROM tri WHERE pred = 'annotated_with' GROUP BY conv_id, obj),
amb AS (
  SELECT d.*, v.votes,
         CAST(count(*) OVER (PARTITION BY d.conv_id, d.turn_idx,
                             d.from_1b, d.to_1b) AS BIGINT)
           AS n_candidates,
         row_number() OVER (PARTITION BY d.conv_id, d.turn_idx,
                            d.from_1b, d.to_1b
                            ORDER BY v.votes DESC, d.obj ASC) AS rn
  FROM d JOIN votes v ON v.conv_id = d.conv_id AND v.obj = d.obj)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(from_1b AS BIGINT) AS from_1b, CAST(to_1b AS BIGINT) AS to_1b,
       obj AS chosen_class, n_candidates, votes
FROM amb WHERE n_candidates >= 2 AND rn = 1
"""


def entity_components(sf_dir: str):
    """(class_uri, entity_id) — cross-ontology entity resolution: the
    connected components of the inter-ontology MAPPING graph (classes
    linked by mapped_to are the same real-world concept), each entity
    labeled by its lexicographically smallest member URI.  The fixture
    graph is non-trivial: DOC#Join and DOC#HashJoin both map to
    ALT#Junction, so the three URIs form one 3-node entity.  Reuses the
    distributed min-label propagation from ops/clusters (the same
    machinery that resolves dup clusters and co-occurrence components);
    the mapping edge list is class-dimension-sized — the documented
    driver small side — and the sorted URI enumeration makes min-int
    labels round-trip to min URIs exactly.  Classes with no mapping are
    absent, matching the SQL twin (a recursive CTE over the symmetric
    mapping edges)."""
    import ray.data as rd

    from ..docdict import tables
    from .clusters import label_propagation

    mp = tables()["mappings"]
    src_uris = mp.column("class_uri").to_pylist()
    dst_uris = mp.column("mapped_class_uri").to_pylist()
    if not src_uris:
        return _empty(["class_uri", "entity_id"],
                      [pa.string(), pa.string()])
    uris = sorted(set(src_uris) | set(dst_uris))
    idx = {u: i for i, u in enumerate(uris)}
    a = np.array([idx[u] for u in src_uris], np.int64)
    b = np.array([idx[u] for u in dst_uris], np.int64)
    eds = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(np.r_[a, b]), pa.array(np.r_[b, a])],
        names=["node", "nbr"]))
    comp = label_propagation(eds)
    lut = pa.array(uris)

    def back(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [lut.take(batch.column("doc_id").cast(pa.int32())),
             lut.take(batch.column("cluster_id").cast(pa.int32()))],
            names=["class_uri", "entity_id"])

    return comp.map_batches(back, batch_format="pyarrow")


def entity_components_sql() -> str:
    from ..docdict import sql_mappings_cte

    return f"""
WITH RECURSIVE {sql_mappings_cte()},
edges AS (SELECT class_uri AS a, mapped_class_uri AS b FROM map
          UNION SELECT mapped_class_uri, class_uri FROM map),
reach(node, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
    WHERE r.r < e.b
)
SELECT node AS class_uri, min(r) AS entity_id FROM reach GROUP BY node
"""


def class_semantic_sim(sf_dir: str):
    """(class_a, class_b, lca_uri, path_len) — ontology-based semantic
    similarity for every co-occurrence edge: the lowest common ancestor
    through the is-a DAG (minimum combined up-distance; identity
    counts, so a direct ancestor pair has path_len = its closure
    distance) and the up-up path length through it.  The
    BioPortal-ecosystem "semantic similarity" service shape, computed
    over the graph the annotator itself extracted; pairs with NO
    common ancestor (cross-ontology forests) are omitted.  Ties break
    to the lexicographically smallest ancestor URI.

    Scale shape: the is-a closure rides as ONE broadcast numpy CSR
    (class-dimension — the annotate stage's own closure budget, sorted
    vocab + per-class sorted ancestor ids), and each edge batch
    resolves its LCAs with a single vectorized sorted-key
    intersection: expand both endpoints' ancestor sets via CSR
    repeat/take (keys = edge·C + anc, ascending by construction),
    ``np.intersect1d`` on the two key arrays, then a lexsort
    first-in-run argmin per edge.  No per-edge Python, nothing but the
    class-dimension CSR ever leaves the edge partition."""
    import ray

    from ..docdict import _closure, tables

    uris = sorted(r["class_uri"] for r in tables()["classes"].to_pylist())
    idx = {u: i for i, u in enumerate(uris)}
    n_cls = len(uris)
    per: list[list[tuple[int, int]]] = [[(i, 0)] for i in range(n_cls)]
    for a, b, d in _closure():
        per[idx[a]].append((idx[b], d))
    indptr = np.zeros(n_cls + 1, np.int64)
    flat_anc: list[int] = []
    flat_d: list[int] = []
    for i, lst in enumerate(per):
        lst.sort()
        indptr[i + 1] = indptr[i] + len(lst)
        flat_anc.extend(x for x, _ in lst)
        flat_d.extend(dd for _, dd in lst)
    ref = ray.put((np.array(uris), indptr,
                   np.array(flat_anc, np.int64), np.array(flat_d, np.int64)))

    edges = class_cooccurrence(sf_dir)

    def lca(t: pa.Table) -> pa.Table:
        vocab, ptr, anc, dst = ray.get(ref)
        ia = np.searchsorted(vocab, t.column("class_a").to_numpy(
            zero_copy_only=False))
        ib = np.searchsorted(vocab, t.column("class_b").to_numpy(
            zero_copy_only=False))
        n_e = len(ia)

        def expand(ii: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            deg = ptr[ii + 1] - ptr[ii]
            tot = int(deg.sum())
            starts = np.repeat(ptr[ii], deg)
            within = np.arange(tot) - np.repeat(np.cumsum(deg) - deg, deg)
            pos = starts + within
            edge = np.repeat(np.arange(n_e, dtype=np.int64), deg)
            return edge * n_cls + anc[pos], dst[pos]

        ka, da = expand(ia)
        kb, db = expand(ib)
        common, i1, i2 = np.intersect1d(ka, kb, assume_unique=True,
                                        return_indices=True)
        path = da[i1] + db[i2]
        eidx = common // n_cls
        aidx = common % n_cls
        order = np.lexsort((aidx, path, eidx))
        eidx, aidx, path = eidx[order], aidx[order], path[order]
        first = np.ones(len(eidx), bool)
        first[1:] = eidx[1:] != eidx[:-1]
        take = pa.array(eidx[first])
        return pa.Table.from_arrays(
            [t.column("class_a").take(take), t.column("class_b").take(take),
             pa.array(vocab[aidx[first]], pa.string()),
             pa.array(path[first])],
            names=["class_a", "class_b", "lca_uri", "path_len"])

    return edges.map_batches(lca, batch_format="pyarrow")


def class_semantic_sim_sql() -> str:
    from ..docdict import sql_closure_cte

    return f"""
WITH {_cooc_cte()}, {sql_closure_cte()},
nodes AS (SELECT class_a AS u FROM cooc UNION SELECT class_b FROM cooc),
anc AS (SELECT class_uri, ancestor_uri, CAST(distance AS BIGINT) AS d
        FROM clo
        UNION ALL SELECT u, u, 0 FROM nodes),
cand AS (SELECT c.class_a, c.class_b, x.ancestor_uri AS anc,
                x.d + y.d AS path
         FROM cooc c
         JOIN anc x ON x.class_uri = c.class_a
         JOIN anc y ON y.class_uri = c.class_b
              AND y.ancestor_uri = x.ancestor_uri),
r AS (SELECT *, row_number() OVER (PARTITION BY class_a, class_b
                                   ORDER BY path, anc) AS rn FROM cand)
SELECT class_a, class_b, anc AS lca_uri, CAST(path AS BIGINT) AS path_len
FROM r WHERE rn = 1
"""


def ontology_coverage(sf_dir: str):
    """(ontology, n_classes, n_matched, n_unmatched, n_annotations) —
    the dictionary-coverage audit an annotation run reports: per
    source ontology, how many of its classes the corpus actually
    surfaced, and the total annotation volume.  Combiner pattern:
    per-batch class partial counts → ONE class-cardinality Sum; the
    dictionary side joins as a static class-dimension Dataset (it is
    metadata, not corpus), tagged union → ontology-cardinality Sum —
    nothing larger than the class dimension ever moves."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..docdict import tables

    tri = _direct_triples(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("obj").combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values").cast(pa.string()),
             pc.cast(vc.field("counts"), pa.int64())],
            names=["class_uri", "n"])

    matched = (tri.map_batches(partial, batch_format="pyarrow")
               .groupby("class_uri").aggregate(Sum("n", alias_name="n")))

    cls = tables()["classes"]
    uri_to_ont = dict(zip(cls.column("class_uri").to_pylist(),
                          cls.column("ontology").to_pylist()))

    def tag_matched(t: pa.Table) -> pa.Table:
        onts = [uri_to_ont[u] for u in t.column("class_uri").to_pylist()]
        z = np.zeros(len(t), np.int64)
        return pa.Table.from_arrays(
            [pa.array(onts, pa.string()), pa.array(z),
             pa.array(np.ones(len(t), np.int64)),
             t.column("n").cast(pa.int64())],
            names=["ontology", "n_classes", "n_matched", "n_annotations"])

    dict_side = rd.from_arrow(pa.Table.from_arrays(
        [cls.column("ontology").cast(pa.string()),
         pa.array(np.ones(len(cls), np.int64)),
         pa.array(np.zeros(len(cls), np.int64)),
         pa.array(np.zeros(len(cls), np.int64))],
        names=["ontology", "n_classes", "n_matched", "n_annotations"]))

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_unmatched", pc.subtract(t.column("n_classes"),
                                       t.column("n_matched")))

    return (matched.map_batches(tag_matched, batch_format="pyarrow")
            .union(dict_side)
            .groupby("ontology")
            .aggregate(Sum("n_classes", alias_name="n_classes"),
                       Sum("n_matched", alias_name="n_matched"),
                       Sum("n_annotations", alias_name="n_annotations"))
            .map_batches(finish, batch_format="pyarrow"))


def ontology_coverage_sql() -> str:
    from ..docdict import sql_classes_cte
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}), {sql_classes_cte()},
m AS (SELECT obj AS class_uri, count(*) AS n FROM tri
      WHERE pred = 'annotated_with' GROUP BY obj)
SELECT c.ontology,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(m.class_uri) AS BIGINT) AS n_matched,
       CAST(coalesce(sum(m.n), 0) AS BIGINT) AS n_annotations,
       CAST(count(*) - count(m.class_uri) AS BIGINT) AS n_unmatched
FROM cls c LEFT JOIN m ON m.class_uri = c.class_uri
GROUP BY c.ontology
"""


_PROX_WINDOW = 12  # max chars between spans (≈ two tokens)


def class_proximity(sf_dir: str, window: int = _PROX_WINDOW):
    """(class_a, class_b, n_pairs, min_gap) — relation-extraction
    CANDIDATE generation: pairs of different classes whose mention
    spans sit within ``window`` characters of each other in the same
    turn (gap = chars strictly between the spans; negative when they
    overlap/nest).  Proximity is the classic first filter before a
    relation classifier — co-occurrence (class_cooccurrence) says
    "same turn", this says "adjacent in the text".

    Scale shape: the flagship's conv-bucket exchange co-locates whole
    turns, then one numpy pass per bucket — lexsort by (turn, span),
    exact ``pairs_in_runs``, vectorized gap/window/class filters, and
    a per-bucket (class_a, class_b) partial aggregate — so the second
    exchange carries edge-cardinality partials, never span pairs.
    Span pairs within a turn are quadratic in the turn's annotation
    count, the same bound class_cooccurrence already accepts (turns
    are short by construction)."""
    from ray.data.aggregate import Min, Sum

    from ..stages.materialize import add_bucket_column
    from .pairs import pairs_in_runs

    tri = _direct_triples(sf_dir).map_batches(
        lambda b: add_bucket_column(
            b.select(["conv_id", "turn_idx", "obj", "from_1b", "to_1b"]),
            _COOC_BUCKETS),
        batch_format="pyarrow")

    def prox(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].str.slice(5).astype(np.int64)
        doc = (conv * _TURNS_PER_CONV
               + df["turn_idx"].astype(np.int64)).to_numpy()
        frm = df["from_1b"].to_numpy(np.int64)
        to = df["to_1b"].to_numpy(np.int64)
        obj = df["obj"].to_numpy()
        order = np.lexsort((obj, to, frm, doc))
        doc, frm, to, obj = doc[order], frm[order], to[order], obj[order]
        ia, ib = pairs_in_runs(doc, None)  # exact: oracle-matched
        gap = np.maximum(frm[ia], frm[ib]) - np.minimum(to[ia], to[ib]) - 1
        keep = (obj[ia] != obj[ib]) & (gap <= window)
        ia, ib, gap = ia[keep], ib[keep], gap[keep]
        a = np.minimum(obj[ia], obj[ib])
        b = np.maximum(obj[ia], obj[ib])
        part = pd.DataFrame({"class_a": a, "class_b": b, "gap": gap})
        g = part.groupby(["class_a", "class_b"], sort=False)["gap"]
        out = g.agg(["size", "min"]).reset_index()
        out.columns = ["class_a", "class_b", "n_pairs", "min_gap"]
        return out

    return (tri.groupby("bucket").map_groups(prox, batch_format="pandas")
            .groupby(["class_a", "class_b"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                       Min("min_gap", alias_name="min_gap")))


def class_proximity_sql(window: int = _PROX_WINDOW) -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
s AS (SELECT conv_id, turn_idx, obj, from_1b, to_1b FROM tri
      WHERE pred = 'annotated_with'),
p AS (SELECT CASE WHEN a.obj < b.obj THEN a.obj ELSE b.obj END AS class_a,
             CASE WHEN a.obj < b.obj THEN b.obj ELSE a.obj END AS class_b,
             greatest(a.from_1b, b.from_1b)
               - least(a.to_1b, b.to_1b) - 1 AS gap
      FROM s a JOIN s b USING (conv_id, turn_idx)
      WHERE (a.from_1b, a.to_1b, a.obj) < (b.from_1b, b.to_1b, b.obj)
        AND a.obj <> b.obj)
SELECT class_a, class_b, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(gap) AS BIGINT) AS min_gap
FROM p WHERE gap <= {window} GROUP BY class_a, class_b
"""


def annotation_density(sf_dir: str):
    """(doc_id, n_annotations, n_tokens, density_ppm) — per-document
    annotation QC: direct-annotation count per whitespace token in
    exact integer ppm (``10^6·n_ann // n_tok``), INCLUDING
    zero-annotation documents (the rows a KG-build QC pass actually
    hunts for — unannotatable inputs).  No join: the triple side emits
    (doc, n_ann, 0) partials, the corpus side emits (doc, 0, n_tok),
    and ONE doc-keyed Sum combines both — the union-combiner shape
    class_rollup uses, so nothing wider than (int64, int64, int64)
    ever shuffles."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    tri = _direct_triples(sf_dir)
    tpc = _TURNS_PER_CONV

    def tri_partial(t: pa.Table) -> pa.Table:
        conv = pc.utf8_slice_codeunits(
            t.column("conv_id").cast(pa.string()), 5, 2**31 - 1)
        doc = pc.add(
            pc.multiply(pc.cast(conv, pa.int64()),
                        pa.scalar(tpc, pa.int64())),
            t.column("turn_idx").cast(pa.int64()))
        vc = pc.value_counts(doc.combine_chunks())
        n = len(vc)
        return pa.Table.from_arrays(
            [vc.field("values").cast(pa.int64()),
             pc.cast(vc.field("counts"), pa.int64()),
             pa.array(np.zeros(n, np.int64))],
            names=["doc_id", "n_annotations", "n_tokens"])

    def doc_side(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.list_value_length(
            pc.split_pattern(t.column("text"), pattern=" ")), pa.int64())
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()),
             pa.array(np.zeros(len(t), np.int64)), n_tok],
            names=["doc_id", "n_annotations", "n_tokens"])

    docs = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(doc_side, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        ann = t.column("n_annotations").to_numpy(zero_copy_only=False)
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return t.append_column(
            "density_ppm", pa.array(1_000_000 * ann // tok))

    return (tri.map_batches(tri_partial, batch_format="pyarrow")
            .union(docs)
            .groupby("doc_id")
            .aggregate(Sum("n_annotations", alias_name="n_annotations"),
                       Sum("n_tokens", alias_name="n_tokens"))
            .map_batches(finish, batch_format="pyarrow"))


def annotation_density_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
a AS (SELECT CAST(substr(conv_id, 6) AS BIGINT) * {_TURNS_PER_CONV}
             + turn_idx AS doc_id,
             CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE pred = 'annotated_with' GROUP BY 1)
SELECT d.doc_id, COALESCE(a.n, 0) AS n_annotations,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       1000000 * COALESCE(a.n, 0)
         // CAST(len(string_split(d.text, ' ')) AS BIGINT) AS density_ppm
FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
"""


def register(q: dict, o: dict | None = None) -> None:
    q["class_semantic_sim"] = class_semantic_sim
    q["ontology_coverage"] = ontology_coverage
    q["class_proximity"] = class_proximity
    q["annotation_density"] = annotation_density
    if o is not None:
        o["class_proximity"] = class_proximity_sql()
        o["annotation_density"] = annotation_density_sql()
    if o is not None:
        o["ontology_coverage"] = ontology_coverage_sql()
    if o is not None:
        o["class_semantic_sim"] = class_semantic_sim_sql()
    q["class_pagerank"] = class_pagerank
    q["class_triangles"] = class_triangles
    q["class_cooccurrence"] = class_cooccurrence
    q["class_degree"] = class_degree
    q["degree_histogram"] = degree_histogram
    q["class_hits"] = class_hits
    q["class_assortativity"] = class_assortativity
    q["cooccur_components"] = cooccur_components
    q["class_bfs"] = class_bfs
    q["class_jaccard"] = class_jaccard
    q["class_clustering"] = class_clustering
    q["conv_dominant_class"] = conv_dominant_class
    q["class_by_lang"] = class_by_lang
    q["class_rollup"] = class_rollup
    q["class_lift"] = class_lift
    q["disambiguate_spans"] = disambiguate_spans
    q["entity_components"] = entity_components
    q["entity_timeline"] = entity_timeline
    if o is not None:
        o["class_pagerank"] = class_pagerank_sql()
        o["class_triangles"] = class_triangles_sql()
        o["class_cooccurrence"] = class_cooccurrence_sql()
        o["class_degree"] = class_degree_sql()
        o["degree_histogram"] = degree_histogram_sql()
        o["class_hits"] = class_hits_sql()
        o["class_assortativity"] = class_assortativity_sql()
        o["cooccur_components"] = cooccur_components_sql()
        o["class_bfs"] = class_bfs_sql()
        o["class_jaccard"] = class_jaccard_sql()
        o["class_clustering"] = class_clustering_sql()
        o["conv_dominant_class"] = conv_dominant_class_sql()
        o["class_by_lang"] = class_by_lang_sql()
        o["class_rollup"] = class_rollup_sql()
        o["class_lift"] = class_lift_sql()
        o["disambiguate_spans"] = disambiguate_spans_sql()
        o["entity_components"] = entity_components_sql()
        o["entity_timeline"] = entity_timeline_sql()
