"""k-core decomposition of the class co-occurrence graph — the
iterative-PEEL pattern, distinct from both label propagation
(ops/clusters) and the fixed-iteration pagerank shape (ops/kgraph):
repeatedly delete every node whose degree in the SURVIVING subgraph is
below k, until no deletion happens.  The k-core is the standard
density filter a KG build runs before community detection or embedding
training (peripheral one-off co-occurrences peel away; the cohesive
concept cluster remains).

Scale shape: the int edge list comes from the distributed prologue
(kgraph._edge_ids — edges stay a Dataset, materialized once as the
static side).  Per round, ONE pass over the edges (filtering both
endpoints against the broadcast alive bitmap) feeds a node-keyed Count;
only the node-DIMENSION-sized degree table ever lands on the driver —
the same documented broadcast budget as pagerank's out-weight side.
Convergence is a scalar compare of alive counts.

Exactness: peeling is order-free (each round removes ALL sub-k nodes
simultaneously), so the fixpoint is unique and the DuckDB twin —
``SQL_ROUNDS`` unrolled survive→degree CTE rounds — matches exactly
provided the peel converges within the unroll budget; the Ray side
raises past that bound rather than silently diverging from its oracle
(a path graph peels O(n) rounds, but co-occurrence graphs peel in a
handful — the gate fixtures converge in ≤ 3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KCORE_K = 3
SQL_ROUNDS = 12


def class_kcore(sf_dir: str, k: int = KCORE_K):
    """Gate query: (class_uri, kcore_degree) — the nodes of the k-core
    of the co-occurrence graph with their within-core degree."""
    import ray
    from ray.data.aggregate import Count

    from .kgraph import _edge_ids, _empty

    uri_ref, n, eds = _edge_ids(sf_dir)
    if n == 0:
        return _empty(["class_uri", "kcore_degree"],
                      [pa.string(), pa.int64()])

    alive = np.ones(n, dtype=bool)
    deg = np.zeros(n, np.int64)
    for rnd in range(SQL_ROUNDS + 1):
        alive_ref = ray.put(alive)

        def sym_alive(t: pa.Table) -> pa.Table:
            live = ray.get(alive_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            m = live[a] & live[b]
            return pa.Table.from_arrays(
                [pa.array(np.concatenate([a[m], b[m]]))], names=["src"])

        df = (eds.map_batches(sym_alive, batch_format="pyarrow")
              .groupby("src").aggregate(Count(alias_name="d"))
              .to_pandas())  # node-dimension-sized: documented small side
        deg = np.zeros(n, np.int64)
        if len(df):
            deg[df["src"].to_numpy(np.int64)] = df["d"].to_numpy(np.int64)
        new_alive = alive & (deg >= k)
        if int(new_alive.sum()) == int(alive.sum()):
            break
        alive = new_alive
    else:
        raise RuntimeError(
            f"k-core peel did not converge within SQL_ROUNDS={SQL_ROUNDS}"
            " — raise the unroll budget in kcore.py (Ray and SQL twin"
            " must share it)")

    keep = np.flatnonzero(alive)
    uris = ray.get(uri_ref)
    import ray.data as rd
    out = pa.Table.from_arrays(
        [uris.take(pa.array(keep.astype(np.int32))),
         pa.array(deg[keep])],
        names=["class_uri", "kcore_degree"])
    return rd.from_arrow(out)  # core is node-dimension-sized


def class_kcore_sql(k: int = KCORE_K) -> str:
    from .kgraph import _cooc_cte

    # each round references the previous edge set three times, so every
    # per-round CTE is MATERIALIZED — without it DuckDB inlines the
    # chain and the plan explodes 3^SQL_ROUNDS-fold
    parts = [f"WITH {_cooc_cte()},",
             "e0 AS MATERIALIZED ("
             "SELECT class_a AS a, class_b AS b FROM cooc)"]
    for r in range(SQL_ROUNDS):
        parts.append(f""",
s{r} AS MATERIALIZED (
  SELECT u FROM (SELECT a AS u FROM e{r} UNION ALL SELECT b FROM e{r})
  GROUP BY u HAVING count(*) >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r} e
  JOIN s{r} x ON e.a = x.u JOIN s{r} y ON e.b = y.u)""")
    parts.append(f"""
SELECT u AS class_uri, d AS kcore_degree
FROM (SELECT u, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS u FROM e{SQL_ROUNDS}
            UNION ALL SELECT b FROM e{SQL_ROUNDS})
      GROUP BY u)
WHERE d >= {k}""")
    return "".join(parts)


def register(q: dict, o: dict | None = None) -> None:
    q["class_kcore"] = class_kcore
    if o is not None:
        o["class_kcore"] = class_kcore_sql()
