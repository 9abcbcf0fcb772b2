"""Driver-contract invariants: the gate window (first 50 registry
entries) must be fully oracle-backed, the registry must be
duplicate-free, and no oracle may be orphaned.  Pure registry checks —
no Ray session needed."""

# queries that are rows-only BY CONSTRUCTION (probabilistic sketches
# gated by pytest recall floors ≥ 0.9 vs their exact siblings;
# iterative BPE gated by a bit-exact reference-implementation test)
ROWS_ONLY_BY_DESIGN = {"ann_topk_lsh", "ann_topk_ivf",
                       "dedup_minhash_lsh", "dedup_simhash",
                       "bpe_train", "bpe_encode"}


def test_registry_is_duplicate_free_and_total():
    from kgref.queries import _GATE_PRIORITY, oracle_sql, queries

    names = list(queries().keys())
    assert len(names) == len(set(names))
    # every priority entry resolves to a real query (no dead names)
    dead = [n for n in _GATE_PRIORITY if n not in set(names)]
    assert not dead, f"_GATE_PRIORITY names without a query: {dead}"
    # no orphan oracles
    orphans = [n for n in oracle_sql() if n not in set(names)]
    assert not orphans, f"oracles without a query: {orphans}"


def test_gate_window_is_oracle_backed():
    from kgref.queries import oracle_sql, queries

    names = list(queries().keys())
    o = oracle_sql()
    missing = [n for n in names[:50]
               if n not in o and n not in ROWS_ONLY_BY_DESIGN]
    assert not missing, (
        f"in-window queries without a DuckDB oracle: {missing}")


def test_every_query_is_gate_ordered():
    """The explicit priority list covers the whole registry, so window
    membership is always a deliberate choice, never insertion-order
    accident."""
    from kgref.queries import _GATE_PRIORITY, queries

    unlisted = [n for n in queries() if n not in set(_GATE_PRIORITY)]
    assert not unlisted, f"queries not in _GATE_PRIORITY: {unlisted}"
