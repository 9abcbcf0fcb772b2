"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Implementations live in ``kgref.queries``;
nothing here (or below it) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents viewed as
    transcripts → actor-pool annotate (direct + 2-level hierarchy +
    mappings) → groupby(conv_id) stable-order/dedup — returns the
    per-conversation triple edge table as a Ray Dataset."""
    from kgref.queries import _conv_subgraph

    return _conv_subgraph("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kgref.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from kgref.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
