"""Event-stream operators over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

The reference has no streaming features (SURVEY.md §2.9) — these are
part of the beyond-the-reference training-data toolkit.  Both are batch
re-expressions of streaming windows: event time lives in the data, so a
tumbling window is a groupby on ``truncate(ts)`` and a session is a
run-length encoding over per-user time-sorted events.  Partitioning
follows the same coarse-partition rule as the dedup ops: the shuffle key
is ``user_id % n_parts`` with the count derived from input size
(kgref.ops.pairs.n_parts_for), and each partition is aggregated with ONE
vectorized pandas pass — never one Python call per user or per window
([[kgref.ops.pairs]] rationale).

At 10^12 events the same shape holds: sessionization needs all events
of one user co-located and time-sorted, which the coarse partition
provides; windows are pre-aggregated per batch before the exchange if
the per-window row count is large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_S = 1800  # 30 min


def _with_part(batch: pa.Table, n_parts: int) -> pa.Table:
    """user_id % n_parts (numpy modulo: n_parts_for returns powers of
    two, but forced counts in tests may not be)."""
    part = pa.array(
        (batch.column("user_id").to_numpy() % n_parts).astype(np.int32))
    return batch.append_column("part", part)


def windowed_agg(sf_dir: str, n_parts: int | None = None):
    """Tumbling 1-hour window per user: event count + value sum.
    ≙ ``GROUP BY user_id, date_trunc('hour', ts)``.

    ``sum_value`` is defined as the FIXED-POINT sum: each value rounded
    half-up to 4 decimals as an int64, summed exactly, scaled back.
    Integer summation is order-independent, so the result cannot flip at
    a rounding boundary when pandas/Ray/DuckDB accumulate floats in
    different orders (the float-sum-then-round formulation can)."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["user_id", "ts", "value"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["part"])
        df["window_start"] = df["ts"].dt.floor("h")
        df["v4"] = np.floor(df["value"] * 10000 + 0.5).astype(np.int64)
        g = (df.groupby(["user_id", "window_start"], sort=False)
             .agg(n_events=("v4", "size"), sum_v4=("v4", "sum"))
             .reset_index())
        g["sum_value"] = g["sum_v4"] / 10000.0
        return g[["user_id", "window_start", "n_events", "sum_value"]]

    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(agg, batch_format="pandas"))


def windowed_agg_sql() -> str:
    return ("SELECT user_id, date_trunc('hour', ts) AS window_start,"
            " count(*) AS n_events,"
            " sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) / 10000.0"
            " AS sum_value"
            " FROM events GROUP BY user_id, date_trunc('hour', ts)")


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S,
               n_parts: int | None = None):
    """Gap-based sessions: a new session starts when a user is idle
    > gap_s.  session_id is the 1-based per-user session ordinal under
    (ts, event_id) ordering — deterministic on ties."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["part"])
              .sort_values(["user_id", "ts", "event_id"]))
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff().dt.total_seconds() > gap_s
        session_break = new_user | gap
        sid_global = session_break.cumsum()
        # per-user 1-based ordinal
        first_of_user = sid_global.where(new_user).ffill()
        df["session_id"] = (sid_global - first_of_user + 1).astype(np.int64)
        g = (df.groupby(["user_id", "session_id"], sort=False)
             .agg(n_events=("event_id", "size"), start_ts=("ts", "min"),
                  end_ts=("ts", "max"))
             .reset_index())
        return g[["user_id", "session_id", "n_events", "start_ts", "end_ts"]]

    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(sessions, batch_format="pandas"))


def sessionize_sql(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, event_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY user_id, session_id
"""


def window_funcs(sf_dir: str, n_parts: int | None = None):
    """Per-event window functions — row_number / lag / gap within each
    user's time-ordered stream (the LAG/RANK family Ray Data lacks as a
    native op).  Same coarse user-partition + ONE vectorized pass shape
    as sessionize: rank via run-boundary cumsum, lag via shift masked at
    user boundaries.  Gaps are exact integer MICROseconds (int64 diff of
    the µs timestamp), not float seconds, so the oracle compare can't
    flip on float formatting.  First event of a user: gap_us=0,
    prev_event_id=-1 (sentinels, not NULLs — keeps the value-hash
    null-convention-free)."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id"])

    def wf(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["part"])
              .sort_values(["user_id", "ts", "event_id"]))
        new_user = df["user_id"].ne(df["user_id"].shift()).to_numpy()
        idx = np.arange(len(df), dtype=np.int64)
        first_of_user = np.maximum.accumulate(np.where(new_user, idx, 0))
        df["rnk"] = idx - first_of_user + 1
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.diff(ts_us, prepend=ts_us[0] if len(ts_us) else 0)
        df["gap_us"] = np.where(new_user, 0, gap)
        prev = df["event_id"].shift(fill_value=-1).to_numpy()
        df["prev_event_id"] = np.where(new_user, -1, prev)
        return df[["event_id", "user_id", "ts", "rnk", "gap_us",
                   "prev_event_id"]]

    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(wf, batch_format="pandas"))


def window_funcs_sql() -> str:
    return """
SELECT event_id, user_id, ts,
       CAST(row_number() OVER w AS BIGINT) AS rnk,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS gap_us,
       coalesce(lag(event_id) OVER w, -1) AS prev_event_id
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


TOPN_PER_USER = 3


def topn_per_user(sf_dir: str, n: int = TOPN_PER_USER,
                  n_parts: int | None = None):
    """Top-N rows PER GROUP (here: each user's N highest-value events)
    — the ``row_number() OVER (...) <= N`` idiom Ray Data has no native
    operator for.  Same coarse user-partition as the other event ops,
    then ONE vectorized pass per partition: lexsort by (user, -value,
    event_id) and keep rows whose within-run ordinal < N via the
    run-boundary cumsum trick — no per-user Python, no full sort of the
    table (only within the ~(rows/n_parts)-sized partition).

    Value ties break on event_id ascending so the result is
    deterministic and matches the SQL window ORDER BY exactly."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["user_id", "event_id", "value"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["part"])
              .sort_values(["user_id", "value", "event_id"],
                           ascending=[True, False, True]))
        new_user = df["user_id"].ne(df["user_id"].shift()).to_numpy()
        idx = np.arange(len(df), dtype=np.int64)
        ordinal = idx - np.maximum.accumulate(np.where(new_user, idx, 0))
        df["rnk"] = ordinal + 1
        return df.loc[ordinal < n,
                      ["user_id", "event_id", "value", "rnk"]]

    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(topn, batch_format="pandas"))


def topn_per_user_sql(n: int = TOPN_PER_USER) -> str:
    return f"""
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, event_id) AS BIGINT)
           AS rnk
  FROM events)
WHERE rnk <= {n}
"""


ROLLING_WINDOW_US = 3_600 * 1_000_000  # 1 hour


def rolling_window(sf_dir: str, window_us: int = ROLLING_WINDOW_US,
                   n_parts: int | None = None):
    """Sliding RANGE-window aggregate: per event, the count and exact
    fixed-point value sum of the same user's events in the preceding
    hour (inclusive) — SQL's ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    AND CURRENT ROW``, including the peers-at-equal-ts contract.

    Vectorized without a per-user loop: after the (user, ts) sort,
    timestamps are embedded on a single axis t' = (ts - min) +
    user_ordinal · OFFSET with OFFSET > span + window, which makes t'
    globally sorted and keeps every window inside its user's segment —
    so ONE ``np.searchsorted`` pair gives all window bounds, and the
    sums are two prefix-sum gathers.  O(p log p) per partition."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(
        path, columns=["event_id", "user_id", "ts", "value"])
    roll = functools.partial(_roll_pandas, window_us=window_us)
    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(roll, batch_format="pandas"))


def _roll_pandas(df: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """One partition's RANGE-window pass (pure pandas/numpy; also the
    unit under the hypothesis property test)."""
    if "part" in df.columns:
        df = df.drop(columns=["part"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    n = len(df)
    W = np.int64(window_us)
    if n == 0:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "n_1h": pd.Series([], dtype=np.int64),
            "sum_v4_1h": pd.Series([], dtype=np.int64)})
    uid = df["user_id"].to_numpy()
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    code = np.cumsum(new_user) - 1
    span = ts_us.max() - ts_us.min()
    offset = span + W + 2
    tp = (ts_us - ts_us.min()) + code * offset
    lo = np.searchsorted(tp, tp - W, side="left")
    hi = np.searchsorted(tp, tp, side="right") - 1
    v4 = np.floor(df["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    pref = np.concatenate([[0], np.cumsum(v4)])
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(), "user_id": uid,
        "ts": df["ts"].to_numpy(),
        "n_1h": hi - lo + 1,
        "sum_v4_1h": pref[hi + 1] - pref[lo]})


def rolling_window_sql() -> str:
    return """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS sum_v4_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_pivot(sf_dir: str):
    """PIVOT / conditional aggregation: one wide row per user with an
    event count per type — ``count(*) FILTER (WHERE type = t)``.

    The type domain is declared (PIVOT needs a static column set), so
    the combiner shape is ideal: each batch reduces to ≤ one wide row
    per user present (bincount over a (user, type) code grid), then a
    users-sized Sum groupby — the exchange never carries event rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cols = [f"n_{t}" for t in PIVOT_TYPES]

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        tcode = pc.index_in(
            batch.column("event_type"),
            value_set=pa.array(PIVOT_TYPES)).to_numpy(zero_copy_only=False)
        # index_in yields null (NaN after to_numpy) for types outside
        # the declared PIVOT domain; the SQL FILTER counts them as 0
        # but its GROUP BY still emits the user row, so keep every user
        # and only mask the increments (ADVICE r3: NaN→int64 would
        # corrupt the grid index).
        known = ~np.isnan(tcode.astype(np.float64))
        users, ucode = np.unique(uid, return_inverse=True)
        grid = np.zeros((len(users), len(PIVOT_TYPES)), dtype=np.int64)
        np.add.at(grid, (ucode[known], tcode[known].astype(np.int64)), 1)
        return pa.Table.from_arrays(
            [pa.array(users)] + [pa.array(grid[:, i])
                                 for i in range(len(PIVOT_TYPES))],
            names=["user_id"] + cols)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def user_type_pivot_sql() -> str:
    counts = ", ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}" for t in PIVOT_TYPES)
    return f"SELECT user_id, {counts} FROM events GROUP BY user_id"


ASOF_RIGHT_TYPE = "purchase"


def asof_join(sf_dir: str, right_type: str = ASOF_RIGHT_TYPE,
              n_parts: int | None = None):
    """AS-OF join — each event joined to the most recent prior-or-equal
    event of ``right_type`` by the same user (the time-series join Ray
    Data has no native operator for; cf. pandas merge_asof / DuckDB
    ASOF JOIN).

    Shape: both sides share the user key, so ONE coarse user-partition
    co-locates them and the join is a single vectorized merge pass per
    partition — no per-user Python, no second shuffle.  Tie semantics
    are made deterministic by deduping the right side to the max
    event_id per (user, ts) BEFORE matching (mirrors the oracle's
    row_number() DESC filter); matching is group-level (all events at
    one (user, ts) see the same winner, including right-typed rows
    matching themselves).

    Output sentinels for "no prior purchase": prev_purchase_id = -1,
    prev_purchase_v4 = -1 (value in half-up 4-decimal fixed point),
    since_us = -1 — sentinels, not NULLs, keeping the value-hash
    null-convention-free.  At 10^12 events the partition count scales
    with input bytes (n_parts_for) and each partition costs one
    O(p log p) lexsort."""
    import functools

    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(
        path, columns=["event_id", "user_id", "ts", "event_type", "value"])
    asof = functools.partial(_asof_pandas, right_type=right_type)
    return (ds.map_batches(functools.partial(_with_part, n_parts=np_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(asof, batch_format="pandas"))


def _asof_pandas(df: pd.DataFrame, right_type: str) -> pd.DataFrame:
    """One partition's as-of pass (pure pandas/numpy; also the unit
    under the hypothesis property test)."""
    if "part" in df.columns:
        df = df.drop(columns=["part"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    n = len(df)
    if n == 0:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "event_type": pd.Series([], dtype=object),
            "prev_purchase_id": pd.Series([], dtype=np.int64),
            "prev_purchase_v4": pd.Series([], dtype=np.int64),
            "since_us": pd.Series([], dtype=np.int64)})
    idx = np.arange(n, dtype=np.int64)
    uid = df["user_id"].to_numpy()
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    new_grp = new_user.copy()
    new_grp[1:] |= ts_us[1:] != ts_us[:-1]
    g = np.cumsum(new_grp) - 1          # 0-based (user, ts) group id
    n_groups = int(g[-1]) + 1
    # winner per group: max-event_id right-typed row (rows are
    # event_id-sorted within a group, so max row index = max id)
    is_r = (df["event_type"] == right_type).to_numpy()
    winner = np.full(n_groups, -1, dtype=np.int64)
    np.maximum.at(winner, g[is_r], idx[is_r])
    # inclusive group-level carry, reset at user boundaries: the
    # global running max of winner row indices belongs to the
    # current user iff it is >= the user's first row index
    # (rows of one user are contiguous after the sort)
    first_row_of_user = np.maximum.accumulate(
        np.where(new_user, idx, 0))
    grp_first_rows = idx[new_grp]
    fu_g = first_row_of_user[grp_first_rows]
    gacc = np.maximum.accumulate(winner)
    gmatch = np.where(gacc >= fu_g, gacc, -1)
    rowmatch = gmatch[g]
    m = rowmatch >= 0
    safe = np.where(m, rowmatch, 0)
    eid = df["event_id"].to_numpy()
    v4 = np.floor(df["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    return pd.DataFrame({
        "event_id": eid, "user_id": uid, "ts": df["ts"].to_numpy(),
        "event_type": df["event_type"].to_numpy(),
        "prev_purchase_id": np.where(m, eid[safe], -1),
        "prev_purchase_v4": np.where(m, v4[safe], -1),
        "since_us": np.where(m, ts_us - ts_us[safe], -1)})


def asof_join_sql(right_type: str = ASOF_RIGHT_TYPE) -> str:
    return f"""
WITH r AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = '{right_type}')
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       coalesce(r.event_id, -1) AS prev_purchase_id,
       coalesce(CAST(floor(r.value * 10000 + 0.5) AS BIGINT), -1)
         AS prev_purchase_v4,
       coalesce(epoch_us(e.ts) - epoch_us(r.ts), -1) AS since_us
FROM events e ASOF LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
  ON e.user_id = r.user_id AND e.ts >= r.ts
"""


def latest_per_key(sf_dir: str, n_parts: int | None = None):
    """(user_id, event_type, event_id, ts_us, value) — CDC/upsert
    compaction: the LATEST event per (user, type) key, ordered by
    (ts, event_id) so ties are deterministic.  The "keep the newest
    version of each row" step every changelog→snapshot pipeline runs.

    Scale shape: a per-batch keep-latest partial FIRST (one vectorized
    sort + drop_duplicates per batch shrinks the exchange from
    event-count to keys-per-batch), then the module's standard coarse
    user-partition exchange finishes exactly — keys never split across
    partitions, so group-local keep-first is globally correct.
    Timestamps travel as exact int64 µs (the module convention)."""
    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/events.parquet"
    np_parts = n_parts or n_parts_for(path)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "event_type": t.column("event_type").to_pandas(),
            "event_id": t.column("event_id").to_numpy(),
            "ts_us": t.column("ts").cast(pa.int64()).to_numpy(),
            "value": t.column("value").to_numpy(),
        })
        df = (df.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                             ascending=[True, True, False, False],
                             kind="mergesort")
              .drop_duplicates(["user_id", "event_type"]))
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = (rd.read_parquet(path, columns=cols)
          .map_batches(partial, batch_format="pyarrow")
          .map_batches(lambda b: _with_part(b, np_parts),
                       batch_format="pyarrow"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                             ascending=[True, True, False, False],
                             kind="mergesort")
              .drop_duplicates(["user_id", "event_type"]))
        return df[["user_id", "event_type", "event_id", "ts_us", "value"]]

    return ds.groupby("part").map_groups(finish, batch_format="pandas")


def latest_per_key_sql() -> str:
    return """
WITH r AS (SELECT user_id, event_type, event_id,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT user_id, event_type, event_id, ts_us, value FROM r WHERE rn = 1
"""


def register(q: dict, o: dict | None = None) -> None:
    q["events_latest_per_key"] = latest_per_key
    if o is not None:
        o["events_latest_per_key"] = latest_per_key_sql()
    q["events_windowed"] = windowed_agg
    q["events_sessions"] = sessionize
    q["events_window_funcs"] = window_funcs
    q["events_topn_per_user"] = topn_per_user
    q["events_asof_join"] = asof_join
    q["events_rolling_1h"] = rolling_window
    q["events_user_pivot"] = user_type_pivot
    if o is not None:
        o["events_windowed"] = windowed_agg_sql()
        o["events_sessions"] = sessionize_sql()
        o["events_window_funcs"] = window_funcs_sql()
        o["events_topn_per_user"] = topn_per_user_sql()
        o["events_asof_join"] = asof_join_sql()
        o["events_rolling_1h"] = rolling_window_sql()
        o["events_user_pivot"] = user_type_pivot_sql()
