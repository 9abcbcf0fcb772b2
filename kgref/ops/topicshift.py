"""Conversation segmentation by lexical topic shift — adjacent-turn
token-set Jaccard (the TextTiling idea reduced to its scalable core:
Hearst 1997 measures lexical cohesion between adjacent blocks and cuts
where it dips).  A training-data builder uses the cut points to split
long multi-topic conversations into coherent training windows instead
of packing unrelated topics into one context.

Output: one row per turn that HAS a predecessor (same conv,
turn_idx-1): the Jaccard similarity of the two turns' distinct token
sets in exact 4-decimal fixed point, and the boundary flag
``is_shift = jac4 < SHIFT_JAC4``.

Scale shape: conv-bucket partition (whole conversations per bucket —
kgref/stages/materialize.py), then ONE vectorized pass per bucket:
distinct (turn, token) pairs via a C-level drop_duplicates, the
adjacent-turn intersection via a single hash merge on (token,
turn_idx+1) — set algebra as joins, never Python sets per row.  The
exchange carries only (conv_id, turn_idx, text); everything else is
bucket-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dialogue import _conv_bucketed, _conv_view_sql

SHIFT_JAC4 = 3000  # jaccard < 0.30 → topic boundary (≈p05 of the
# driver corpus's adjacent-turn similarity, so the gate exercises both
# flag branches with a realistic boundary rate)


def shift_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Adjacent-turn Jaccard for one bucket.  Distinct token sets and
    their pairwise intersections are computed relationally (dedup +
    merge), so the kernel is all C: no per-row tokenization loop."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df = df.reset_index(drop=True)
    toks = df["text"].str.split(" ")
    counts = toks.str.len().to_numpy(np.int64)
    row = np.repeat(np.arange(len(df), dtype=np.int64), counts)
    flat = pd.DataFrame({"r": row,
                         "w": np.concatenate(toks.to_numpy())
                         if len(df) else np.array([], object)})
    flat = flat.drop_duplicates()  # distinct (turn, token)
    n = np.zeros(len(df), np.int64)
    cnt = flat.groupby("r", sort=False).size()
    n[cnt.index.to_numpy()] = cnt.to_numpy()
    # adjacency mask: row i pairs with i-1 when same conv, turn-1
    conv = df["conv_id"].to_numpy()
    ti = df["turn_idx"].to_numpy(np.int64)
    has_prev = np.r_[False, (conv[1:] == conv[:-1]) & (ti[1:] == ti[:-1] + 1)]
    # intersection: token present in row r AND row r+1 → one hash merge
    nxt = flat.copy()
    nxt["r"] = nxt["r"] - 1
    inter = flat.merge(nxt, on=["r", "w"], how="inner")
    ic = np.zeros(len(df) + 1, np.int64)
    icnt = inter.groupby("r", sort=False).size()
    ic[icnt.index.to_numpy() + 1] = icnt.to_numpy()  # credit the LATER turn
    i = np.flatnonzero(has_prev)
    inter_i = ic[i]
    union_i = n[i] + n[i - 1] - inter_i
    jac4 = np.where(union_i == 0, 10000,
                    (10000 * inter_i) // np.maximum(union_i, 1))
    return pd.DataFrame({
        "conv_id": conv[i],
        "turn_idx": ti[i].astype(np.int32),
        "jac4": jac4.astype(np.int64),
        "is_shift": jac4 < SHIFT_JAC4,
    })


def turn_topic_shift(sf_dir: str):
    return _conv_bucketed(sf_dir).map_groups(
        lambda df: shift_kernel(df.drop(columns=["bucket"])),
        batch_format="pandas")


def turn_topic_shift_sql() -> str:
    return f"""
WITH t AS ({_conv_view_sql()}),
tok AS (SELECT DISTINCT conv_id, turn_idx, unnest(string_split(text, ' ')) AS w
        FROM t),
n AS (SELECT conv_id, turn_idx, count(*) AS n FROM tok GROUP BY 1, 2),
inter AS (SELECT a.conv_id, b.turn_idx, count(*) AS i
          FROM tok a JOIN tok b
            ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
           AND b.w = a.w
          GROUP BY 1, 2),
j AS (SELECT cur.conv_id, cur.turn_idx,
             CASE WHEN prev.n + cur.n - COALESCE(i.i, 0) = 0 THEN 10000
                  ELSE (10000 * COALESCE(i.i, 0))
                       // (prev.n + cur.n - COALESCE(i.i, 0)) END AS jac4
      FROM n cur
      JOIN n prev ON prev.conv_id = cur.conv_id
                 AND prev.turn_idx = cur.turn_idx - 1
      LEFT JOIN inter i ON i.conv_id = cur.conv_id
                       AND i.turn_idx = cur.turn_idx)
SELECT conv_id, turn_idx, CAST(jac4 AS BIGINT) AS jac4,
       jac4 < {SHIFT_JAC4} AS is_shift
FROM j
"""


def register(q: dict, o: dict | None = None) -> None:
    q["turn_topic_shift"] = turn_topic_shift
    if o is not None:
        o["turn_topic_shift"] = turn_topic_shift_sql()
