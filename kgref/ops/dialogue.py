"""Dialogue-structure operators over the transcripts view — the
SFT-data half of a training pipeline (the annotator extracts triples
FROM conversations; these extract training EXAMPLES from the same
table): prompt/response pair extraction and context-window assembly.

Both ride the repo's conv-bucket shape (crc32(conv_id) % B buckets, a
bucket holds whole conversations, ONE vectorized pandas/numpy pass per
bucket — kgref/stages/materialize.py) so per-conversation adjacency
never crosses a partition and no per-conversation Python runs.

Role convention: the driver's ``documents`` table carries no role
column, so the gate queries derive one deterministically from the turn
index — ``role = (user, assistant, tool)[turn_idx % 3]`` — the exact
convention the fixture transcripts use (kgref/fixtures.py _ROLES), and
the SQL oracles repeat the same expression.  On a real transcript table
(input_hint: role:string) the kernels take the column as-is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import docdict

_BUCKETS = 32

# context_budget: max characters of immediately-preceding whole turns
# packed into a turn's context window (≈3 average turns of the driver
# corpus — small enough that long turns overflow it, large enough that
# most windows are non-empty, so the gate sees every branch).
CTX_BUDGET = 900


def _conv_bucketed(sf_dir: str):
    from ..sources.transcripts import documents_as_transcripts
    from ..stages.materialize import add_bucket_column

    ds = documents_as_transcripts(sf_dir,
                                  turns_per_conv=docdict.TURNS_PER_CONV)
    return ds.map_batches(
        lambda b: add_bucket_column(b, _BUCKETS),
        batch_format="pyarrow").groupby("bucket")


def _conv_view_sql() -> str:
    tpc = docdict.TURNS_PER_CONV
    return (f"SELECT 'conv-' || CAST(doc_id // {tpc} AS VARCHAR) AS conv_id,"
            f" CAST(doc_id % {tpc} AS INTEGER) AS turn_idx, text"
            f" FROM documents")


# ---------------------------------------------------------------------------
# sft_pairs — (prompt, response) training-pair extraction


def pairs_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """One sorted numpy pass: user turns whose immediate successor
    (same conv, turn_idx+1) is an assistant turn; everything else —
    conversation boundaries, missing successors, tool turns — drops
    out, exactly like the oracle's inner join."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = df["conv_id"].to_numpy()
    ti = df["turn_idx"].to_numpy(np.int64)
    txt = df["text"].to_numpy()
    role = ti % 3  # 0=user, 1=assistant, 2=tool (fixtures convention)
    nxt = (conv[1:] == conv[:-1]) & (ti[1:] == ti[:-1] + 1)
    i = np.flatnonzero((role[:-1] == 0) & (role[1:] == 1) & nxt)
    return pd.DataFrame({
        "conv_id": conv[i],
        "turn_idx": ti[i].astype(np.int32),
        "prompt": txt[i],
        "response": txt[i + 1],
    })


def sft_pairs(sf_dir: str):
    """(conv_id, turn_idx, prompt, response): every user turn paired
    with the immediately-following assistant turn of the same
    conversation — the canonical SFT example miner."""
    return _conv_bucketed(sf_dir).map_groups(
        lambda df: pairs_kernel(df.drop(columns=["bucket"])),
        batch_format="pandas")


def sft_pairs_sql() -> str:
    return f"""
WITH t AS ({_conv_view_sql()})
SELECT a.conv_id, a.turn_idx, a.text AS prompt, b.text AS response
FROM t a JOIN t b ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
WHERE a.turn_idx % 3 = 0 AND b.turn_idx % 3 = 1
"""


# ---------------------------------------------------------------------------
# context_budget — context-window assembly under a character budget


def windows_kernel(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """ONE global searchsorted per bucket: within-conv prefix sums Q
    (strictly increasing — texts are non-empty), lifted to a globally
    monotone key ``conv_ordinal·BIG + Q`` so a single binary search
    finds every turn's window start; no per-conversation Python.  The
    window is the maximal SUFFIX of prior turns with total length ≤
    budget (whole turns only — the truncation rule a context packer
    actually uses)."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = df["conv_id"].to_numpy()
    ti = df["turn_idx"].to_numpy(np.int64)
    lens = df["text"].str.len().to_numpy(np.int64)
    gidx = pd.factorize(conv)[0].astype(np.int64)  # conv ordinal
    # Q[i] = total chars of turns BEFORE i within its conv
    cs = np.cumsum(lens)
    start = np.r_[True, gidx[1:] != gidx[:-1]]
    conv_base = np.maximum.accumulate(
        np.where(start, cs - lens, np.int64(0)))
    Q = cs - lens - conv_base
    big = int(Q.max(initial=0)) + budget + 2
    key = gidx * big + Q
    probe = gidx * big + np.maximum(Q - budget, 0)
    jmin = np.searchsorted(key, probe, side="left")
    idx = np.arange(len(Q), dtype=np.int64)
    return pd.DataFrame({
        "conv_id": conv,
        "turn_idx": ti.astype(np.int32),
        "n_ctx": (idx - jmin).astype(np.int32),
        "ctx_chars": Q - Q[jmin],
    })


def context_budget(sf_dir: str):
    """(conv_id, turn_idx, n_ctx, ctx_chars): how many whole
    immediately-preceding turns of the same conversation fit in
    CTX_BUDGET characters, and their total size — the context-assembly
    plan a training-data builder materializes before packing windows."""
    return _conv_bucketed(sf_dir).map_groups(
        lambda df: windows_kernel(df.drop(columns=["bucket"]), CTX_BUDGET),
        batch_format="pandas")


def context_budget_sql() -> str:
    return f"""
WITH t AS ({_conv_view_sql()}),
q AS (SELECT conv_id, turn_idx,
             COALESCE(SUM(length(text)) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS q
      FROM t)
SELECT a.conv_id, a.turn_idx,
       CAST(count(b.turn_idx) AS INTEGER) AS n_ctx,
       CAST(COALESCE(a.q - MIN(b.q), 0) AS BIGINT) AS ctx_chars
FROM q a LEFT JOIN q b
  ON b.conv_id = a.conv_id AND b.turn_idx < a.turn_idx
 AND a.q - b.q <= {CTX_BUDGET}
GROUP BY a.conv_id, a.turn_idx, a.q
"""


def register(q: dict, o: dict | None = None) -> None:
    q["sft_pairs"] = sft_pairs
    q["context_budget"] = context_budget
    if o is not None:
        o["sft_pairs"] = sft_pairs_sql()
        o["context_budget"] = context_budget_sql()
