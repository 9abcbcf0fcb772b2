"""Token-budget mixture sampling — epoch planning for a training run.

DoReMi/Pile-style mixtures are usually specified in TOKENS, not
documents: "this epoch reads at most B_lang tokens of each language".
``token_budget_mix`` enforces that exactly and deterministically: docs
are ordered per language by an independent splitmix64 stream, and a
doc is kept iff the tokens of all earlier docs of its language
(``cum_before``) still fall below the language's budget — the greedy
prefix fill, the last kept doc may overflow the budget.  Emitting
``cum_before`` makes the oracle validate the distributed prefix sum
itself, not just the final keep set.

Scale shape — an ordered per-group prefix sum WITHOUT a global sort
(the shuffle_shards trick, summed instead of counted):

1. one column-pruned pass computes n_tokens (whitespace split, the
   ops/textstats convention), h = splitmix64(doc_id), and a coarse
   hash-range part (top bits of h);
2. a (lang × part) token-sum combiner — ≤ n_langs·2^bits rows reach
   the small groupby — yields broadcast per-lang exclusive token
   offsets in part order;
3. ONE exchange co-locates each hash range; a per-group vectorized
   shifted cumsum per lang plus the offset is the exact global
   ``cum_before``; the budget filter is a broadcast CASE lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .kgsplit import _sql_hash_cols
from .sampling import _M64, splitmix64

_OFF_MIX = 9_191_919
_MIX_PART_BITS = 6

TOKEN_BUDGETS = {"en": 5000, "de": 2000}
DEFAULT_TOKEN_BUDGET = 3000


def _budget_for(langs: np.ndarray) -> np.ndarray:
    out = np.full(len(langs), DEFAULT_TOKEN_BUDGET, np.int64)
    for lang, b in TOKEN_BUDGETS.items():
        out[langs == lang] = b
    return out


def token_budget_mix(sf_dir: str, part_bits: int = _MIX_PART_BITS):
    """(doc_id, lang, n_tokens, cum_before) — the docs a token-budgeted
    epoch reads, with the exact number of same-language tokens that
    precede each in the deterministic read order."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    n_parts = 1 << part_bits

    def keyed(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.list_value_length(
            pc.split_pattern(t.column("text"), pattern=" ")), pa.int64())
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64) + np.uint64(_OFF_MIX))
        part = (h >> np.uint64(64 - part_bits)).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()), t.column("lang"),
             n_tok, pa.array(h, pa.uint64()), pa.array(part)],
            names=["doc_id", "lang", "n_tokens", "h", "part"])

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
          .map_batches(keyed, batch_format="pyarrow").materialize())

    def sum_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["lang", "part", "n_tokens"])
             .group_by(["lang", "part"]).aggregate([("n_tokens", "sum")]))
        return pa.Table.from_arrays(  # name-addressed: key/agg column
            [g.column("lang"), g.column("part"),  # order varies across
             g.column("n_tokens_sum")],  # pyarrow versions
            names=["lang", "part", "toks"])

    sums = (ds.map_batches(sum_partial, batch_format="pyarrow")
            .groupby(["lang", "part"])
            .aggregate(Sum("toks", alias_name="toks"))
            .to_pandas())  # ≤ n_langs · n_parts rows: documented small
    sums = sums.sort_values(["lang", "part"], kind="mergesort")
    per_lang = sums.groupby("lang", sort=True)["toks"].cumsum().to_numpy()
    sums["off"] = per_lang - sums["toks"].to_numpy()
    off_ref = ray.put({(l, p): int(o) for l, p, o in
                       zip(sums["lang"], sums["part"], sums["off"])})

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        part = int(df["part"].iloc[0])  # group key: one part per group
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        tok = df["n_tokens"].to_numpy(np.int64)
        shifted = df.groupby("lang", sort=False)["n_tokens"].cumsum(
        ).to_numpy() - tok
        langs = df["lang"].to_numpy()
        base = np.array([offs[(l, part)] for l in
                         pd.unique(langs)], np.int64)
        cum = shifted + base[pd.factorize(langs)[0]]
        keep = cum < _budget_for(langs)
        return pa.Table.from_arrays(  # typed Arrow out: a fully-filtered
            [pa.array(df["doc_id"].to_numpy(np.int64)[keep]),  # group
             pa.array(langs[keep], pa.string()),  # stays schema-stable
             pa.array(tok[keep]), pa.array(cum[keep])],
            names=["doc_id", "lang", "n_tokens", "cum_before"])

    return ds.groupby("part").map_groups(fill, batch_format="pandas")


def token_budget_mix_sql() -> str:
    case = " ".join(f"WHEN lang = '{lang}' THEN {b}"
                    for lang, b in TOKEN_BUDGETS.items())
    budget = f"CASE {case} ELSE {DEFAULT_TOKEN_BUDGET} END"
    return f"""
WITH d AS (SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  (CAST(doc_id AS HUGEINT) + {_OFF_MIX}) % {_M64} AS x
           FROM documents),
{_sql_hash_cols('x', 'd')},
c AS (SELECT doc_id, lang, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY lang ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS cum_before
      FROM hh)
SELECT doc_id, lang, n_tokens, cum_before
FROM c WHERE cum_before < {budget}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["token_budget_mix"] = token_budget_mix
    if o is not None:
        o["token_budget_mix"] = token_budget_mix_sql()
