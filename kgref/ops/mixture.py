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


_OFF_CUR = 27_272_727
N_QUALITY_BUCKETS = 10


def curriculum_order(sf_dir: str, n_buckets: int = N_QUALITY_BUCKETS,
                     part_bits: int = _MIX_PART_BITS):
    """(doc_id, bucket, pos) — curriculum export: the easy-to-hard
    global training order.  Docs are ranked by quality bucket
    DESCENDING (the ops/textstats quality heuristic, rendered in EXACT
    integer arithmetic: ``bucket = (B·min(50,n_tok)·(n_tok−n_stop)) //
    (50·n_tok)``, clamped to B−1, so no float boundary can disagree
    with the SQL twin), shuffled within each bucket by an independent
    splitmix64 stream.  pos is the exact global position — the same
    two-phase rank as :func:`kgref.ops.kgsplit.shuffle_shards` (count
    combiner → broadcast exclusive offsets → ONE coarse hash-range
    exchange), with offsets accumulated bucket-descending."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .textstats import STOP_TOKENS, _tokens_column

    n_parts = 1 << part_bits

    def keyed(t: pa.Table) -> pa.Table:
        toks = _tokens_column(t)
        n_tok = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.flatten()
        parents = np.repeat(np.arange(len(t)), n_tok)
        is_stop = pc.is_in(flat, value_set=pa.array(STOP_TOKENS)).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(parents, weights=is_stop,
                             minlength=len(t)).astype(np.int64)
        bucket = np.minimum(
            n_buckets * np.minimum(50, n_tok) * (n_tok - n_stop)
            // (50 * n_tok),
            n_buckets - 1)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64) + np.uint64(_OFF_CUR))
        part = (h >> np.uint64(64 - part_bits)).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()), pa.array(bucket),
             pa.array(h, pa.uint64()), pa.array(part)],
            names=["doc_id", "bucket", "h", "part"])

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
          .map_batches(keyed, batch_format="pyarrow").materialize())

    def count_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["bucket", "part"]).group_by(["bucket", "part"])
             .aggregate([("part", "count")]))
        return pa.Table.from_arrays(
            [g.column("bucket"), g.column("part"), g.column("part_count")],
            names=["bucket", "part", "n"])

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["bucket", "part"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())  # ≤ n_buckets · n_parts rows
    counts = counts.sort_values(["bucket", "part"],
                                ascending=[False, True], kind="mergesort")
    cum = counts["n"].cumsum().to_numpy() - counts["n"].to_numpy()
    offs = np.zeros(n_buckets * n_parts, np.int64)
    offs[counts["bucket"].to_numpy(np.int64) * n_parts
         + counts["part"].to_numpy(np.int64)] = cum
    off_ref = ray.put(offs)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(off_ref)
        df = df.sort_values(["bucket", "h", "doc_id"],
                            ascending=[False, True, True],
                            kind="mergesort")
        base = lut[df["bucket"].to_numpy(np.int64) * n_parts
                   + df["part"].to_numpy(np.int64)]
        within = df.groupby("bucket", sort=False).cumcount().to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "bucket": df["bucket"].to_numpy(np.int64),
            "pos": base + within})

    return ds.groupby("part").map_groups(rank, batch_format="pandas")


def curriculum_order_sql(n_buckets: int = N_QUALITY_BUCKETS) -> str:
    from .textstats import STOP_TOKENS

    stops = ", ".join(f"'{s}'" for s in STOP_TOKENS)
    return f"""
WITH b AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
    CAST(len(list_filter(string_split(text, ' '),
                         x -> x IN ({stops}))) AS BIGINT) AS n_stop,
    (CAST(doc_id AS HUGEINT) + {_OFF_CUR}) % {_M64} AS x
  FROM documents),
{_sql_hash_cols('x', 'b')},
c AS (SELECT doc_id,
             least({n_buckets} * least(50, n_tok) * (n_tok - n_stop)
                   // (50 * n_tok), {n_buckets - 1}) AS bucket, h
      FROM hh)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(row_number() OVER (ORDER BY bucket DESC, h, doc_id) - 1
            AS BIGINT) AS pos
FROM c
"""


def register(q: dict, o: dict | None = None) -> None:
    q["token_budget_mix"] = token_budget_mix
    q["curriculum_order"] = curriculum_order
    if o is not None:
        o["token_budget_mix"] = token_budget_mix_sql()
        o["curriculum_order"] = curriculum_order_sql()
