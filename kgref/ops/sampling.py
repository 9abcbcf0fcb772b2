"""Deterministic corpus sampling — the scale-safe way to subsample a
training corpus: a Bernoulli keep-decision from an integer hash of the
stable row key.  No RNG state, no shuffle, no coordination: any worker
decides any row identically, resumable runs sample identically, and the
sample rate is exact in expectation per hash bucket.

Hash: splitmix64 (public-domain finalizer; Steele et al., "Fast
Splittable Pseudorandom Number Generators", OOPSLA 2014) — vectorized in
numpy uint64 on the Ray side and replicated EXACTLY in DuckDB via
HUGEINT split-multiply arithmetic, so the driver's value-hash gate
compares identical row sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SAMPLE_PCT = 20  # keep ~20% of documents

_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
_M64 = 1 << 64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    z = x.astype(np.uint64) + np.uint64(_C1)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(_C2)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_C3)
    return z ^ (z >> np.uint64(31))


def sample_docs(sf_dir: str, pct: int = SAMPLE_PCT):
    """Deterministic pct% Bernoulli sample of documents (metadata
    columns only — the read prunes text)."""
    import ray.data as rd

    def keep(batch: pa.Table) -> pa.Table:
        h = splitmix64(batch.column("doc_id").to_numpy().astype(np.uint64))
        return batch.filter(pa.array(h % np.uint64(100) < pct))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return ds.map_batches(keep, batch_format="pyarrow")


def _sql_mul64(a: str, b: int) -> str:
    """(a * b) mod 2^64 in DuckDB HUGEINT (signed int128): split the
    variable operand at 2^32 so every partial product stays < 2^97."""
    return (f"(( ({a}) % 4294967296 ) * {b} + "
            f"(( ({a}) // 4294967296 ) * {b} % 4294967296) * 4294967296) "
            f"% 18446744073709551616")


def sample_docs_sql(pct: int = SAMPLE_PCT) -> str:
    z1 = f"(CAST(doc_id AS HUGEINT) + {_C1}) % {_M64}"
    z2 = _sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)
    z3 = _sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)
    return f"""
WITH s1 AS (SELECT doc_id, lang, source, n_chars, {z1} AS z1 FROM documents),
s2 AS (SELECT *, {z2} AS z2 FROM s1),
s3 AS (SELECT *, {z3} AS z3 FROM s2)
SELECT doc_id, lang, source, n_chars
FROM s3 WHERE xor(z3, z3 // {1 << 31}) % 100 < {pct}
"""


# ---------------------------------------------------------------------------
# Domain-reweighted (stratified) sampling — static per-domain keep rates
# (the DoReMi/Pile-style "mix languages at fixed weights" step).  Same
# stateless splitmix64 decision, but the rate is looked up per row from
# a tiny broadcast map and the hash stream is offset so the sample is
# independent of sample_docs over the same corpus.

LANG_RATES = {"en": 50, "de": 30}  # percent; every other lang 10
DEFAULT_RATE = 10
_STRAT_OFFSET = 1_000_003  # distinct hash stream vs sample_docs


def sample_stratified(sf_dir: str, rates: dict[str, int] | None = None):
    """Per-language Bernoulli sample at language-specific rates."""
    import ray.data as rd

    rates = LANG_RATES if rates is None else rates

    def keep(batch: pa.Table) -> pa.Table:
        h = splitmix64(batch.column("doc_id").to_numpy().astype(np.uint64)
                       + np.uint64(_STRAT_OFFSET))
        # rate per row via the dictionary path: one dict lookup per
        # UNIQUE lang in the batch, broadcast with take
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(batch.column("lang")).combine_chunks()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.chunk(0)
        lut = np.array([rates.get(v, DEFAULT_RATE)
                        for v in enc.dictionary.to_pylist()], np.uint64)
        rate = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(h % np.uint64(100) < rate))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return ds.map_batches(keep, batch_format="pyarrow")


def sample_stratified_sql(rates: dict[str, int] | None = None) -> str:
    rates = LANG_RATES if rates is None else rates
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(rates.items()))
    rate = f"(CASE lang {whens} ELSE {DEFAULT_RATE} END)"
    z1 = f"(CAST(doc_id AS HUGEINT) + {_STRAT_OFFSET} + {_C1}) % {_M64}"
    z2 = _sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)
    z3 = _sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)
    return f"""
WITH s1 AS (SELECT doc_id, lang, source, n_chars, {z1} AS z1 FROM documents),
s2 AS (SELECT *, {z2} AS z2 FROM s1),
s3 AS (SELECT *, {z3} AS z3 FROM s2)
SELECT doc_id, lang, source, n_chars
FROM s3 WHERE xor(z3, z3 // {1 << 31}) % 100 < {rate}
"""


# ---------------------------------------------------------------------------
# Per-group deterministic reservoir: exactly K docs per language, chosen
# as the K smallest splitmix64 hashes (a distributed reservoir sample —
# the hash IS the reservoir priority, so any worker ranks any row
# identically and the result is exact without coordination).

RESERVOIR_K = 5
_RES_OFFSET = 2_000_003  # distinct hash stream vs the other samplers


def sample_per_lang(sf_dir: str, k: int = RESERVOIR_K):
    """Exactly-K-per-group sampling.  Per-batch PARTIAL top-K per lang
    (run-boundary ordinal over a lexsort — each batch forwards ≤ K rows
    per language present, so the shuffle is K·#langs·#batches rows, not
    the corpus), then a languages-sized groupby finishes the global
    top-K.  Ties cannot occur in the hash (distinct doc_ids) but the
    (hash, doc_id) order is pinned anyway to match the SQL window."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        h = splitmix64(doc.astype(np.uint64) + np.uint64(_RES_OFFSET))
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h, lang))
        ls = lang[order]
        new_l = np.ones(len(ls), dtype=bool)
        new_l[1:] = ls[1:] != ls[:-1]
        idx = np.arange(len(ls), dtype=np.int64)
        ordinal = idx - np.maximum.accumulate(np.where(new_l, idx, 0))
        keep = order[ordinal < k]
        return pa.Table.from_arrays(
            [pa.array(lang[keep]), pa.array(doc[keep]),
             pa.array(h[keep])],
            names=["lang", "doc_id", "h"])

    def finish(df):
        df = df.sort_values(["h", "doc_id"]).head(k)
        df["rn"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["lang", "doc_id", "rn"]]

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").map_groups(finish, batch_format="pandas"))


def sample_per_lang_sql(k: int = RESERVOIR_K) -> str:
    z1 = f"(CAST(doc_id AS HUGEINT) + {_RES_OFFSET} + {_C1}) % {_M64}"
    z2 = _sql_mul64(f"xor(z1, z1 // {1 << 30})", _C2)
    z3 = _sql_mul64(f"xor(z2, z2 // {1 << 27})", _C3)
    return f"""
WITH s1 AS (SELECT doc_id, lang, {z1} AS z1 FROM documents),
s2 AS (SELECT *, {z2} AS z2 FROM s1),
s3 AS (SELECT doc_id, lang, {z3} AS z3 FROM s2),
r AS (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY xor(z3, z3 // {1 << 31}), doc_id)
               AS rn
      FROM s3)
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= {k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["sample_docs"] = sample_docs
    q["sample_stratified"] = sample_stratified
    q["sample_per_lang"] = sample_per_lang
    if o is not None:
        o["sample_docs"] = sample_docs_sql()
        o["sample_stratified"] = sample_stratified_sql()
        o["sample_per_lang"] = sample_per_lang_sql()
