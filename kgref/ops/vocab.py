"""Corpus vocabulary construction — top-k token frequencies.

The canonical combiner-pattern demonstration: each batch PRE-AGGREGATES
its token counts with vectorized Arrow kernels (dictionary_encode +
value_counts), so the all-to-all exchange moves one row per DISTINCT
token per batch (vocabulary-sized), never one row per token occurrence.
At 100 TB the shuffle volume is #batches × vocab, orders of magnitude
below the corpus token count; the final groupby/sort runs over a
vocabulary-sized table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

VOCAB_K = 100


def vocab_topk(sf_dir: str, k: int = VOCAB_K):
    """Top-k tokens by corpus frequency, ties broken by token asc."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        enc = pc.dictionary_encode(toks.flatten())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = pc.value_counts(enc.indices)
        return pa.Table.from_arrays(
            [enc.dictionary.take(counts.field("values")),
             pc.cast(counts.field("counts"), pa.int64())],
            names=["token", "n"],
        )

    return (ds.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("token").aggregate(Sum("n", alias_name="n_total"))
            .sort(["n_total", "token"], descending=[True, False])
            .limit(k))


def vocab_topk_sql(k: int = VOCAB_K) -> str:
    return f"""
SELECT w AS token, count(*) AS n_total
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n_total DESC, token LIMIT {k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["vocab_topk"] = vocab_topk
    if o is not None:
        o["vocab_topk"] = vocab_topk_sql()
