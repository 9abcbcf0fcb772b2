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


BPE_K = 50


def bpe_pair_counts(sf_dir: str, k: int = BPE_K):
    """Top-k adjacent-symbol pairs weighted by word frequency — the
    first merge round of BPE tokenizer training (Sennrich et al. 2016,
    public algorithm).  Two-tier shape that makes the iterative trainer
    feasible at 100 TB: the CORPUS-scale pass is plain word counting
    (the vocab_topk combiner — exchange is vocab-sized), and the pair
    extraction runs over the distinct-WORD table (vocabulary-bounded,
    still distributed), so each subsequent merge round would rescan the
    word table only, never the corpus.

    The pair kernel is one numpy pass per batch: words concatenate to a
    single codepoint array (utf-32 view), word-boundary positions mask
    out cross-word pairs, weights repeat per in-word position, and
    per-batch partial counts collapse via np.unique + np.bincount —
    the exchange moves one row per distinct pair per batch."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def word_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), 2))
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = pc.value_counts(enc.indices)
        return pa.Table.from_arrays(
            [enc.dictionary.take(counts.field("values")),
             pc.cast(counts.field("counts"), pa.int64())],
            names=["word", "n"])

    words = (ds.map_batches(word_counts, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n")))

    def pair_partial(batch: pa.Table) -> pa.Table:
        ws = batch.column("word").to_pylist()
        n = batch.column("n").to_numpy(zero_copy_only=False)
        if not ws:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cp = np.frombuffer("".join(ws).encode("utf-32-le"), np.uint32)
        lens = np.fromiter((len(w) for w in ws), np.int64, len(ws))
        ends = np.cumsum(lens)
        valid = np.ones(len(cp), bool)
        valid[ends - 1] = False           # last char of each word
        left_pos = np.flatnonzero(valid)  # in-word pair start positions
        key = (cp[left_pos].astype(np.int64) << 21
               | cp[left_pos + 1].astype(np.int64))  # codepoints < 2^21
        w = np.repeat(n, lens - 1)
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, w)            # exact int64 accumulation
        pairs = [chr(int(x) >> 21) + chr(int(x) & ((1 << 21) - 1))
                 for x in uk]              # unique-pair-bounded loop
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n": pa.array(sums, pa.int64())})

    return (words.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("pair").aggregate(Sum("n", alias_name="n_total"))
            .sort(["n_total", "pair"], descending=[True, False])
            .limit(k))


def bpe_pair_counts_sql(k: int = BPE_K) -> str:
    return f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w
       WHERE length(word) >= 2 GROUP BY word),
e AS (SELECT word, n, unnest(range(1, length(word))) AS i FROM wc),
p AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, n FROM e)
SELECT pair, CAST(sum(n) AS BIGINT) AS n_total FROM p GROUP BY pair
ORDER BY n_total DESC, pair LIMIT {k}
"""


def register(q: dict, o: dict | None = None) -> None:
    q["vocab_topk"] = vocab_topk
    q["bpe_pair_counts"] = bpe_pair_counts
    if o is not None:
        o["vocab_topk"] = vocab_topk_sql()
        o["bpe_pair_counts"] = bpe_pair_counts_sql()
