"""Iterative BPE tokenizer training (Sennrich et al. 2016) — the full
merge loop, distributed the way the algorithm actually scales.

Two-tier design (the reason BPE is feasible at 100 TB): the CORPUS is
scanned exactly once — word counting with the vocab combiner — and
every merge round thereafter runs over the distinct-WORD table
(vocabulary-bounded, still a distributed Dataset: at web scale the
distinct-word table is itself billions of rows).  Per round:

- pair counting: one vectorized pass per batch over the symbol lists
  (Arrow list offsets → boundary mask → element-wise join), per-batch
  partial counts so the exchange carries distinct pairs per batch;
- winner selection: groupby-Sum → sort (count desc, pair asc) →
  limit 1 — ONE row ever reaches the driver per round;
- merge application: vectorized per batch (candidate positions from
  two aligned equality tests, leftmost-nonoverlapping resolved by
  alternate-accept within candidate runs — exact for the only case
  where candidates can touch, left == right), then list rebuild via
  take + if_else.  The word table re-materializes each round so the
  per-round pass costs one scan of the VOCAB, not a growing lineage
  replay.

Driver state: one merge row per round.  No SQL oracle — the merge
recursion is not SQL-expressible (the driver records a rows-only
check); correctness is pinned by a bit-exact pytest parity against a
pure-Python reference BPE and by ``bpe_pair_counts``' hash-gated twin
validating round 1's arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_MERGES = 20
_SEP = "\x1f"


def _word_syms(sf_dir: str):
    """Distinct words with counts, exploded to symbol (character)
    lists — the state table every merge round rewrites."""
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

    def explode(batch: pa.Table) -> pa.Table:
        syms = pa.array([list(w) for w in
                         batch.column("word").to_pylist()],
                        pa.list_(pa.string()))  # one-time vocab-bounded
        return pa.table({"syms": syms, "n": batch.column("n")})

    return (ds.map_batches(word_counts, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n"))
            .map_batches(explode, batch_format="pyarrow"))


def _pair_partials(batch: pa.Table) -> pa.Table:
    syms = batch.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    n = batch.column("n").to_numpy(zero_copy_only=False)
    offs = syms.offsets.to_numpy(zero_copy_only=False)
    flat = syms.flatten()
    lens = np.diff(offs)
    if len(flat) == 0 or lens.sum() == len(lens):  # all 1-symbol words
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    valid = np.ones(len(flat), bool)
    valid[offs[1:] - 1] = False            # last symbol of each word
    pos = np.flatnonzero(valid)
    pair = pc.binary_join_element_wise(
        flat.take(pa.array(pos)), flat.take(pa.array(pos + 1)), _SEP)
    w = np.repeat(n, np.maximum(lens - 1, 0))
    enc = pair.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    sums = np.zeros(len(enc.dictionary), np.int64)
    np.add.at(sums, codes, w)
    return pa.table({"pair": enc.dictionary,
                     "n": pa.array(sums, pa.int64())})


def _top_pair(words):
    from ray.data.aggregate import Sum

    top = (words.map_batches(_pair_partials, batch_format="pyarrow")
           .groupby("pair").aggregate(Sum("n", alias_name="n"))
           .sort(["n", "pair"], descending=[True, False])
           .limit(1).take_all())
    if not top:
        return None
    left, right = top[0]["pair"].split(_SEP)
    return left, right, int(top[0]["n"])


def apply_merge(batch: pa.Table, left: str, right: str) -> pa.Table:
    """Rewrite every symbol list, replacing leftmost-nonoverlapping
    adjacent (left, right) with left+right — one vectorized pass."""
    syms = batch.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offs = syms.offsets.to_numpy(zero_copy_only=False)
    flat = syms.flatten()
    fl = np.asarray(pc.equal(flat, pa.scalar(left)).to_numpy(
        zero_copy_only=False), bool)
    fr = np.asarray(pc.equal(flat, pa.scalar(right)).to_numpy(
        zero_copy_only=False), bool)
    valid = np.ones(len(flat), bool)
    if len(offs) > 1:
        valid[offs[1:] - 1] = False
    cand = np.flatnonzero(valid[:len(flat) - 1] & fl[:-1] & fr[1:]) \
        if len(flat) > 1 else np.empty(0, np.int64)
    if len(cand):
        # leftmost-nonoverlapping: candidates can only be consecutive
        # when left == right; accept alternate positions within runs
        run_start = np.zeros(len(cand), np.int64)
        new_run = np.empty(len(cand), bool)
        new_run[0] = True
        np.not_equal(cand[1:], cand[:-1] + 1, out=new_run[1:])
        rid = np.cumsum(new_run) - 1
        starts = cand[new_run]
        acc = cand[((cand - starts[rid]) % 2) == 0]
    else:
        acc = cand
    if not len(acc):
        return batch
    keep = np.ones(len(flat), bool)
    keep[acc + 1] = False                  # drop each merged right half
    kept_idx = np.flatnonzero(keep)
    is_merged = np.zeros(len(flat), bool)
    is_merged[acc] = True
    new_flat = pc.if_else(pa.array(is_merged[kept_idx]),
                          pa.scalar(left + right),
                          flat.take(pa.array(kept_idx)))
    merged_per_word = np.bincount(
        np.searchsorted(offs[1:], acc, side="right"),
        minlength=len(offs) - 1)
    new_lens = np.diff(offs) - merged_per_word
    new_offs = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
    new_syms = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                        new_flat)
    return pa.table({"syms": new_syms, "n": batch.column("n")})


def bpe_train(sf_dir: str, n_merges: int = N_MERGES):
    """(rank, left, right, merged, n) — the learned merge table in
    order; ``n`` is the pair's corpus count at merge time."""
    words = _word_syms(sf_dir).materialize()
    merges = []
    for rank in range(n_merges):
        top = _top_pair(words)
        if top is None:
            break
        left, right, cnt = top
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": left + right, "n": cnt})
        words = words.map_batches(
            lambda b, lf=left, rt=right: apply_merge(b, lf, rt),
            batch_format="pyarrow").materialize()  # vocab-bounded state
    return pa.Table.from_pylist(merges) if merges else pa.table(
        {"rank": pa.array([], pa.int64()), "left": pa.array([], pa.string()),
         "right": pa.array([], pa.string()),
         "merged": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())})


def reference_bpe(word_counts: dict[str, int],
                  n_merges: int) -> list[tuple[str, str, int]]:
    """Pure-Python single-process BPE twin (test oracle)."""
    words = {tuple(w): c for w, c in word_counts.items() if len(w) >= 2}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c)
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((l, r, cnt))
        neww = {}
        for syms, c in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            neww[tuple(res)] = neww.get(tuple(res), 0) + c
        words = neww
    return out


def bpe_encode(sf_dir: str, n_merges: int = N_MERGES):
    """(doc_id, n_words, n_tokens) — encode the CORPUS with the learned
    merge table: per document, word count and post-BPE token count (the
    budget quantity a training-mix planner consumes).

    Scale shape: the merge table (n_merges rows) broadcasts via
    ``ray.put``; each corpus batch dedups to its DISTINCT words, applies
    the merges with the same vectorized ``apply_merge`` kernel
    (n_merges passes over batch-distinct words, not corpus words), then
    maps per-word token counts back to documents with one ``index_in``
    + segment-sum — no per-row Python in the corpus pass."""
    import ray
    import ray.data as rd

    merges = [(r["left"], r["right"])
              for r in bpe_train(sf_dir, n_merges).to_pylist()]
    mref = ray.put(merges)

    def encode(batch: pa.Table) -> pa.Table:
        ms = ray.get(mref)
        toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = toks.flatten()
        words = pc.unique(flat)
        syms = pa.array([list(w) for w in words.to_pylist()],
                        pa.list_(pa.string()))  # batch-distinct-bounded
        wt = pa.table({"syms": syms,
                       "n": pa.array(np.ones(len(words), np.int64))})
        for left, right in ms:
            wt = apply_merge(wt, left, right)
        s = wt.column("syms")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        tok_per_word = np.diff(s.offsets.to_numpy(zero_copy_only=False))
        idx = pc.index_in(flat, value_set=words).to_numpy(
            zero_copy_only=False)
        doc_off = toks.offsets.to_numpy(zero_copy_only=False)
        words_per_doc = np.diff(doc_off)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64),
                           words_per_doc)
        n_tokens = np.zeros(len(batch), np.int64)
        np.add.at(n_tokens, doc_of, tok_per_word[idx])
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_words": pa.array(words_per_doc.astype(np.int64)),
                         "n_tokens": pa.array(n_tokens)})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(encode, batch_format="pyarrow")


def reference_encode(text: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one document under the merge table (test twin)."""
    total = 0
    for w in text.split(" "):
        syms = list(w)
        for l, r in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        total += len(syms)
    return total


def register(q: dict, o: dict | None = None) -> None:
    q["bpe_train"] = bpe_train
    q["bpe_encode"] = bpe_encode
    # no oracle_sql: the merge recursion is not SQL-expressible — the
    # driver records a rows-only check; pytest pins bit-exact parity
    # against reference_bpe and bpe_pair_counts hash-gates round 1.
