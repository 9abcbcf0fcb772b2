"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` table, each expressed Ray-Data
first (explode → one keyed groupby → verify), designed so the only
all-to-all exchange is on a high-cardinality key (content hash, shingle,
band signature, simhash chunk) — never on raw text:

- exact:        sha256(text) hash-partition + per-group min/count
- n-gram Jaccard: k-token shingles → co-occurrence pairs → exact Jaccard
                  (candidate generation is exact: any pair with J>0
                  shares ≥1 shingle, so no recall loss)
- MinHash+LSH:  64 perms × (8 bands × 8 rows) → band-bucket groupby
                (probabilistic candidates; the 100-TB path when the
                shingle-pair explosion above is too hot)
- SimHash:      64-bit over token counts, Manku chunk-pair pigeonhole
                buckets (hamming ≤ 6 ⇒ ≥2 of 8 chunks equal)
- embedding:    cosine ≥ τ near-dup pairs (see similarity.py for the
                broadcast-matmul kernel)

Scale notes: per-shingle pair emission is quadratic in group size.
The EXACT Jaccard path is uncapped (its contract is exactness; at a
scale where hot-shingle fan-out is unaffordable you switch to the
MinHash path, whose candidate buckets ARE capped at ``MAX_GROUP`` —
a recall/cost tradeoff inherent to LSH, not a silent correctness drop).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

SHINGLE_K = 3
JACCARD_TAU = 0.6
NUM_PERM = 64
BANDS = 8  # 8 rows per band
SIMHASH_RADIUS = 6  # Manku 8-chunk pair pigeonhole: ham<=6 => >=2 chunks equal
MAX_GROUP = 64  # cap pair fan-out per shingle/bucket group

_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(42)
_PERM_A = _RNG.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(
    np.uint64)
_PERM_B = _RNG.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(
    np.uint64)


def _mulmod_m61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized (a*h) mod (2^61-1) for uint64 operands < 2^61, without
    128-bit ints: split both into 31+30 bit halves, use 2^61 ≡ 1 (mod p)
    to fold each partial product below 2^62, sum in uint64 (< 2^64),
    then Mersenne-reduce.  This makes (a*h + b) mod p the genuine
    universal hash the MinHash math assumes — the old int64 product
    silently wrapped."""
    p = np.uint64(_MERSENNE)
    mask31 = np.uint64((1 << 31) - 1)
    a1, a0 = a >> np.uint64(31), a & mask31        # a = 2^31 a1 + a0
    h1, h0 = h >> np.uint64(31), h & mask31
    # 2^62 a1h1 ≡ 2 a1h1;  a1h1 < 2^60 → term < 2^61
    t1 = (a1 * h1) << np.uint64(1)
    # 2^31 (a1h0 + a0h1): mid < 2^62; split mid = 2^30 m1 + m0 →
    # 2^31 mid = 2^61 m1 + 2^31 m0 ≡ m1 + 2^31 m0  (each < 2^61)
    mid = a1 * h0 + a0 * h1
    t2 = (mid >> np.uint64(30)) + ((mid & np.uint64((1 << 30) - 1))
                                   << np.uint64(31))
    x = t1 + t2 + a0 * h0  # each term < 2^62 → sum < 2^64, no wrap
    x = (x & p) + (x >> np.uint64(61))
    x = (x & p) + (x >> np.uint64(61))
    return np.where(x >= p, x - p, x)


def round_half_up(x: float, digits: int = 4) -> float:
    """Deterministic half-up rounding shared with the SQL oracles
    (``floor(x*10^d + 0.5)/10^d``) — Python's round() is banker's."""
    m = 10**digits
    return math.floor(x * m + 0.5) / m


def _token_shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        # one whole-text shingle, INCLUDING '' for empty text (parity
        # with the SQL oracle, where string_split('') yields [''])
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(s: str) -> int:
    """61-bit blake2b shingle id.  Shingles are identified by this hash
    everywhere downstream (the shuffle moves 8-byte keys, not strings),
    so two distinct shingles collide with probability 2^-61 per pair —
    ~1e-6 even at 10^12 distinct shingles (birthday bound), far below
    the 1e-4 rounding grain of the reported Jaccard values.  The
    'exact' claim on the Jaccard path is exact-modulo-this-bound."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "big") & ((1 << 61) - 1)


# ---------------------------------------------------------------------------
# 1. Exact dedup


def exact_dedup(sf_dir: str, n_parts: int | None = None):
    """sha256(text) groups → keeper (min doc_id) + copy count.  The
    shuffle key is the 32-byte hash, not the document body — at 100 TB
    the exchange moves ~48 B/row regardless of document size.
    ``n_parts`` defaults to the input-size-derived count (n_parts_for)."""
    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.sha256(t.encode()).hexdigest()
                  for t in batch.column("text").to_pylist()]
        parts = [int(h[:8], 16) % np_parts for h in hashes]
        return pa.Table.from_arrays(
            [pa.array(hashes, pa.string()), pa.array(parts, pa.int32()),
             batch.column("doc_id")],
            names=["text_hash", "part", "doc_id"],
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("text_hash", sort=False)["doc_id"]
                .agg(keeper_doc_id="min", n_copies="size").reset_index())

    # coarse-partition + one vectorized pandas groupby per partition:
    # one group per DISTINCT document would be a per-group Python walk
    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda df: agg(df.drop(columns=["part"])),
                    batch_format="pandas")
    )


def exact_dedup_sql() -> str:
    return ("SELECT sha256(text) AS text_hash, min(doc_id) AS keeper_doc_id,"
            " count(*) AS n_copies FROM documents GROUP BY sha256(text)")


# ---------------------------------------------------------------------------
# 2. Exact n-gram Jaccard pairs (shingle co-occurrence candidates)


def _shingle_rows(batch: pa.Table, n_parts: int) -> pa.Table:
    """Explode docs into (k=hash64(shingle), part, doc_id, n_doc) rows —
    the shuffle moves 8-byte keys, never shingle strings."""
    doc_ids, ks, n_doc = [], [], []
    for did, text in zip(batch.column("doc_id").to_pylist(),
                         batch.column("text").to_pylist()):
        sh = _token_shingles(text)
        for s in sh:
            doc_ids.append(did)
            ks.append(_hash64(s))
            n_doc.append(len(sh))
    k_arr = pa.array(ks, pa.int64())
    return pa.Table.from_arrays(
        [k_arr, pa.array([k % n_parts for k in ks], pa.int32()),
         pa.array(doc_ids, pa.int64()), pa.array(n_doc, pa.int64())],
        names=["k", "part", "doc_id", "n_doc"],
    )


def ngram_jaccard_pairs(sf_dir: str, tau: float = JACCARD_TAU,
                        n_parts: int | None = None):
    import functools

    import ray.data as rd

    from .pairs import agg_pairs_by_part, keyed_pairs, n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    shingles = ds.map_batches(
        functools.partial(_shingle_rows, n_parts=np_parts),
        batch_format="pyarrow")
    pairs = keyed_pairs(shingles, ["n_doc"], None)  # exact: no cap

    def jaccard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], sort=False).agg(
            inter=("n_doc_a", "size"), n_a=("n_doc_a", "first"),
            n_b=("n_doc_b", "first")).reset_index()
        j = g["inter"] / (g["n_a"] + g["n_b"] - g["inter"])
        g = g[j >= tau]
        g["jaccard"] = [round_half_up(float(x)) for x in j[j >= tau]]
        return g[["doc_a", "doc_b", "jaccard"]]

    return agg_pairs_by_part(pairs, jaccard, np_parts)


def ngram_jaccard_sql(tau: float = JACCARD_TAU, k: int = SHINGLE_K) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS p FROM t),
sh AS (SELECT DISTINCT doc_id,
         CASE WHEN len(w) < {k} THEN array_to_string(w, ' ')
              ELSE array_to_string(list_slice(w, p, p + {k - 1}), ' ') END AS s
       FROM tok WHERE p + {k - 1} <= len(w) OR (len(w) < {k} AND p = 1)),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       floor((inter * 1.0 / (ca.n + cb.n - inter)) * 10000 + 0.5) / 10000
         AS jaccard
FROM pair JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
WHERE inter * 1.0 / (ca.n + cb.n - inter) >= {tau}
"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH candidate pairs (rows-only; probabilistic recall)


def _minhash_band_rows(batch: pa.Table, n_parts: int) -> pa.Table:
    """(k = hash64(band ‖ band-signature), part, doc_id) rows."""
    rows_per_band = NUM_PERM // BANDS
    doc_ids, ks = [], []
    for did, text in zip(batch.column("doc_id").to_pylist(),
                         batch.column("text").to_pylist()):
        sh = _token_shingles(text)
        if not sh:
            continue
        h = np.array([_hash64(s) for s in sh], dtype=np.uint64)
        # min over universal-hash permutations: (a*h + b) mod p, with a
        # true 61-bit Mersenne mulmod (no int64 overflow wrap)
        prod = _mulmod_m61(_PERM_A[None, :],
                           np.broadcast_to(h[:, None],
                                           (len(h), NUM_PERM)))
        s_ = prod + _PERM_B[None, :]          # < 2^62, no wrap
        p_ = np.uint64(_MERSENNE)
        s_ = (s_ & p_) + (s_ >> np.uint64(61))
        mh = np.where(s_ >= p_, s_ - p_, s_).min(axis=0).astype(np.uint64)
        for b in range(BANDS):
            band = mh[b * rows_per_band : (b + 1) * rows_per_band]
            k = int.from_bytes(
                hashlib.blake2b(bytes([b]) + band.tobytes(),
                                digest_size=8).digest(), "big") >> 1
            doc_ids.append(did)
            ks.append(k)
    return pa.Table.from_arrays(
        [pa.array(ks, pa.int64()),
         pa.array([k % n_parts for k in ks], pa.int32()),
         pa.array(doc_ids, pa.int64())],
        names=["k", "part", "doc_id"],
    )


def minhash_lsh_pairs(sf_dir: str, n_parts: int | None = None):
    """Candidate near-dup pairs + number of agreeing bands.  The shuffle
    key is the hashed band signature — tiny, uniform; the canonical
    100-TB dedup path."""
    import functools

    import ray.data as rd

    from .pairs import agg_pairs_by_part, keyed_pairs, n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    band_rows = ds.map_batches(
        functools.partial(_minhash_band_rows, n_parts=np_parts),
        batch_format="pyarrow")

    def count_bands(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["doc_a", "doc_b"], sort=False)
                .size().rename("n_shared_bands").reset_index())

    return agg_pairs_by_part(keyed_pairs(band_rows, [], MAX_GROUP),
                             count_bands, np_parts)


# ---------------------------------------------------------------------------
# 4. SimHash pairs (rows-only)


_TOKEN_HASH_MEMO: dict[str, int] = {}


def _token_hash64(tok: str) -> int:
    h = _TOKEN_HASH_MEMO.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(),
                                           digest_size=8).digest(), "big")
        # bound the memo (worker-lifetime cache; corpora have small
        # token vocabularies relative to token counts)
        if len(_TOKEN_HASH_MEMO) < 1_000_000:
            _TOKEN_HASH_MEMO[tok] = h
    return h


def _simhash64(text: str) -> int:
    """Vectorized: ONE (ntok × 64) numpy unpack per document instead of
    a 64-element Python list comp per token; token hashes memoized for
    the worker lifetime."""
    counts: dict[str, int] = {}
    for t in text.split(" "):
        counts[t] = counts.get(t, 0) + 1
    if not counts:
        return 0
    h = np.array([_token_hash64(t) for t in counts], dtype=np.uint64)
    c = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)        # (ntok, 64)
    acc = ((2 * bits - 1) * c[:, None]).sum(axis=0)
    return int(((acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def simhash_pairs(sf_dir: str, radius: int = SIMHASH_RADIUS,
                  n_parts: int | None = None):
    """Pairs within hamming ≤ radius.  Manku-style chunk-PAIR pigeonhole
    (Manku/Jain/Sarma, WWW'07 §3): split the 64-bit signature into 8
    chunks of 8 bits and key each doc under all C(8,2)=28 (chunk-pair,
    combined 16-bit value) buckets.  A pair with ≤ 6 differing bits
    agrees on ≥ 2 of the 8 chunks, hence shares ≥ 1 chunk-pair key —
    lossless candidate generation for radius 6 (the round-2 4×16-bit
    single-chunk scheme only guaranteed radius 3 and measured 0.72
    recall on planted J≥0.9 dups whose hamming ran to 8).  Cost vs
    round 2: 7× the keyed rows per doc, but the SAME expected bucket
    density (both key layouts hash 16 signature bits → n/2^16 docs per
    bucket), so the pair-explosion bound is unchanged at scale."""
    import ray.data as rd

    from .pairs import agg_pairs_by_part, keyed_pairs, n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts or n_parts_for(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    chunk_pairs = [(i, j) for i in range(8) for j in range(i + 1, 8)]

    def chunk_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs_np = np.fromiter(
            (_simhash64(t) for t in batch.column("text").to_pylist()),
            dtype=np.uint64, count=n)
        chunks = ((sigs_np[:, None]
                   >> (np.arange(8, dtype=np.uint64) * np.uint64(8)))
                  & np.uint64(0xFF)).astype(np.int64)     # (n, 8)
        ks = np.empty((n, len(chunk_pairs)), dtype=np.int64)
        for p, (i, j) in enumerate(chunk_pairs):
            ks[:, p] = (p << 16) | (chunks[:, i] << 8) | chunks[:, j]
        ks = ks.ravel()
        rep = len(chunk_pairs)
        return pa.Table.from_arrays(
            [pa.array(ks, pa.int64()),
             pa.array(ks % np_parts, pa.int32()),
             pa.array(np.repeat(batch.column("doc_id").to_numpy(), rep),
                      pa.int64()),
             # offset to signed int64 for the Arrow column
             pa.array(np.repeat(
                 (sigs_np - np.uint64(1 << 63)).view(np.int64), rep),
                 pa.int64())],
            names=["k", "part", "doc_id", "sig"],
        )

    cand = keyed_pairs(ds.map_batches(chunk_rows, batch_format="pyarrow"),
                       ["sig"], MAX_GROUP)

    def hamming_filter(batch: pa.Table) -> pa.Table:
        # xor is invariant to the signed offset (same constant both sides)
        x = (batch.column("sig_a").to_numpy()
             ^ batch.column("sig_b").to_numpy()).astype(np.int64)
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = pa.array(ham <= radius)
        return pa.Table.from_arrays(
            [batch.column("doc_a").filter(keep),
             batch.column("doc_b").filter(keep),
             pa.array(ham[ham <= radius], pa.int64())],
            names=["doc_a", "doc_b", "hamming"],
        )

    def min_hamming(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["doc_a", "doc_b"], sort=False)["hamming"]
                .min().reset_index())

    return agg_pairs_by_part(
        cand.map_batches(hamming_filter, batch_format="pyarrow"),
        min_hamming, np_parts)


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein with a row-vectorized DP: the sequential
    left-neighbor (insertion) cascade cur[j] = min(t[j], cur[j-1]+1)
    unrolls to min_k≤j (t[k] + (j−k)), which is one
    ``np.minimum.accumulate`` over t[k]−k — so the inner loop is O(n)
    numpy rows, not O(n·m) Python cells."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    m = len(cb)
    if m == 0 or len(ca) == 0:
        return max(len(ca), m)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, len(ca) + 1):
        sub = prev[:-1] + (cb != ca[i - 1])
        full = np.concatenate(
            [np.array([i], dtype=np.int64),
             np.minimum(prev[1:] + 1, sub)])
        prev = np.minimum.accumulate(full - idx) + idx
    return int(prev[-1])


def edit_distance_pairs(sf_dir: str, tau: float = JACCARD_TAU):
    """Edit-distance VERIFICATION of the near-dup candidate pairs —
    the second-stage filter of a fuzzy-dedup pipeline (candidates from
    a cheap sketch, confirmed by an expensive exact metric).

    Shape: the pair table is candidate-sized (≪ corpus by the sketch's
    construction), so the involved documents' texts load via ONE
    pushed-down isin read and broadcast to the scoring actors; each
    pair costs one row-vectorized DP.  If candidates were ever
    corpus-scale, replace the broadcast with two shuffle joins of the
    pair table against documents (the clusters.dedup_apply pattern)."""
    import ray
    import ray.data as rd

    # candidate-sized by construction — materializing it is the
    # documented exception (same class as ops.clusters' edge set)
    pairs = ngram_jaccard_pairs(sf_dir, tau).materialize()
    pair_rows = pairs.take_all()
    involved = sorted({int(r["doc_a"]) for r in pair_rows}
                      | {int(r["doc_b"]) for r in pair_rows})
    texts = {}
    if involved:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "in", involved)])
        texts = dict(zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()))
    ref = ray.put(texts)

    class Verify:
        def __init__(self, ref):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            da = batch.column("doc_a").to_pylist()
            db = batch.column("doc_b").to_pylist()
            dist = [_levenshtein(self.texts[a], self.texts[b])
                    for a, b in zip(da, db)]
            return pa.Table.from_arrays(
                [batch.column("doc_a"), batch.column("doc_b"),
                 pa.array(dist, pa.int64()),
                 pa.array([len(self.texts[a]) for a in da], pa.int64()),
                 pa.array([len(self.texts[b]) for b in db], pa.int64())],
                names=["doc_a", "doc_b", "edit_dist", "len_a", "len_b"])

    from .pairs import default_pool_size

    return pairs.map_batches(Verify, fn_constructor_args=(ref,),
                             batch_format="pyarrow",
                             concurrency=default_pool_size())


def edit_distance_pairs_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH pair AS ({ngram_jaccard_sql(tau)})
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       CAST(length(da.text) AS BIGINT) AS len_a,
       CAST(length(db.text) AS BIGINT) AS len_b
FROM pair p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
"""


def register(q: dict, o: dict | None = None) -> None:
    q["dedup_exact"] = exact_dedup
    q["dedup_ngram_jaccard"] = ngram_jaccard_pairs
    q["dedup_minhash_lsh"] = minhash_lsh_pairs
    q["dedup_simhash"] = simhash_pairs
    q["dedup_edit_distance"] = edit_distance_pairs
    if o is not None:
        o["dedup_exact"] = exact_dedup_sql()
        o["dedup_ngram_jaccard"] = ngram_jaccard_sql()
        o["dedup_edit_distance"] = edit_distance_pairs_sql()
