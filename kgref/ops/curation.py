"""End-to-end corpus curation — the canonical CCNet/RedPajama-style
keep-set in ONE fused pass + ONE exchange: language-identified,
quality-floored, length-banded, exact-dedup-keeper documents.

This is deliberately a COMPOSITION of the repo's per-signal operators
(ops/textstats.lang_id, quality_score, token_stats; ops/dedup
exact_dedup) fused the way a production curation run would be, instead
of the naive join of their outputs:

- ONE corpus read computes language votes, stop-ratio quality, token
  counts and the sha256 text hash in a single vectorized kernel —
  no joins between signal tables, the text column is read once.
- ALL row filters apply BEFORE the exchange, so the dedup shuffle
  carries only surviving (hash, doc_id, features) rows — ~60 B/row,
  never the document body (the ops/dedup.exact_dedup discipline).
- The single exchange hash-partitions on the text hash and keeps the
  min-doc_id copy per duplicate group (dedup AFTER quality filtering,
  the standard ordering, so the keeper is the best-ranked survivor).

Exactness: quality is compared in fixed-point (the quality_score
convention, floor(q·10⁴ + 0.5)), language ties break alphabetically on
both sides, and the keeper rule is a min — the DuckDB twin reproduces
the keep-set bit-for-bit via QUALIFY over the same hash partition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import LANG_MARKERS, STOP_TOKENS, _tokens_column

MIN_TOKENS = 12
MAX_TOKENS = 90
QUALITY_MIN_FX = 2500  # quality ≥ 0.25 in the 1e-4 fixed-point units


def corpus_curation(sf_dir: str):
    """Gate query: (doc_id, lang_pred, n_tokens, quality) — the kept
    corpus after language-ID, quality floor, length band and exact
    dedup (keeper = min doc_id among surviving copies)."""
    import ray.data as rd

    from .pairs import n_parts_for

    path = f"{sf_dir}/documents.parquet"
    np_parts = n_parts_for(path)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    langs = sorted(LANG_MARKERS)
    marker_sets = [sorted(LANG_MARKERS[lg]) for lg in langs]

    def extract(batch: pa.Table) -> pa.Table:
        n = len(batch)
        toks = _tokens_column(batch)
        lens = pc.list_value_length(toks).to_numpy()
        n_tok = lens.astype(np.int64)
        flat = toks.flatten()
        parents = np.repeat(np.arange(n), lens)
        is_stop = pc.is_in(flat, value_set=pa.array(STOP_TOKENS)).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(parents, weights=is_stop, minlength=n)
        qfx = np.floor(
            np.minimum(1.0, n_tok / 50.0) * (1.0 - n_stop / n_tok)
            * 10000 + 0.5).astype(np.int64)
        counts = np.zeros((n, len(langs)), dtype=np.int64)
        for li, ms in enumerate(marker_sets):
            hit = pc.is_in(flat, value_set=pa.array(ms)).to_numpy(
                zero_copy_only=False)
            counts[:, li] = np.bincount(parents, weights=hit, minlength=n)
        best, total = counts.argmax(axis=1), counts.max(axis=1)
        keep = ((total > 0) & (qfx >= QUALITY_MIN_FX)
                & (n_tok >= MIN_TOKENS) & (n_tok <= MAX_TOKENS))
        ki = np.flatnonzero(keep)
        # hash only the survivors (hashlib releases the GIL; C speed)
        texts = batch.column("text").take(pa.array(ki)).to_pylist()
        hashes = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        parts = [int(h[:8], 16) % np_parts for h in hashes]
        return pa.Table.from_arrays(
            [pa.array(parts, pa.int32()),
             pa.array(hashes, pa.string()),
             batch.column("doc_id").take(pa.array(ki)),
             pa.array([langs[b] for b in best[ki]], pa.string()),
             pa.array(n_tok[ki].astype(np.int32)),
             pa.array(qfx[ki] / 10000.0, pa.float64())],
            names=["part", "text_hash", "doc_id", "lang_pred",
                   "n_tokens", "quality"])

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        keeper = df.groupby("text_hash", sort=False)["doc_id"] \
            .transform("min")
        return (df.loc[df["doc_id"] == keeper,
                       ["doc_id", "lang_pred", "n_tokens", "quality"]])

    return (ds.map_batches(extract, batch_format="pyarrow")
            .groupby("part")
            .map_groups(keep_min, batch_format="pandas"))


def corpus_curation_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in STOP_TOKENS)
    vals = ", ".join(
        f"('{w}', '{lg}')" for lg in sorted(LANG_MARKERS)
        for w in LANG_MARKERS[lg])
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents),
mk(w, lang) AS (VALUES {vals}),
hv AS (SELECT doc_id, lang, count(*) AS n FROM tok JOIN mk USING (w)
       GROUP BY doc_id, lang),
lp AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY n DESC, lang) AS rn
       FROM hv),
b AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ({stops}))) AS n_stop
      FROM documents),
f AS (SELECT d.doc_id, sha256(d.text) AS th, l.lang AS lang_pred,
             CAST(b.n_tok AS INTEGER) AS n_tokens,
             CAST(floor(least(1.0, b.n_tok / 50.0)
                        * (1.0 - b.n_stop * 1.0 / b.n_tok)
                        * 10000 + 0.5) AS BIGINT) AS qfx
      FROM documents d
      JOIN b USING (doc_id)
      JOIN lp l ON l.doc_id = d.doc_id AND l.rn = 1
      WHERE b.n_tok BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
        AND floor(least(1.0, b.n_tok / 50.0)
                  * (1.0 - b.n_stop * 1.0 / b.n_tok)
                  * 10000 + 0.5) >= {QUALITY_MIN_FX})
SELECT doc_id, lang_pred, n_tokens, qfx / 10000.0 AS quality
FROM f
QUALIFY doc_id = min(doc_id) OVER (PARTITION BY th)
"""


def register(q: dict, o: dict | None = None) -> None:
    q["corpus_curation"] = corpus_curation
    if o is not None:
        o["corpus_curation"] = corpus_curation_sql()
