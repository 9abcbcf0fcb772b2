"""DSIR-style importance weights for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every document by the log-likelihood ratio of a TARGET-domain n-gram
LM to the RAW-corpus LM — the standard way to pick pretraining data
that "looks like" a trusted domain.  Target here is the ``lang='en'``
slice of the corpus (a deterministic metadata split); features are
word bigrams.

Shape: the two-pass broadcast-stats skeleton (ops/lm.py).  Pass 1
builds BOTH feature LMs in one combiner — per-batch partial
(feature, c_raw, c_target) counts, one vocabulary-sized groupby —
and broadcasts the log-ratio table as sorted parallel arrays.  Pass 2
scores each document with one vectorized searchsorted pass.  DSIR
proper hashes features into B buckets to bound the table; this repo
keeps raw bigram keys so the DuckDB twin can join on them (the
bucketing optimization is exactly ops/dedup's hash64-key discipline
and drops in when the vocabulary outgrows the broadcast budget).

Exactness: with Laplace smoothing,
  ln p̂_t(f) − ln p̂_r(f) = [ln(c_t+1) − ln(c_r+1)] + C,
  C = ln(T_r + V) − ln(T_t + V)  (corpus constant),
so each feature's log-ratio is fixed-pointed ONCE
(floor(10⁶·Δln + 0.5), the tfidf.py libm-parity convention) and the
per-doc score is an exact int64 sum:
  dsir_fx(doc) = Σ_f mult·lr_fx(f) + n_feats·C_fx.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FX = 1_000_000
TARGET_LANG = "en"


def _bigram_rows(batch: pa.Table):
    """(parents, bigrams) for one batch: vectorized consecutive-token
    pairs, excluding cross-document boundaries."""
    toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    lens = pc.list_value_length(toks).to_numpy()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.str_)
    parents = np.repeat(np.arange(len(batch)), lens)
    if len(flat) == 0:
        return np.array([], np.int64), flat
    last = np.cumsum(lens) - 1          # last token position per doc
    keep = np.ones(len(flat), dtype=bool)
    keep[last[lens > 0]] = False        # a bigram can't start on it
    bg = np.char.add(np.char.add(flat[:-1], " "), flat[1:])
    keep = keep[:-1]
    return parents[:-1][keep], bg[keep]


def dsir_weights(sf_dir: str):
    """Gate query: (doc_id, n_feats, dsir_fx) — exact fixed-point DSIR
    log-ratio score per document with ≥ 1 bigram feature."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        parents, bg = _bigram_rows(batch)
        is_t = (batch.column("lang").to_numpy(zero_copy_only=False)
                == TARGET_LANG)[parents].astype(np.int64)
        feats, inv = np.unique(bg, return_inverse=True)
        cr = np.bincount(inv, minlength=len(feats)).astype(np.int64)
        ct = np.bincount(inv, weights=is_t,
                         minlength=len(feats)).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(feats), pa.array(cr), pa.array(ct)],
            names=["f", "cr", "ct"])

    rows = (ds.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("f").aggregate(Sum("cr", alias_name="cr"),
                                    Sum("ct", alias_name="ct")))
    f_parts, cr_parts, ct_parts = [], [], []
    for b in rows.iter_batches(batch_format="pyarrow"):
        f_parts.append(b.column("f").to_numpy(zero_copy_only=False))
        cr_parts.append(b.column("cr").to_numpy(zero_copy_only=False))
        ct_parts.append(b.column("ct").to_numpy(zero_copy_only=False))
    # vocabulary-sized broadcast side (ops/lm.py discipline): sorted
    # parallel arrays + searchsorted, never a Python dict probe
    feats = np.concatenate(f_parts).astype(np.str_) if f_parts else \
        np.array([], np.str_)
    cr = np.concatenate(cr_parts).astype(np.int64) if cr_parts else \
        np.array([], np.int64)
    ct = np.concatenate(ct_parts).astype(np.int64) if ct_parts else \
        np.array([], np.int64)
    order = np.argsort(feats, kind="stable")
    feats, cr, ct = feats[order], cr[order], ct[order]
    v = len(feats)
    t_raw, t_tgt = int(cr.sum()), int(ct.sum())
    lr_fx = np.floor(
        _FX * (np.log(ct + 1.0) - np.log(cr + 1.0)) + 0.5).astype(np.int64)
    c_fx = int(np.floor(
        _FX * (np.log(float(t_raw + v)) - np.log(float(t_tgt + v)))
        + 0.5)) if v else 0
    ref = ray.put((feats, lr_fx))

    def score(batch: pa.Table) -> pa.Table:
        vocab, lr = ray.get(ref)
        parents, bg = _bigram_rows(batch)
        # model built on this corpus → every bigram is in vocab
        dfeats, inv = np.unique(bg, return_inverse=True)
        w = lr[np.searchsorted(vocab, dfeats)]
        n = len(batch)
        s = np.zeros(n, np.int64)
        np.add.at(s, parents, w[inv])
        nf = np.bincount(parents, minlength=n).astype(np.int64)
        keep = np.flatnonzero(nf > 0)
        return pa.Table.from_arrays(
            [batch.column("doc_id").take(pa.array(keep)),
             pa.array(nf[keep]),
             pa.array(s[keep] + nf[keep] * c_fx)],
            names=["doc_id", "n_feats", "dsir_fx"])

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
           FROM documents),
pos AS (SELECT doc_id, lang, w,
               unnest(generate_series(1, len(w) - 1)) AS p
        FROM t WHERE len(w) >= 2),
bg AS (SELECT doc_id, lang,
              array_to_string(list_slice(w, p, p + 1), ' ') AS f
       FROM pos),
cnt AS (SELECT f, CAST(count(*) AS BIGINT) AS cr,
               CAST(sum(CASE WHEN lang = '{TARGET_LANG}' THEN 1
                        ELSE 0 END) AS BIGINT) AS ct
        FROM bg GROUP BY f),
tot AS (SELECT sum(cr) AS t_raw, sum(ct) AS t_tgt,
               count(*) AS v FROM cnt),
lr AS (SELECT f, CAST(floor({_FX} * (ln(ct + 1.0) - ln(cr + 1.0)) + 0.5)
                      AS BIGINT) AS lr_fx
       FROM cnt),
c AS (SELECT CAST(floor({_FX} * (ln(CAST(t_raw + v AS DOUBLE))
                                 - ln(CAST(t_tgt + v AS DOUBLE)))
                        + 0.5) AS BIGINT) AS c_fx
      FROM tot)
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       CAST(sum(lr.lr_fx) + count(*) * c.c_fx AS BIGINT) AS dsir_fx
FROM bg JOIN lr USING (f), c
GROUP BY bg.doc_id, c.c_fx
"""


def register(q: dict, o: dict | None = None) -> None:
    q["dsir_weights"] = dsir_weights
    if o is not None:
        o["dsir_weights"] = dsir_weights_sql()
