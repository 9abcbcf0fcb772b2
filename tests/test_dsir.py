"""DSIR importance weights vs a direct Python implementation of the
same smoothed log-ratio spec."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_dsir_weights_match_bruteforce(ray_session):
    from collections import Counter

    from kgref.ops.dsir import TARGET_LANG, _FX, dsir_weights

    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "lang", "text"]).to_pandas()
    cr, ct = Counter(), Counter()
    doc_feats = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        fs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        doc_feats[r.doc_id] = fs
        cr.update(fs)
        if r.lang == TARGET_LANG:
            ct.update(fs)
    v = len(cr)
    t_raw, t_tgt = sum(cr.values()), sum(ct.values())
    lr = {f: int(np.floor(
        _FX * (np.log(ct.get(f, 0) + 1.0) - np.log(c + 1.0)) + 0.5))
        for f, c in cr.items()}
    c_fx = int(np.floor(
        _FX * (np.log(float(t_raw + v)) - np.log(float(t_tgt + v))) + 0.5))

    got = dsir_weights(SF).to_pandas().set_index("doc_id")
    want = {d: (len(fs), sum(lr[f] for f in fs) + len(fs) * c_fx)
            for d, fs in doc_feats.items() if fs}
    assert len(got) == len(want)
    for d, (nf, s) in want.items():
        assert got.loc[d, "n_feats"] == nf
        assert got.loc[d, "dsir_fx"] == s

    # the whole point: target-language docs score higher on average
    langs = docs.set_index("doc_id")["lang"]
    per_feat = got["dsir_fx"] / got["n_feats"]
    tgt = per_feat[langs[got.index] == TARGET_LANG]
    raw = per_feat[langs[got.index] != TARGET_LANG]
    assert tgt.mean() > raw.mean()
