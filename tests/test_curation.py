"""corpus_curation: composition equals its component operators, and
the dedup-keeper path fires on planted duplicates."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_curation_equals_component_composition(ray_session):
    """The fused pass must keep exactly the docs the individual
    operators (lang_id, quality_score, token_stats, exact dedup) say
    survive."""
    from kgref.ops.curation import (MAX_TOKENS, MIN_TOKENS,
                                    QUALITY_MIN_FX, corpus_curation)
    from kgref.ops.textstats import lang_id, quality_score

    got = corpus_curation(SF).to_pandas().sort_values("doc_id")
    lp = lang_id(SF).to_pandas().set_index("doc_id")["lang_pred"]
    qs = quality_score(SF).to_pandas().set_index("doc_id")
    qfx = np.floor(qs["quality"] * 10000 + 0.5).astype(np.int64)
    want = qs[(lp != "und")
              & (qfx >= QUALITY_MIN_FX)
              & (qs["n_tokens"] >= MIN_TOKENS)
              & (qs["n_tokens"] <= MAX_TOKENS)].index
    # sf0.001 has no exact duplicates, so the survivor set IS the keep
    # set; the keeper path is covered by the planted-dup test below
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    assert len(texts) == len(set(texts))
    assert sorted(got["doc_id"]) == sorted(want)
    assert (got.set_index("doc_id")["lang_pred"] == lp[got["doc_id"]]).all()


def test_curation_keeps_min_doc_id_per_duplicate_group(ray_session, tmp_path):
    """Planted duplicate groups: only the min-doc_id surviving copy of
    each text stays; und/short/low-quality docs drop first."""
    from kgref.ops.curation import corpus_curation

    good = ("the quick brown fox jumps with the and of to a in that it "
            "is was he for on are as with his they at be this have from")
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            good,                     # keeper of group A (min doc_id)
            good,                     # dup of A → dropped
            good + " extra tail",     # distinct → kept
            "zz yy xx",               # und + too short → dropped
            good,                     # dup of A → dropped
            good + " extra tail",     # dup of 3 → dropped
        ], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = corpus_curation(str(tmp_path)).to_pandas()
    assert sorted(got["doc_id"]) == [1, 3]
    assert set(got["lang_pred"]) == {"en"}
