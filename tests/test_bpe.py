"""bpe_train (kgref.ops.bpe): merge-application kernel (overlap
resolution, multi-char symbols), and bit-exact multi-round parity of
the distributed trainer against the pure-Python reference."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kgref.ops.bpe import (apply_merge, bpe_encode, bpe_train,
                           reference_bpe, reference_encode)


def _batch(words, counts):
    return pa.table({"syms": pa.array([list(w) if isinstance(w, str)
                                       else w for w in words],
                                      pa.list_(pa.string())),
                     "n": pa.array(counts, pa.int64())})


def _syms(t):
    return t.column("syms").to_pylist()


def test_apply_merge_basic_and_compound():
    got = apply_merge(_batch(["abc", "xaby"], [1, 1]), "a", "b")
    assert _syms(got) == [["ab", "c"], ["x", "ab", "y"]]
    # merged token participates in the next merge
    got2 = apply_merge(got, "ab", "c")
    assert _syms(got2) == [["abc"], ["x", "ab", "y"]]


def test_apply_merge_leftmost_nonoverlapping():
    # aaaa + (a,a) -> aa, aa;  aaa -> aa, a (greedy leftmost)
    got = apply_merge(_batch(["aaaa", "aaa"], [1, 1]), "a", "a")
    assert _syms(got) == [["aa", "aa"], ["aa", "a"]]


def test_apply_merge_no_cross_word_merge():
    # word boundary: last symbol of word 0 + first of word 1 never merge
    got = apply_merge(_batch(["ca", "bd"], [1, 1]), "a", "b")
    assert _syms(got) == [["c", "a"], ["b", "d"]]


def test_bpe_train_matches_reference(ray_session, tmp_path):
    texts = ["the cat sat on the mat", "the bat and the cat",
             "aaa aaaa the hat", "banana bandana the"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2:
                wc[w] = wc.get(w, 0) + 1
    want = reference_bpe(wc, 12)
    got = bpe_train(str(tmp_path), n_merges=12).to_pylist()
    assert [(r["left"], r["right"], r["n"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(len(got)))
    assert all(r["merged"] == r["left"] + r["right"] for r in got)


def test_bpe_encode_matches_reference(ray_session, tmp_path):
    texts = ["the cat sat on the mat", "banana bandana a x",
             "aaa aaaa hat the"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    merges = [(r["left"], r["right"])
              for r in bpe_train(str(tmp_path), 8).to_pylist()]
    got = (bpe_encode(str(tmp_path), 8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_words"]) == [len(t.split(" ")) for t in texts]
    assert list(got["n_tokens"]) == [reference_encode(t, merges)
                                     for t in texts]
    assert int(got.loc[1, "n_tokens"]) < sum(
        len(w) for w in texts[1].split(" "))  # merges actually applied


def test_bpe_train_exhausts_small_corpus(ray_session, tmp_path):
    # 'ab' alone supports exactly one merge; further rounds stop early
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["ab ab"], pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = bpe_train(str(tmp_path), n_merges=5).to_pylist()
    assert [(r["left"], r["right"], r["n"]) for r in got] == [("a", "b", 2)]
