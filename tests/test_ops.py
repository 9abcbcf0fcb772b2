"""Tests for the training-data operators (kgref.ops.*): pair-generation
kernel vs brute force, dedup strategies on the driver's sf0.001 tables,
ANN vs a numpy oracle, text stats, and multimodal plumbing."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgref.ops.pairs import pairs_in_runs
from kgref.ops.dedup import round_half_up

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pairs kernel (pure numpy, no Ray)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pairs_in_runs_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    keys = np.sort(rng.randint(0, 40, size=rng.randint(0, 300)).astype(np.int64))
    ia, ib = pairs_in_runs(keys, max_group=1000)
    got = set(zip(ia.tolist(), ib.tolist()))
    want = {(i, j) for i in range(len(keys)) for j in range(i + 1, len(keys))
            if keys[i] == keys[j]}
    assert got == want


def test_pairs_in_runs_cap_is_deterministic_prefix():
    keys = np.array([7] * 10, dtype=np.int64)
    ia, ib = pairs_in_runs(keys, max_group=4)
    # only the first 4 elements of the run participate
    assert set(ia) | set(ib) == {0, 1, 2, 3}
    assert len(ia) == 6  # C(4,2)


def test_round_half_up_matches_sql_convention():
    # Python round() is banker's: round(0.03125, 4) == 0.0312 — the SQL
    # oracles use floor(x*1e4+0.5)/1e4, so we must too
    assert round_half_up(0.03125) == 0.0313
    assert round(0.03125, 4) == 0.0312  # the trap this guards against
    assert round_half_up(0.65625) == 0.6563
    assert round_half_up(1.0) == 1.0


# ---------------------------------------------------------------------------
# dedup over driver testdata (Ray)


def test_exact_dedup_covers_all_docs(ray_session):
    from kgref.ops.dedup import exact_dedup

    t = exact_dedup(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert t["n_copies"].sum() == n_docs
    assert t["keeper_doc_id"].is_unique


def test_jaccard_pairs_against_bruteforce(ray_session):
    from kgref.ops.dedup import (JACCARD_TAU, _token_shingles,
                                 ngram_jaccard_pairs)

    got = ngram_jaccard_pairs(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    sh = {d["doc_id"]: _token_shingles(d["text"]) for d in docs}
    want = set()
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            sa, sb = sh[a["doc_id"]], sh[b["doc_id"]]
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_TAU:
                want.add((a["doc_id"], b["doc_id"]))
    assert set(zip(got["doc_a"], got["doc_b"])) == want


def test_minhash_lsh_finds_the_planted_near_dups(ray_session):
    from kgref.ops.dedup import ngram_jaccard_pairs, minhash_lsh_pairs

    exact = ngram_jaccard_pairs(SF).to_pandas()
    strong = set(zip(exact[exact["jaccard"] >= 0.9]["doc_a"],
                     exact[exact["jaccard"] >= 0.9]["doc_b"]))
    lsh = minhash_lsh_pairs(SF).to_pandas()
    cand = set(zip(lsh["doc_a"], lsh["doc_b"]))
    # J≥0.9 pairs collide in ≥1 of 8 bands with near-certainty
    assert strong <= cand


def test_probabilistic_recall_floors(ray_session):
    """Quantified recall gates (VERDICT r2 task 5): the probabilistic
    paths must recover >= 90% of what their exact siblings find.
    Deterministic fixtures + fixed hash seeds make the measured numbers
    stable (1.0 / 1.0 / 1.0 at sf0.001; 1.0 / 0.96 / 1.0 at sf0.01 —
    recorded in COVERAGE.md via scripts/measure_recall.py)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from measure_recall import measure

    r = measure(SF)
    assert r["planted_pairs"] > 0 and r["ann_exact_rows"] > 0
    assert r["minhash_recall"] >= 0.9, r
    assert r["simhash_recall"] >= 0.9, r
    assert r["ann_lsh_recall"] >= 0.9, r
    assert r["ann_ivf_recall"] >= 0.9, r


def test_simhash_pairs_are_symmetric_free_and_within_radius(ray_session):
    from kgref.ops.dedup import SIMHASH_RADIUS, simhash_pairs

    t = simhash_pairs(SF).to_pandas()
    assert (t["doc_a"] < t["doc_b"]).all()
    assert (t["hamming"] <= SIMHASH_RADIUS).all()
    assert not t.duplicated(subset=["doc_a", "doc_b"]).any()


def test_simhash_chunk_pair_buckets_are_lossless(ray_session):
    """The Manku chunk-PAIR pigeonhole is a *lossless* candidate
    generator for hamming <= 6 (<= 6 flipped bits leave >= 2 of the 8
    byte-chunks intact, so the pair shares >= 1 chunk-pair key): the
    distributed result must equal the brute-force signature scan."""
    from kgref.ops.dedup import SIMHASH_RADIUS, _simhash64, simhash_pairs

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    sigs = np.array([_simhash64(d["text"]) for d in docs],
                    dtype=np.uint64)
    ids = np.array([d["doc_id"] for d in docs], dtype=np.int64)
    xors = sigs[:, None] ^ sigs[None, :]
    ham = np.zeros(xors.shape, dtype=np.int32)
    for b in range(64):
        ham += ((xors >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
    ii, jj = np.where(ham <= SIMHASH_RADIUS)
    want = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i, j in zip(ii, jj) if ids[i] != ids[j]}
    got = simhash_pairs(SF).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == want


# ---------------------------------------------------------------------------
# similarity (Ray + numpy oracle)


def _normalized_all():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def test_ann_topk_matches_numpy_oracle(ray_session):
    from kgref.ops.similarity import N_QUERIES, TOPK, ann_topk

    got = ann_topk(SF).to_pandas()
    ids, mat = _normalized_all()
    for q in range(N_QUERIES):
        sims = mat @ mat[list(ids).index(q)]
        order = sorted((-s, i) for s, i in zip(sims, ids) if i != q)
        want = [i for _s, i in order[:TOPK]]
        sub = got[got["query_id"] == q].sort_values("rank")
        assert sub["neighbor_id"].tolist() == want


def test_embedding_dup_pairs_threshold(ray_session):
    from kgref.ops.similarity import DUP_TAU, embedding_dup_pairs

    got = embedding_dup_pairs(SF).to_pandas()
    ids, mat = _normalized_all()
    sims = mat @ mat.T
    want = {(int(ids[i]), int(ids[j]))
            for i in range(len(ids)) for j in range(len(ids))
            if ids[i] < ids[j] and sims[i, j] >= DUP_TAU}
    assert set(zip(got["vec_a"], got["vec_b"])) == want


def test_embedding_dup_pairs_blocked_matches_single_pass(
        ray_session, monkeypatch):
    """Force the block-nested-loop path (B > 1 index blocks) and check
    the pair set is identical to the numpy all-pairs oracle — the
    stream_id < block_id predicate must emit each pair exactly once."""
    from kgref.ops import similarity
    from kgref.ops.similarity import DUP_TAU, embedding_dup_pairs

    # 500 vecs × 64 dim × 8 B = 256 KB → cap forces ≥ 4 blocks
    monkeypatch.setenv("KGREF_EMB_BLOCK_BYTES", str(64 << 10))
    assert len(similarity._embedding_blocks(
        f"{SF}/embeddings.parquet")) > 1
    got = embedding_dup_pairs(SF).to_pandas()
    ids, mat = _normalized_all()
    sims = mat @ mat.T
    want = {(int(ids[i]), int(ids[j]))
            for i in range(len(ids)) for j in range(len(ids))
            if ids[i] < ids[j] and sims[i, j] >= DUP_TAU}
    pairs = list(zip(got["vec_a"], got["vec_b"]))
    assert len(pairs) == len(set(pairs))  # no duplicate emission
    assert set(pairs) == want


def test_ann_lsh_neighbors_are_genuine(ray_session):
    """LSH recall < 1 by design, but every reported neighbor must carry
    its true cosine and ranks must be locally consistent."""
    from kgref.ops.similarity import ann_topk_lsh

    got = ann_topk_lsh(SF).to_pandas()
    assert not got.empty
    for _q, sub in got.groupby("query_id"):
        sub = sub.sort_values("rank")
        assert (sub["cos"].diff().dropna() <= 1e-9).all()


def test_ann_ivf_neighbors_are_genuine_and_probe_subset(ray_session):
    """IVF recall < 1 by design, but every reported neighbor carries
    its true cosine, ranks are locally consistent, and the quantizer is
    deterministic (two builds → identical centroids)."""
    import numpy as np

    from kgref.ops.similarity import _ivf_centroids, ann_topk_ivf

    c1, c2 = _ivf_centroids(SF), _ivf_centroids(SF)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    got = ann_topk_ivf(SF).to_pandas()
    assert not got.empty
    for _q, sub in got.groupby("query_id"):
        sub = sub.sort_values("rank")
        assert (sub["cos"].diff().dropna() <= 1e-9).all()


# ---------------------------------------------------------------------------
# text stats (Ray)


def test_token_stats_and_quality(ray_session):
    from kgref.ops.textstats import quality_score, token_stats

    ts = token_stats(SF).to_pandas().set_index("doc_id")
    qs = quality_score(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    for d in docs[:50]:
        toks = d["text"].split(" ")
        assert ts.loc[d["doc_id"], "n_tokens"] == len(toks)
        assert ts.loc[d["doc_id"], "n_distinct"] == len(set(toks))
        row = qs.loc[d["doc_id"]]
        assert row["n_chars"] == len(d["text"])
        stop = sum(1 for t in toks if t in ("the", "a"))
        assert row["stop_ratio"] == round_half_up(stop / len(toks))
        want_q = round_half_up(min(1.0, len(toks) / 50.0)
                               * (1 - stop / len(toks)))
        assert math.isclose(row["quality"], want_q, abs_tol=1e-9)


def test_lang_id_deterministic_argmax(ray_session):
    from kgref.ops.textstats import LANG_MARKERS, lang_id

    got = lang_id(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    for d in docs[:50]:
        toks = d["text"].split(" ")
        counts = {lg: sum(toks.count(w) for w in ws)
                  for lg, ws in LANG_MARKERS.items()}
        best = max(sorted(counts), key=lambda lg: counts[lg])
        want = best if counts[best] > 0 else "und"
        assert got.loc[d["doc_id"], "lang_pred"] == want


def test_fingerprint_is_deterministic(ray_session):
    from kgref.ops.textstats import doc_fingerprint

    a = doc_fingerprint(SF).to_pandas().sort_values("doc_id")
    b = doc_fingerprint(SF).to_pandas().sort_values("doc_id")
    assert a["fingerprint"].tolist() == b["fingerprint"].tolist()
    assert a["fingerprint"].str.len().eq(16).all()


# ---------------------------------------------------------------------------
# multimodal plumbing (Ray)


def test_media_features_schema_and_determinism(ray_session):
    from kgref.ops.multimodal import FEATURES, media_features

    got = media_features(SF)
    t = got.take_batch(batch_size=100, batch_format="pyarrow")
    assert [f.name for f in FEATURES] == t.column_names
    hist = np.stack([t.column(f"h{b:02d}").to_numpy() for b in range(16)],
                    axis=1)
    # bin counts sum to the decoded sample count — w*h*3 per image
    # frame, blen PCM bytes per audio doc
    total = hist.sum(axis=1)
    did = t.column("doc_id").to_numpy()
    w, h = 16 + did % 16, 16 + did % 8
    want = np.select(
        [did % 3 == 0, did % 3 == 1],
        [w * h * 3, (did % 7 + 2) * 256],
        (did % 5 + 2) * w * h * 3)
    assert (total == want).all()
    assert set(t.column("media_type").to_pylist()) <= {"image", "audio",
                                                        "video"}
    # video frame counts come from the real AVI container header walk:
    # the synthesizer wrote doc_id % 5 + 2 frames per video doc
    vids = [(d, nf) for d, mt, nf in zip(t.column("doc_id").to_pylist(),
                                         t.column("media_type").to_pylist(),
                                         t.column("n_frames").to_pylist())
            if mt == "video"]
    assert vids and all(nf == d % 5 + 2 for d, nf in vids)


def test_media_feature_closed_form(ray_session):
    """The oracle's sample model — decoded byte j == sha256(text)[j%32],
    histogram = seed-byte counts x tiling multiplicity, thumb sum = 192
    closed-form seed lookups — must match what the REAL encode ->
    container -> decode path computes (media_features_sql leans on
    this)."""
    import hashlib

    from kgref.ops.multimodal import media_features

    t = media_features(SF).take_batch(batch_size=60,
                                      batch_format="pyarrow")
    texts = {r["doc_id"]: r["text"]
             for r in pq.read_table(f"{SF}/documents.parquet",
                                    columns=["doc_id", "text"]).to_pylist()}
    for i, did in enumerate(t.column("doc_id").to_pylist()):
        seed = np.frombuffer(
            hashlib.sha256(texts[did].encode()).digest(), np.uint8)
        w, h = 16 + did % 16, 16 + did % 8
        n = (w * h * 3 if did % 3 == 0
             else (did % 7 + 2) * 256 if did % 3 == 1
             else (did % 5 + 2) * w * h * 3)
        cnt = (n - np.arange(32) + 31) // 32
        hist = np.zeros(16, np.int64)
        np.add.at(hist, seed >> 4, cnt)
        got = [t.column(f"h{b:02d}")[i].as_py() for b in range(16)]
        assert got == hist.tolist(), did
        ts = 0
        if did % 3 == 0:
            for y in (np.arange(8) * h) // 8:
                for x in (np.arange(8) * w) // 8:
                    for c in range(3):
                        ts += int(seed[((y * w + x) * 3 + c) % 32])
        assert t.column("thumb_sum")[i].as_py() == ts, did


def test_decode_rejects_unknown_containers():
    from kgref.ops.multimodal import MediaFeatures

    with pytest.raises(ValueError):
        MediaFeatures()._decode(b"\x89PNG\r\n\x1a\n....")


def test_media_codecs_roundtrip():
    """Real pure-Python codecs: encode → decode recovers the samples."""
    from kgref.ops.multimodal import (
        decode_avi, decode_bmp, decode_ppm, decode_wav,
        encode_avi, encode_bmp, encode_ppm, encode_wav,
    )

    rng = np.random.RandomState(9)
    for w, h in [(16, 16), (17, 5), (31, 23), (1, 1)]:  # odd widths → padding
        pix = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(pix)) == pix.reshape(-1)).all()
        assert (decode_ppm(encode_ppm(pix)) == pix.reshape(-1)).all()
        frames = rng.randint(0, 256, (4, h, w, 3), dtype=np.uint8)
        samples, nf = decode_avi(encode_avi(frames))
        assert nf == 4
        assert (samples == frames.reshape(-1)).all()
    s = rng.randint(-32768, 32768, 777).astype(np.int16)
    assert (decode_wav(encode_wav(s)) == s).all()


def test_media_decode_dispatch_real_formats():
    from kgref.ops.multimodal import MediaFeatures, encode_avi, encode_wav

    mf = MediaFeatures()
    s = np.arange(-100, 100, dtype=np.int16)
    out, nf = mf._decode(encode_wav(s))
    assert out.dtype == np.uint8 and len(out) == len(s) and nf == 1
    # both RIFF forms route by the 'WAVE'/'AVI ' form-type, not 'RIFF'
    frames = np.zeros((3, 4, 4, 3), dtype=np.uint8)
    out, nf = mf._decode(encode_avi(frames))
    assert nf == 3 and len(out) == frames.size


def test_sample_docs_deterministic_and_exact(ray_session):
    """Hash-Bernoulli sample: same rows on every run, rate ≈ pct, and
    the keep decision matches an independent big-int splitmix64."""
    from kgref.ops.sampling import SAMPLE_PCT, sample_docs, splitmix64

    got = sample_docs(SF).to_pandas()
    again = sample_docs(SF).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    M = 1 << 64

    def sm64(x):  # reference big-int implementation
        z = (x + 0x9E3779B97F4A7C15) % M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        return z ^ (z >> 31)

    all_ids = pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    want = {i for i in all_ids if sm64(i) % 100 < SAMPLE_PCT}
    assert set(got["doc_id"]) == want
    assert 0 < len(want) < len(all_ids)
    h = splitmix64(np.array(all_ids, dtype=np.uint64))
    assert all(int(h[k]) == sm64(i) for k, i in enumerate(all_ids[:50]))


def test_normalize_docs_recovers_clean_text(ray_session):
    """The messied view (upper + doubled spaces + padding) must
    normalize back to the original byte-identical text."""
    from kgref.ops.normalize import normalize_docs

    got = normalize_docs(SF).to_pandas().set_index("doc_id")["text_norm"]
    orig = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")["text"]
    assert got.sort_index().tolist() == orig.sort_index().tolist()


def test_normalize_batch_unicode_nfc():
    from kgref.ops.normalize import normalize_batch
    import pyarrow as pa

    # decomposed e + combining acute → NFC composed; case + ws collapse
    import unicodedata

    messy_str = "  CAFE" + "\u0301" + "   au   LAIT "  # decomposed e+´
    want = unicodedata.normalize("NFC", "cafe\u0301 au lait")
    out = normalize_batch(pa.array([messy_str])).to_pylist()[0]
    assert out == want and len(out) == len("cafe au lait")  # composed é


def test_vocab_topk_counts_match_python(ray_session):
    from collections import Counter

    from kgref.ops.vocab import vocab_topk

    got = vocab_topk(SF).to_pandas()
    c = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet",
                           columns=["text"]).column("text").to_pylist():
        c.update(t.split(" "))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert list(zip(got["token"], got["n_total"])) == want


def test_resize_nearest_shapes_and_identity():
    from kgref.ops.multimodal import resize_nearest

    rng = np.random.RandomState(4)
    pix = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    assert resize_nearest(pix, 30, 20).shape == (20, 30, 3)
    assert (resize_nearest(pix, 30, 20) == pix).all()  # identity size
    small = resize_nearest(pix, 8, 8)
    assert small.shape == (8, 8, 3)
    # nearest-neighbor: every output pixel exists in the input
    flat_in = {tuple(p) for p in pix.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in small.reshape(-1, 3))


def test_normalize_batch_mixed_ascii_rows():
    """Mixed batch: ASCII rows pass through untouched, only the non-ASCII
    rows take the unicodedata fallback (ADVICE round 2: the fallback must
    be per-ROW, not per-batch), nulls survive."""
    import pyarrow as pa
    import unicodedata

    from kgref.ops.normalize import _nfc

    decomposed = "café"  # e + combining acute
    col = pa.array(["plain ascii", decomposed, None, "more ascii"])
    out = _nfc(col).to_pylist()
    assert out == ["plain ascii", unicodedata.normalize("NFC", decomposed),
                   None, "more ascii"]


def test_embedding_dup_pairs_empty_table(ray_session, tmp_path):
    """Zero-row embeddings input → empty pair set (ADVICE round 2: the
    first-batch dim probe used to StopIteration on empty files)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from kgref.ops.similarity import embedding_dup_pairs

    d = tmp_path / "sf_empty"
    d.mkdir()
    _pq.write_table(
        pa.Table.from_arrays(
            [pa.array([], pa.int64()),
             pa.array([], pa.list_(pa.float32())),
             pa.array([], pa.int32())],
            names=["vec_id", "embedding", "label"]),
        str(d / "embeddings.parquet"))
    ds = embedding_dup_pairs(str(d))
    assert ds.schema().names == ["vec_a", "vec_b", "cos"]
    assert ds.count() == 0


def test_n_parts_for_scales_with_input_bytes():
    """Footer-only partition sizing: floor of 64 at fixture scale, and a
    power-of-two count proportional to bytes when the target shrinks
    (the 100-TB path, simulated by a tiny per-partition target)."""
    from kgref.ops.pairs import n_parts_for

    path = f"{SF}/documents.parquet"
    assert n_parts_for(path) == 64  # fixture-scale input hits the floor
    md = pq.ParquetFile(path).metadata
    total = sum(md.row_group(i).total_byte_size
                for i in range(md.num_row_groups))
    forced = n_parts_for(path, target_part_bytes=max(1, total // 300))
    assert forced >= 300 and (forced & (forced - 1)) == 0  # pow2 ≥ need
    # directory form: same answer for the single-file dir
    assert n_parts_for(SF, target_part_bytes=max(1, total // 300)) >= forced


@pytest.mark.parametrize("forced", [7, 128])
def test_coarse_partition_count_is_a_free_parameter(ray_session, forced):
    """Results must be IDENTICAL at any coarse-partition count (the
    count is a pure layout knob — VERDICT r2 #1).  Runs the exact-dedup,
    Jaccard and windowed-events paths at a forced non-default count
    (including a non-power-of-two) and compares to the default."""
    from kgref.ops.dedup import exact_dedup, ngram_jaccard_pairs
    from kgref.ops.events import windowed_agg

    def norm(ds, keys):
        df = ds.to_pandas()
        return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]

    for fn, keys in [(exact_dedup, ["text_hash"]),
                     (ngram_jaccard_pairs, ["doc_a", "doc_b"]),
                     (windowed_agg, ["user_id", "window_start"])]:
        base = norm(fn(SF), keys)
        alt = norm(fn(SF, n_parts=forced), keys)
        assert base.equals(alt), fn.__name__


# ---------------------------------------------------------------------------
# sequence packing / contamination / tf-idf / stratified sampling (round 3)


def test_pack_sequences_is_an_exact_prefix_sum(ray_session):
    """token_start must equal the exclusive running sum of n_tokens in
    doc_id order — the distributed two-pass result equals the trivial
    single-pass definition — and be invariant to the range count."""
    from kgref.ops.packing import TOKEN_BUDGET, pack_sequences

    got = pack_sequences(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    n = got["n_tokens"].to_numpy().astype(np.int64)
    want_start = np.cumsum(n) - n
    assert (got["token_start"].to_numpy() == want_start).all()
    assert (got["chunk_id"].to_numpy() == want_start // TOKEN_BUDGET).all()
    # independent ground truth for n_tokens on a sample of raw texts
    raw = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas().head(20)
    merged = raw.merge(got, on="doc_id")
    assert (merged["n_tokens"] ==
            merged["text"].str.split(" ").str.len()).all()
    # forced non-default range count → identical manifest
    alt = pack_sequences(SF, n_parts=7).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.equals(alt)


def test_contamination_counts_match_bruteforce(ray_session):
    """Planted check: every non-benchmark doc's count equals a direct
    python set-intersection against the benchmark shingle union."""
    from kgref.ops.contamination import (BENCH_MOD, NGRAM, _shingle_list,
                                         contamination)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    bench = set()
    for t in docs[docs["doc_id"] % BENCH_MOD == 0]["text"]:
        bench.update(_shingle_list(t, NGRAM))
    assert bench, "fixture must contain at least one benchmark doc"
    got = contamination(SF).to_pandas().set_index("doc_id")["n_contaminated"]
    train = docs[docs["doc_id"] % BENCH_MOD != 0]
    assert len(got) == len(train)
    for _, row in train.head(50).iterrows():
        want = len(set(_shingle_list(row["text"], NGRAM)) & bench)
        assert got[row["doc_id"]] == want
    # the synthetic corpus shares vocabulary, so contamination must
    # actually fire somewhere — otherwise the op is vacuous
    assert (got > 0).any()


def test_tfidf_ranks_and_scores(ray_session):
    """Per-doc ranks are 1..k, rank-1 has the max fixed-point score, and
    scores match a direct sklearn-convention computation."""
    from kgref.ops.tfidf import TOP_K, tfidf_top_terms

    got = tfidf_top_terms(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n_docs = len(docs)
    df: dict[str, int] = {}
    tfs: dict[int, dict[str, int]] = {}
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        tfs[row["doc_id"]] = {t: toks.count(t) for t in set(toks)}
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) == min(TOP_K, len(tfs[doc_id]))
        want = {t: math.floor(
            c * (math.log((1 + n_docs) / (1 + df[t])) + 1) * 1e6 + 0.5) / 1e6
            for t, c in tfs[doc_id].items()}
        best = max(want.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
        top = g.iloc[0]
        assert abs(top["tfidf"] - want[top["term"]]) < 1e-9
        assert want[top["term"]] == best[1]
        if doc_id > 20:
            break


def test_sample_stratified_rates_and_determinism(ray_session):
    """Per-language keep decisions replicate the offset splitmix64
    stream; languages with higher configured rates keep more."""
    from kgref.ops.sampling import (DEFAULT_RATE, LANG_RATES, _STRAT_OFFSET,
                                    sample_stratified)

    got = sample_stratified(SF).to_pandas()
    again = sample_stratified(SF).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    M = 1 << 64

    def sm64(x):
        z = (x + 0x9E3779B97F4A7C15) % M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        return z ^ (z >> 31)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    want = {int(r["doc_id"]) for _, r in docs.iterrows()
            if sm64(int(r["doc_id"]) + _STRAT_OFFSET) % 100
            < LANG_RATES.get(r["lang"], DEFAULT_RATE)}
    assert set(got["doc_id"]) == want
    # en is configured 5x the default rate: its keep fraction must lead
    frac = (got.groupby("lang").size()
            / docs.groupby("lang").size()).dropna()
    assert frac["en"] > frac.drop(index=["en", "de"], errors="ignore").max()


def test_label_propagation_merges_transitive_chains(ray_session):
    """A-B, B-C (no A-C edge) must land in ONE component labeled by the
    min node; disjoint pairs stay separate; a long chain converges."""
    import ray.data as rd

    from kgref.ops.clusters import label_propagation

    def edges_of(pairs):
        t = pa.Table.from_pydict({
            "node": [a for a, b in pairs] + [b for a, b in pairs],
            "nbr": [b for a, b in pairs] + [a for a, b in pairs]})
        return rd.from_arrow(t.cast(pa.schema(
            [("node", pa.int64()), ("nbr", pa.int64())])))

    # chain 1-2-3 + disjoint pair (10, 11) + chain 20..27 (diameter 7)
    pairs = [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 27)]
    got = label_propagation(edges_of(pairs)).to_pandas()
    comp = dict(zip(got["doc_id"], got["cluster_id"]))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert all(comp[i] == 20 for i in range(20, 28))
    assert len(comp) == 13


def test_redact_pii_counts_and_placeholders(ray_session):
    """Planted PII is found, counted and replaced; clean rows get 0s."""
    from kgref.ops.pii import redact_batch

    col = pa.array([
        "mail me at a.b+c@x-corp.io today",
        "call 555-123-4567 or 555-999-0000",
        "server at 10.0.255.3 port 80",
        "clean text with no pii at all",
        "mixed: u@v.com 192.168.1.1 555-000-1111",
    ])
    out = redact_batch(col)
    red = out["text_redacted"].to_pylist()
    assert red[0] == "mail me at [EMAIL] today"
    assert red[1] == "call [PHONE] or [PHONE]"
    assert red[2] == "server at [IP] port 80"
    assert red[3] == "clean text with no pii at all"
    assert red[4] == "mixed: [EMAIL] [IP] [PHONE]"
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0, 1]
    assert out["n_phones"].to_pylist() == [0, 2, 0, 0, 1]
    assert out["n_ips"].to_pylist() == [0, 0, 1, 0, 1]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_histogram_quantiles_match_numpy(seed):
    """The histogram path must equal np.quantile(raw, method='linear')
    exactly (same continuous-quantile definition as quantile_cont)."""
    from kgref.ops.quantiles import QS, _histogram_quantiles

    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 50, size=rng.randint(1, 500)).astype(np.int64)
    v, c = np.unique(raw, return_counts=True)
    got = dict(_histogram_quantiles(v, c))
    for label, q in QS:
        want = float(np.floor(np.quantile(raw, q, method="linear")
                              * 10000 + 0.5) / 10000)
        assert got[label] == want, (label, got[label], want)


def test_chunk_batch_windows():
    """Window/stride arithmetic: chunk k covers [k*S, k*S+W); last
    chunk short but never empty; single-token and exact-boundary docs."""
    from kgref.ops.chunking import chunk_batch

    toks_a = [f"t{i}" for i in range(100)]   # 100 tokens: chunks at 0,48,96
    toks_b = ["x"]                            # 1 token: one chunk
    toks_c = [f"y{i}" for i in range(48)]     # exactly one stride: one chunk
    t = chunk_batch(pa.array([1, 2, 3], pa.int64()),
                    pa.array([" ".join(toks_a), " ".join(toks_b),
                              " ".join(toks_c)]),
                    window=64, stride=48).to_pandas()
    a = t[t["doc_id"] == 1].sort_values("chunk_idx")
    assert a["chunk_idx"].tolist() == [0, 1, 2]
    assert a["n_tokens"].tolist() == [64, 52, 4]
    assert a["chunk_text"].iloc[0] == " ".join(toks_a[0:64])
    assert a["chunk_text"].iloc[1] == " ".join(toks_a[48:100])
    assert a["chunk_text"].iloc[2] == " ".join(toks_a[96:100])
    assert t[t["doc_id"] == 2]["chunk_text"].tolist() == ["x"]
    assert t[t["doc_id"] == 3]["n_tokens"].tolist() == [48]


def test_topk_table_exact_at_tie_boundary():
    """Boundary ties must resolve doc_id-ascending, exactly like the
    SQL ORDER BY value DESC, doc_id LIMIT k."""
    from kgref.ops.topk import _topk_table

    ids = np.array([9, 5, 7, 3, 8], dtype=np.int64)
    vals = np.array([10, 10, 10, 12, 4], dtype=np.int64)  # three tie at 10
    t = _topk_table(ids, vals, 3).to_pandas()
    # want: (3,12), then ties at 10 by id asc: (5,10), (7,10)
    assert list(zip(t["doc_id"], t["n_chars"])) == [(3, 12), (5, 10), (7, 10)]
    # k >= n passthrough keeps total order
    t2 = _topk_table(ids, vals, 10).to_pandas()
    assert t2["doc_id"].tolist() == [3, 5, 7, 9, 8]


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """Independent oracle: pandas merge_asof (backward, exact matches
    allowed) on a right side deduped to max event_id per (user, ts) —
    the same tie contract as the SQL ASOF oracle, reached by a
    completely different code path."""
    from kgref.ops.events import asof_join

    got = (asof_join(SF, n_parts=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])
    right = (ev[ev["event_type"] == "purchase"]
             .sort_values(["user_id", "ts", "event_id"])
             .groupby(["user_id", "ts"], as_index=False).last())
    m = pd.merge_asof(ev.sort_values("ts"), right.sort_values("ts"),
                      on="ts", by="user_id", direction="backward",
                      suffixes=("", "_r"))
    hit = m["event_id_r"].notna()
    m["prev_purchase_id"] = np.where(hit, m["event_id_r"].fillna(-1), -1
                                     ).astype(np.int64)
    v4 = np.floor(m["value_r"].fillna(0).to_numpy() * 10000 + 0.5
                  ).astype(np.int64)
    m["prev_purchase_v4"] = np.where(hit, v4, -1)
    # since_us from the matched right row's ts: recover it by joining
    # the deduped right on (user_id, prev_purchase_id)
    rts = right.set_index(["user_id", "event_id"])["ts"]
    key = list(zip(m["user_id"], m["prev_purchase_id"]))
    prev_ts = pd.Series(
        [rts.get(k, pd.NaT) for k in key], index=m.index)
    left_us = m["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    prev_us = (prev_ts.fillna(m["ts"]).to_numpy()
               .astype("datetime64[us]").astype(np.int64))
    m["since_us"] = np.where(hit, left_us - prev_us, -1)
    want = (m[["event_id", "user_id", "ts", "event_type",
               "prev_purchase_id", "prev_purchase_v4", "since_us"]]
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: some events have a prior purchase, some do not
    assert (got["prev_purchase_id"] >= 0).any()
    assert (got["prev_purchase_id"] == -1).any()
    # every purchase matches itself at distance 0
    pur = got[got["event_type"] == "purchase"]
    self_rows = pur["prev_purchase_id"] == pur["event_id"]
    assert (pur.loc[self_rows, "since_us"] == 0).all()


def test_price_band_and_exists_joins(ray_session):
    """Range join vs pandas cut; semi/anti joins vs a brute-force
    groupby — plus the boundary contract: a price exactly on an edge
    lands in the band whose lo it equals (half-open intervals)."""
    from kgref.ops.relational import (BAND_EDGES, BIG_ORDER_PRICE,
                                      customers_anti_big,
                                      customers_semi_big,
                                      orders_price_band)

    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    band = pd.cut(orders["o_totalprice"], bins=BAND_EDGES, right=False,
                  labels=False)
    cents = np.floor(orders["o_totalprice"] * 100 + 0.5).astype(np.int64)
    want = (pd.DataFrame({"band_id": band, "cents": cents})
            .groupby("band_id").agg(n_orders=("cents", "size"),
                                    cents=("cents", "sum")))
    got = orders_price_band(SF).to_pandas().set_index("band_id")
    assert got["n_orders"].to_dict() == want["n_orders"].to_dict()
    assert (got["total"] * 100).round().astype(np.int64).to_dict() == \
        want["cents"].to_dict()
    # half-open boundary: searchsorted(side="right") - 1 puts an exact
    # edge value into the band it OPENS
    assert int(np.searchsorted(np.asarray(BAND_EDGES), 50_000.0,
                               side="right") - 1) == 1

    big = set(orders.loc[orders["o_totalprice"] >= BIG_ORDER_PRICE,
                         "o_custkey"])
    cust = pd.read_parquet(SF + "/customer.parquet",
                           columns=["c_custkey"])
    semi = set(customers_semi_big(SF).to_pandas()["c_custkey"])
    anti = set(customers_anti_big(SF).to_pandas()["c_custkey"])
    assert semi == big
    assert anti == set(cust["c_custkey"]) - big
    assert semi and anti  # non-degenerate both ways


def test_repetition_stats_match_counter_bruteforce(ray_session):
    """Per-doc top token/bigram mass vs a collections.Counter oracle,
    including the exact integer fixed-point rounding."""
    from collections import Counter

    from kgref.ops.textstats import repetition_stats

    got = repetition_stats(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    for d in docs[:120]:
        toks = d["text"].split(" ")
        n = len(toks)
        topc = Counter(toks).most_common(1)[0][1]
        want_tok = (2 * topc * 10_000 + n) // (2 * n)
        row = got.loc[d["doc_id"]]
        assert row["n_tokens"] == n
        assert row["top_token_frac4"] == want_tok
        if n >= 2:
            bg = Counter(zip(toks, toks[1:]))
            topg = bg.most_common(1)[0][1]
            want_bi = (2 * topg * 10_000 + (n - 1)) // (2 * (n - 1))
            assert row["top_bigram_frac4"] == want_bi
        else:
            assert row["top_bigram_frac4"] == 0
    # the generator repeats tokens: fractions must be non-trivial
    assert (got["top_token_frac4"] > 0).all()


def test_rollup_levels_are_consistent(ray_session):
    """Subtotals and the grand total must equal sums of the finest
    level — the algebraic contract of ROLLUP."""
    from kgref.ops.relational import orders_rollup

    t = orders_rollup(SF).to_pandas()
    fine = t[(t["status"] != "") & (t["priority"] != "")]
    subs = t[(t["status"] != "") & (t["priority"] == "")]
    tot = t[(t["status"] == "") & (t["priority"] == "")]
    assert len(tot) == 1
    assert tot["n_orders"].iloc[0] == fine["n_orders"].sum()
    for _, r in subs.iterrows():
        m = fine[fine["status"] == r["status"]]
        assert r["n_orders"] == m["n_orders"].sum()
        assert abs(r["total"] - m["total"].sum()) < 1e-6


def test_embed_quantize_bounds_and_exactness(ray_session):
    """int8 range respected, scale recovers the absmax, and the audit
    stats match a direct numpy recomputation."""
    from kgref.ops.quantize import embed_quantize

    got = embed_quantize(SF).to_pandas().set_index("vec_id").sort_index()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    m = m[order]
    scale = np.abs(m).max(axis=1)
    q = np.floor(m / scale[:, None] * 127 + 0.5)
    assert q.min() >= -127 and q.max() <= 127
    err = np.abs(m - q * scale[:, None] / 127).max(axis=1)
    assert (got["scale4"].to_numpy()
            == np.floor(scale * 10_000 + 0.5).astype(np.int64)).all()
    assert (got["sum_q"].to_numpy() == q.sum(axis=1).astype(np.int64)).all()
    assert (got["max_err6"].to_numpy()
            == np.floor(err * 1_000_000 + 0.5).astype(np.int64)).all()
    # reconstruction error bounded by half a quantization step
    assert (err <= scale / 127 * 0.5 + 1e-12).all()


def test_sample_per_lang_exact_k_and_stable(ray_session):
    """Exactly K rows per language, identical across runs, and equal to
    the brute-force smallest-hash-per-lang selection."""
    from kgref.ops.sampling import (RESERVOIR_K, _RES_OFFSET,
                                    sample_per_lang, splitmix64)

    a = sample_per_lang(SF).to_pandas().sort_values(
        ["lang", "rn"]).reset_index(drop=True)
    b = sample_per_lang(SF).to_pandas().sort_values(
        ["lang", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    docs["h"] = splitmix64(
        docs["doc_id"].to_numpy().astype(np.uint64)
        + np.uint64(_RES_OFFSET))
    want = (docs.sort_values(["lang", "h", "doc_id"])
            .groupby("lang").head(RESERVOIR_K))
    for lang, grp in a.groupby("lang"):
        assert len(grp) == RESERVOIR_K
        assert set(grp["doc_id"]) == set(
            want[want["lang"] == lang]["doc_id"])


def test_rolling_window_includes_peers_at_equal_ts(ray_session, tmp_path):
    """RANGE-window contract: rows sharing a timestamp are peers — every
    one of them sees the full peer group (unlike a ROWS frame)."""
    from kgref.ops.events import rolling_window

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600 * 10**6, "us")
    rows = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        # u7: two peers at t0, one inside the window, one outside
        "ts": pa.array([ts0, ts0, ts0 + h // 2, ts0 + 3 * h, ts0]),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0])})
    pq.write_table(rows, tmp_path / "events.parquet")

    got = (rolling_window(str(tmp_path), n_parts=2).to_pandas()
           .set_index("event_id").sort_index())
    assert got.loc[1, "n_1h"] == 2 and got.loc[2, "n_1h"] == 2  # peers
    assert got.loc[1, "sum_v4_1h"] == 30000  # 1.0 + 2.0
    assert got.loc[3, "n_1h"] == 3           # peers + itself
    assert got.loc[3, "sum_v4_1h"] == 70000
    assert got.loc[4, "n_1h"] == 1           # window expired
    assert got.loc[5, "n_1h"] == 1           # other user isolated


def test_left_outer_join_keeps_zero_count_customers(ray_session):
    """Native left_outer Dataset.join: customers with no qualifying
    order must appear with n_big = 0 (the rows an inner join drops)."""
    from kgref.ops.relational import (BIG_ORDER_PRICE,
                                      customer_big_order_counts)

    got = customer_big_order_counts(SF).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    want = (orders[orders["o_totalprice"] >= BIG_ORDER_PRICE]
            .groupby("o_custkey").size())
    cust = pd.read_parquet(SF + "/customer.parquet",
                           columns=["c_custkey"])
    assert len(got) == len(cust)  # every customer survives
    g = got.set_index("c_custkey")["n_big"]
    zero = g[g == 0]
    assert len(zero) > 0  # non-degenerate
    for k in cust["c_custkey"]:
        assert g[k] == want.get(k, 0)


def test_dedup_apply_drops_exactly_the_cluster_losers(ray_session):
    """Applied corpus = documents minus (clustered docs that are not
    their cluster's min) — cross-checked against dedup_clusters."""
    from kgref.ops.clusters import dedup_apply, dup_clusters

    clusters = dup_clusters(SF).to_pandas()
    losers = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                              "doc_id"])
    kept = set(dedup_apply(SF).to_pandas()["doc_id"])
    all_docs = set(pq.read_table(f"{SF}/documents.parquet",
                                 columns=["doc_id"])["doc_id"].to_pylist())
    assert losers  # non-degenerate
    assert kept == all_docs - losers
    # every cluster's keeper survived
    assert set(clusters["cluster_id"]) <= kept


def test_lm_surprisal_matches_counter_bruteforce(ray_session):
    """Two-pass LM scoring vs a pure-Python Counter model: exact
    integer weights, rare tokens weigh more than common ones."""
    from collections import Counter

    from kgref.ops.lm import W_NUM, lm_surprisal

    got = lm_surprisal(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    model = Counter()
    for d in docs:
        model.update(d["text"].split(" "))
    for d in docs[:100]:
        toks = d["text"].split(" ")
        want = sum(W_NUM // model[t] for t in toks)
        row = got.loc[d["doc_id"]]
        assert row["surprisal"] == want
        assert row["n_tokens"] == len(toks)
    # a doc made rarer by construction would score higher: check the
    # monotonicity on the model itself
    counts = sorted(model.values())
    assert W_NUM // counts[0] >= W_NUM // counts[-1]


def test_length_rank_matches_pandas_rank(ray_session):
    """Global min-rank without a global sort vs pandas rank(method='min')."""
    from kgref.ops.quantiles import length_rank

    got = length_rank(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    want = docs.set_index("doc_id")["n_chars"].rank(method="min")
    assert (got["rnk"] == want.astype(np.int64)).all()
    assert got["rnk"].min() == 1


def test_kmv_estimate_within_error_band(ray_session):
    """KMV distinct estimate lands within ~3σ of the true distinct
    count (σ ≈ 1/√(k−2)); duplicate hashes are deduped before the
    k-min selection."""
    from kgref.ops.sketch import KMV_K, distinct_estimate

    t = distinct_estimate(SF).to_pandas()
    assert len(t) == 1
    true = len(set(pq.read_table(f"{SF}/documents.parquet",
                                 columns=["text"])["text"].to_pylist()))
    est = int(t["est_distinct"].iloc[0])
    rel = 3.0 / np.sqrt(KMV_K - 2)
    assert abs(est - true) <= rel * true, (est, true)


# ---------------------------------------------------------------------------
# property tests for the event-kernel transforms (pure pandas, no Ray)


def _random_events(seed: int, n: int):
    rng = np.random.RandomState(seed)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    # coarse time grid with deliberate COLLISIONS (peers at equal ts)
    offs = rng.randint(0, 50, size=n) * np.timedelta64(600 * 10**6, "us")
    return pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "user_id": rng.randint(0, 4, size=n).astype(np.int64),
        "ts": ts0 + offs,
        "event_type": rng.choice(["purchase", "view"], size=n),
        "value": rng.randint(0, 1000, size=n) / 10.0,
    })


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_rolling_kernel_matches_bruteforce(seed):
    from kgref.ops.events import _roll_pandas

    df = _random_events(seed, 60)
    W = 3600 * 10**6
    got = (_roll_pandas(df, W).set_index("event_id").sort_index())
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    v4 = np.floor(df["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    for i, eid in enumerate(df["event_id"]):
        inw = ((df["user_id"] == df["user_id"].iloc[i])
               & (ts_us <= ts_us[i]) & (ts_us >= ts_us[i] - W))
        assert got.loc[eid, "n_1h"] == inw.sum()
        assert got.loc[eid, "sum_v4_1h"] == v4[inw].sum()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_asof_kernel_matches_bruteforce(seed):
    from kgref.ops.events import _asof_pandas

    df = _random_events(seed, 60)
    got = (_asof_pandas(df, "purchase").set_index("event_id").sort_index())
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    for i, eid in enumerate(df["event_id"]):
        cand = df[(df["user_id"] == df["user_id"].iloc[i])
                  & (df["event_type"] == "purchase")
                  & (ts_us <= ts_us[i])]
        if len(cand):
            # greatest ts; tie-break max event_id
            c = cand.sort_values(["ts", "event_id"]).iloc[-1]
            assert got.loc[eid, "prev_purchase_id"] == c["event_id"]
            want_v4 = int(np.floor(c["value"] * 10000 + 0.5))
            assert got.loc[eid, "prev_purchase_v4"] == want_v4
        else:
            assert got.loc[eid, "prev_purchase_id"] == -1
            assert got.loc[eid, "since_us"] == -1


def test_user_pivot_counts_match_crosstab(ray_session):
    from kgref.ops.events import PIVOT_TYPES, user_type_pivot

    got = (user_type_pivot(SF).to_pandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "event_type"])
    want = pd.crosstab(ev["user_id"], ev["event_type"])
    for t in PIVOT_TYPES:
        w = want[t] if t in want.columns else 0
        assert (got[f"n_{t}"] == w).all()
    assert got.to_numpy().sum() == len(ev)


@pytest.mark.parametrize("seed", [0, 1])
def test_levenshtein_kernel_matches_bruteforce(seed):
    from kgref.ops.dedup import _levenshtein

    rng = np.random.RandomState(seed)

    def brute(a, b):
        m, n = len(a), len(b)
        d = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            d[i][0] = i
        for j in range(n + 1):
            d[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[m][n]

    alpha = "abcde"
    for _ in range(60):
        a = "".join(rng.choice(list(alpha))
                    for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice(list(alpha))
                    for _ in range(rng.randint(0, 15)))
        assert _levenshtein(a, b) == brute(a, b), (a, b)


# ---------------------------------------------------------------------------
# guard regressions (ADVICE r3): out-of-domain values must match the SQL
# twin's semantics instead of corrupting vectorized accumulators


def test_pivot_keeps_users_with_unknown_event_types(ray_session, tmp_path):
    """event_type outside PIVOT_TYPES: SQL's FILTER counts 0 but GROUP
    BY keeps the user row; the bincount grid must do the same (a null
    index_in code used to corrupt the grid)."""
    import duckdb

    from kgref.ops.events import user_type_pivot, user_type_pivot_sql

    rows = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "event_type": ["click", "weird_type", "view", "alien", "alien"],
    })
    pq.write_table(rows, tmp_path / "events.parquet")
    got = (user_type_pivot(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = (con.execute(user_type_pivot_sql()).df()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert set(got["user_id"]) == {1, 2, 3}  # user 3: all-unknown, kept


def test_price_band_drops_out_of_range_prices(ray_session, tmp_path):
    """A price below band 0 or >= the last edge must be dropped like the
    oracle's inner join (used to wrap to the last band / IndexError)."""
    import duckdb

    from kgref.ops.relational import orders_price_band, orders_price_band_sql

    rows = pa.table({
        "o_totalprice": pa.array([-5.0, 1000.0, 75_000.0, 599_999.0,
                                  600_000.0, 1e9], pa.float64()),
    })
    pq.write_table(rows, tmp_path / "orders.parquet")
    got = (orders_price_band(str(tmp_path)).to_pandas()
           .sort_values("band_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    want = (con.execute(orders_price_band_sql()).df()
            .sort_values("band_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert int(got["n_orders"].sum()) == 3  # -5, 600000, 1e9 dropped


def test_quantize_zero_vector_is_defined(ray_session, tmp_path):
    """An all-zero embedding must quantize to q=0 / err=0 on both sides
    (scale 0 used to produce NaN/inf casts)."""
    import duckdb

    from kgref.ops.quantize import embed_quantize, embed_quantize_sql

    rows = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.0, 0.0, 0.0], [0.5, -1.0, 0.25]],
                              pa.list_(pa.float32())),
    })
    pq.write_table(rows, tmp_path / "embeddings.parquet")
    got = (embed_quantize(str(tmp_path)).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    zero = got[got["vec_id"] == 0].iloc[0]
    assert zero["scale4"] == 0 and zero["sum_q"] == 0
    assert zero["max_err6"] == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = (con.execute(embed_quantize_sql()).df()
            .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_distinct_estimate_emits_exactly_one_row(ray_session, tmp_path):
    """>16 read batches of partials must still collapse into ONE finish
    row (the default finish batch_size used to split the final block)."""
    from kgref.ops.sketch import KMV_K, distinct_estimate

    import hashlib

    n = 20_000  # >> 1024-row finish batches' worth of 64-row partials
    # md5 hex payloads: the KMV estimator assumes uniform hash values;
    # sequential-suffix texts cluster under the polynomial fold and
    # would test the hash's avalanche, not the 1-row finish contract
    rows = pa.table({"text": [
        hashlib.md5(str(i).encode()).hexdigest() for i in range(n)]})
    pq.write_table(rows, tmp_path / "documents.parquet",
                   row_group_size=500)  # force many read batches
    got = distinct_estimate(str(tmp_path)).to_pandas()
    assert len(got) == 1
    est = int(got["est_distinct"].iloc[0])
    tol = 5 / math.sqrt(KMV_K - 2)  # ~5 sigma of the KMV error band
    assert abs(est - n) <= tol * n


def test_fold_m61_bit_identical_to_horner():
    """fold_m61_many (the shared numpy codepoint fold, kgref/ops/m61.py)
    must be bit-identical to the scalar Horner definition every SQL twin
    replicates — across empty strings, non-BMP codepoints, long strings
    and a high-entropy vocabulary (the regime that defeats the old
    per-token memo, VERDICT r3 'What's wrong' #3)."""
    import hashlib

    from kgref.ops.m61 import FOLD_BASE, FOLD_MOD, fold_m61_many

    def horner(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * FOLD_BASE + ord(ch)) % FOLD_MOD
        return h

    texts = ["", "a", "hello world", "café naïve",
             "\U0001F600 non-bmp \U0001F680 mix",  # astral plane
             "x" * 5000,
             *(hashlib.sha256(str(i).encode()).hexdigest()
               for i in range(200))]
    got = fold_m61_many(texts)
    want = np.array([horner(t) for t in texts], dtype=np.uint64)
    assert got.dtype == np.uint64
    np.testing.assert_array_equal(got, want)
    # all-empty and empty-list edge paths
    np.testing.assert_array_equal(fold_m61_many(["", ""]),
                                  np.zeros(2, np.uint64))
    assert len(fold_m61_many([])) == 0


def test_fp_token_hash_matches_fold():
    """doc_fingerprint's batched fold must agree with the legacy
    memoized _fp_token_hash token-by-token (they share constants)."""
    from kgref.ops.m61 import fold_m61_many
    from kgref.ops.textstats import _fp_token_hash

    toks = ["the", "quick", "", "brown", "fox", "ümläut",
            "0123456789abcdef" * 8]
    got = fold_m61_many(toks)
    want = np.array([_fp_token_hash(t) for t in toks], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_heavy_hitters_exact_vs_python(ray_session):
    """Two-pass heavy hitters must return EXACTLY the tokens with
    corpus frequency > N/k with their exact counts, in (count desc,
    token asc) order — the candidate pruning is an optimization, not an
    approximation."""
    from collections import Counter

    from kgref.ops.heavyhitters import HH_K, heavy_hitters

    got = heavy_hitters(SF).to_pandas()
    c = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet",
                           columns=["text"]).column("text").to_pylist():
        c.update(t.split(" "))
    n = sum(c.values())
    want = sorted(((w, m) for w, m in c.items() if m * HH_K > n),
                  key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got["token"], got["n_total"])) == want
    assert want  # non-vacuous: the corpus does have heavy tokens


def test_heavy_hitters_residual_bound_is_superset_and_small():
    """The r5 phase-1 invariant (VERDICT r4 Next #4): with per-batch
    residuals r_b(t) = freq_b(t) − ⌊N_b/2k⌋ summed per token, every
    global heavy hitter satisfies R(t)·2k > N, and fewer than 2k tokens
    can pass (residuals sum to ≤ N) — so the driver-resident candidate
    set is corpus-size-INDEPENDENT, not k·#batches.  Exercise it
    adversarially over many batches: thinly-spread tokens must never
    survive, concentrated heavy ones must."""
    from collections import Counter

    batches = [["x"] * 9 + [f"spread{i % 3}"] for i in range(200)]
    batches.append(["hot"] * 600 + ["x"] * 10)
    flat = [t for b in batches for t in b]
    n, k = len(flat), 5
    m = 2 * k
    R: Counter = Counter()
    for b in batches:
        nb = len(b)
        for w, f in Counter(b).items():
            r = f - nb // m
            if r > 0:
                R[w] += r
    survivors = {w for w, rr in R.items() if rr * m > n}
    globally_heavy = {w for w, c in Counter(flat).items() if c * k > n}
    assert globally_heavy <= survivors  # the superset guarantee
    assert len(survivors) < m  # corpus-size-independent candidate bound
    assert {"hot", "x"} <= globally_heavy
    assert not any(w.startswith("spread") for w in survivors)


def test_inverted_index_artifact_roundtrip(ray_session, tmp_path):
    """The posting-list shards written worker-side must reconstruct the
    exact distinct (token, doc_id) pair set of the corpus, lists sorted,
    one shard per token-hash bucket, df consistent with list length."""
    from kgref.ops.invindex import inverted_index

    out = str(tmp_path / "idx")
    proj = inverted_index(SF, num_buckets=8, out_dir=out).to_pandas()

    import glob

    got_pairs = set()
    for f in glob.glob(out + "/postings-*.parquet"):
        shard = pq.read_table(f)
        for tok, dfreq, post in zip(shard.column("token").to_pylist(),
                                    shard.column("df").to_pylist(),
                                    shard.column("postings").to_pylist()):
            assert dfreq == len(post)
            assert post == sorted(post)
            got_pairs |= {(tok, d) for d in post}

    want_pairs = set()
    for r in pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).to_pylist():
        want_pairs |= {(w, r["doc_id"]) for w in r["text"].split(" ")}
    assert got_pairs == want_pairs
    # the projection agrees with the artifact
    assert set(proj["token"]) == {t for t, _ in want_pairs}
    assert int(proj["df"].sum()) == len(want_pairs)


def test_cooccur_components_label_by_min_uri(ray_session):
    """Component labels must be the lexicographically smallest member
    URI — pinned on the real corpus by checking internal consistency:
    every component label is a member of its own component and is its
    minimum."""
    from kgref.ops.kgraph import cooccur_components

    got = cooccur_components(SF).to_pandas()
    assert len(got)
    by_comp = got.groupby("component")["class_uri"].apply(set)
    for comp, members in by_comp.items():
        assert comp == min(members)
        assert comp in members


def test_class_pagerank_matches_naive_fixed_point(ray_session):
    """The distributed 3-iteration fixed-point PageRank must equal a
    pure-numpy single-process reimplementation of the same arithmetic
    (per-edge floor of p*w//wsum, then BASE + 85*sum//100) exactly —
    pins the exchange/merge plumbing against the spec."""
    import numpy as np

    from kgref.ops.kgraph import (PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM,
                                  PR_ITERS, PR_SCALE, class_cooccurrence,
                                  class_pagerank)

    edges = class_cooccurrence(SF).take_all()
    uris = sorted({r["class_a"] for r in edges}
                  | {r["class_b"] for r in edges})
    idx = {u: i for i, u in enumerate(uris)}
    n = len(uris)
    a = np.array([idx[r["class_a"]] for r in edges], np.int64)
    b = np.array([idx[r["class_b"]] for r in edges], np.int64)
    w = np.array([r["n_turns"] for r in edges], np.int64)
    src, dst, ww = np.r_[a, b], np.r_[b, a], np.r_[w, w]
    wsum = np.zeros(n, np.int64)
    np.add.at(wsum, src, ww)
    p = np.full(n, PR_SCALE, np.int64)
    for _ in range(PR_ITERS):
        contrib = (p[src] * ww) // wsum[src]
        s = np.zeros(n, np.int64)
        np.add.at(s, dst, contrib)
        p = PR_BASE + (PR_DAMP_NUM * s) // PR_DAMP_DEN
    want = {u: int(p[i]) for u, i in idx.items()}

    got = class_pagerank(SF).to_pandas()
    assert len(got) == n
    assert {r.class_uri: int(r.pagerank)
            for r in got.itertuples()} == want


def test_class_triangles_matches_bruteforce(ray_session):
    """Forward-wedge triangle counts must equal brute-force enumeration
    over the (small at sf0.001) co-occurrence edge set."""
    from itertools import combinations

    from kgref.ops.kgraph import class_cooccurrence, class_triangles

    edges = class_cooccurrence(SF).take_all()
    eset = {(r["class_a"], r["class_b"]) for r in edges}
    nodes = sorted({x for e in eset for x in e})
    want: dict[str, int] = {}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in eset and (x, z) in eset and (y, z) in eset):
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1

    got = class_triangles(SF).to_pandas()
    assert {r.class_uri: int(r.n_triangles)
            for r in got.itertuples()} == want
    assert want  # non-degenerate: the fixture graph has triangles


def test_class_bfs_matches_bruteforce(ray_session):
    """Distributed bounded-hop BFS must equal a driver-side BFS over
    the same co-occurrence edges from the lexicographically smallest
    URI, capped at BFS_MAX_HOPS."""
    from collections import deque

    from kgref.ops.kgraph import (BFS_MAX_HOPS, class_bfs,
                                  class_cooccurrence)

    edges = class_cooccurrence(SF).take_all()
    adj: dict[str, set[str]] = {}
    for r in edges:
        adj.setdefault(r["class_a"], set()).add(r["class_b"])
        adj.setdefault(r["class_b"], set()).add(r["class_a"])
    seed = min(adj)
    want = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if want[u] >= BFS_MAX_HOPS:
            continue
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)

    got = class_bfs(SF).to_pandas()
    assert {r.class_uri: int(r.dist) for r in got.itertuples()} == want
    assert want[seed] == 0 and len(want) > 1


def test_class_jaccard_matches_bruteforce(ray_session):
    """Common-neighbor counts and integer ppm Jaccard must equal the
    set-arithmetic brute force over neighbor sets."""
    from itertools import combinations

    from kgref.ops.kgraph import class_cooccurrence, class_jaccard

    edges = class_cooccurrence(SF).take_all()
    adj: dict[str, set[str]] = {}
    for r in edges:
        adj.setdefault(r["class_a"], set()).add(r["class_b"])
        adj.setdefault(r["class_b"], set()).add(r["class_a"])
    want = {}
    for x, y in combinations(sorted(adj), 2):
        common = len(adj[x] & adj[y])
        if common:
            union = len(adj[x] | adj[y])
            want[(x, y)] = (common, (1_000_000 * common) // union)

    got = class_jaccard(SF).to_pandas()
    assert {(r.class_a, r.class_b): (int(r.common), int(r.jaccard_ppm))
            for r in got.itertuples()} == want
    assert want  # non-degenerate


def test_class_clustering_matches_bruteforce(ray_session):
    """cc_ppm must equal 10^6·2·triangles // (deg·(deg−1)) computed
    from brute-force triangle enumeration, for every class of
    degree ≥ 2 (and only those)."""
    from itertools import combinations

    from kgref.ops.kgraph import class_clustering, class_cooccurrence

    edges = class_cooccurrence(SF).take_all()
    eset = {(r["class_a"], r["class_b"]) for r in edges}
    adj: dict[str, set[str]] = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri: dict[str, int] = {}
    for x, y, z in combinations(sorted(adj), 3):
        if ((x, y) in eset and (x, z) in eset and (y, z) in eset):
            for v in (x, y, z):
                tri[v] = tri.get(v, 0) + 1
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d >= 2:
            t = tri.get(v, 0)
            want[v] = (d, t, (1_000_000 * 2 * t) // (d * (d - 1)))

    got = class_clustering(SF).to_pandas()
    assert {r.class_uri: (int(r.degree), int(r.n_triangles),
                          int(r.cc_ppm))
            for r in got.itertuples()} == want


def test_conv_dominant_class_matches_pandas(ray_session):
    """Grouped mode with (count desc, uri asc) tie-break must match a
    driver-side pandas recomputation over the same triples."""
    from kgref.ops.kgraph import _direct_triples, conv_dominant_class

    tri = _direct_triples(SF).to_pandas()
    counts = (tri.groupby(["conv_id", "obj"]).size().reset_index(name="n")
              .sort_values(["conv_id", "n", "obj"],
                           ascending=[True, False, True], kind="stable")
              .drop_duplicates("conv_id", keep="first"))
    want = {r.conv_id: (r.obj, int(r.n)) for r in counts.itertuples()}

    got = conv_dominant_class(SF).to_pandas()
    assert {r.conv_id: (r.dominant_class, int(r.n))
            for r in got.itertuples()} == want
    assert len(want) > 1


def test_range_partition_matches_spec(ray_session):
    """Partition boundaries and per-partition stats must equal the
    integer-predicate spec (B_i = min v with cum·P ≥ i·n) applied
    driver-side; every doc lands in exactly one partition and equal
    keys never straddle a boundary."""
    from kgref.ops.quantiles import RANGE_PARTS, range_partition

    lens = pq.read_table(f"{SF}/documents.parquet",
                         columns=["n_chars"])["n_chars"].to_numpy()
    vs, cs = np.unique(lens, return_counts=True)
    cum = np.cumsum(cs)
    n = int(cum[-1])
    bounds = np.array(
        [vs[np.searchsorted(cum * RANGE_PARTS, i * n, side="left")]
         for i in range(1, RANGE_PARTS)])
    pid = np.searchsorted(bounds, lens, side="right")
    want = {}
    for p in np.unique(pid):
        sel = lens[pid == p]
        want[int(p)] = (len(sel), int(sel.min()), int(sel.max()))

    got = range_partition(SF).to_pandas()
    assert {int(r.partition_id): (int(r.n_docs), int(r.min_len),
                                  int(r.max_len))
            for r in got.itertuples()} == want
    assert sum(v[0] for v in want.values()) == n
    # ranges are disjoint and ordered
    rows = sorted(want.items())
    for (p1, (_, _, hi)), (p2, (_, lo, _)) in zip(rows, rows[1:]):
        assert hi <= lo


def test_class_by_lang_matches_pandas_join(ray_session):
    """The native-join enrichment must equal a driver-side merge of
    the triples (doc_id recovered arithmetically) with documents."""
    from kgref.ops.kgraph import _TURNS_PER_CONV, _direct_triples, class_by_lang

    tri = _direct_triples(SF).to_pandas()
    tri["doc_id"] = (tri["conv_id"].str[5:].astype(np.int64)
                     * _TURNS_PER_CONV + tri["turn_idx"])
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    m = tri.merge(docs, on="doc_id", how="inner")
    want = (m.groupby(["obj", "lang"]).size().to_dict())

    got = class_by_lang(SF).to_pandas()
    assert {(r.class_uri, r.lang): int(r.n)
            for r in got.itertuples()} == want
    assert len(got) and got["lang"].nunique() > 1


def test_transitive_closure_deep_chain(ray_session):
    """A depth-10 chain plus a diamond forces ~9 relaxation rounds and
    a min-distance tie; the distributed closure must equal a driver BFS
    on both, and converge by row-count fixpoint (not the round cap)."""
    from kgref.ops.closure import transitive_closure

    # chain 0→1→2→…→10; diamond 20→{21,22}→23 and a direct 20→23
    child = np.array(list(range(10)) + [20, 20, 21, 22, 20], np.int64)
    parent = np.array(list(range(1, 11)) + [21, 22, 23, 23, 23], np.int64)

    adj: dict[int, list[int]] = {}
    for c, p in zip(child, parent):
        adj.setdefault(int(c), []).append(int(p))
    want = {}
    for start in set(child.tolist()):
        frontier, dist = {start}, 0
        while frontier:
            dist += 1
            nxt = set()
            for n in frontier:
                for p in adj.get(n, ()):
                    if (start, p) not in want:
                        want[(start, p)] = dist
                        nxt.add(p)
            frontier = nxt

    got = transitive_closure(child, parent).to_pandas()
    assert {(int(r.node), int(r.anc)): int(r.d)
            for r in got.itertuples()} == want
    # chain depth: node 0 reaches node 10 at distance 10
    assert want[(0, 10)] == 10
    # diamond min-distance: 20→23 direct edge wins over the 2-hop paths
    assert want[(20, 23)] == 1


def test_isa_closure_full_matches_docdict(ray_session):
    """The distributed closure over the docdict parent edges must equal
    the docdict driver BFS (the same table the annotate family
    broadcasts)."""
    from kgref.docdict import _closure
    from kgref.ops.closure import isa_closure_full

    want = {(a, b): d for a, b, d in _closure()}
    got = isa_closure_full(SF).to_pandas()
    assert {(r.class_uri, r.ancestor_uri): int(r.distance)
            for r in got.itertuples()} == want
    assert max(want.values()) >= 2  # multi-round: depth ≥ 2 exists


def test_class_rollup_matches_pandas(ray_session):
    """Direct and up-the-DAG rolled-up annotation counts must match a
    driver-side recomputation from the same triples + docdict closure."""
    from kgref.docdict import _closure
    from kgref.ops.kgraph import _direct_triples, class_rollup

    tri = _direct_triples(SF).to_pandas()
    direct = tri.groupby("obj").size().to_dict()
    anc_of: dict[str, list[str]] = {}
    for a, b, _d in _closure():
        anc_of.setdefault(a, []).append(b)
    roll: dict[str, int] = {}
    for c, n in direct.items():
        for t in [c] + anc_of.get(c, []):
            roll[t] = roll.get(t, 0) + n

    got = class_rollup(SF).to_pandas()
    assert {r.class_uri: (int(r.n_direct), int(r.n_rollup))
            for r in got.itertuples()} == {
        t: (direct.get(t, 0), n) for t, n in roll.items()}
    # non-degenerate: some ancestor has rollup > its direct count
    assert any(n > direct.get(t, 0) for t, n in roll.items())


def test_transitive_closure_random_dag(ray_session):
    """A 200-node random DAG (edges only point to higher ids, ~2.5
    parents/node, depth well past the fixture's 3) must match the
    driver BFS pair-for-pair — pins the distributed relaxation at a
    closure size (~10^4 pairs) where multiple rounds genuinely
    interleave with a quadratic-ish state table."""
    from kgref.ops.closure import transitive_closure

    n = 200
    rng = np.random.default_rng(7)
    child_l, parent_l = [], []
    for c in range(n - 1):
        k = int(rng.integers(1, 4))
        ps = rng.integers(c + 1, n, size=k)
        for p in set(ps.tolist()):
            child_l.append(c)
            parent_l.append(p)
    child = np.array(child_l, np.int64)
    parent = np.array(parent_l, np.int64)

    adj: dict[int, set[int]] = {}
    for c, p in zip(child_l, parent_l):
        adj.setdefault(c, set()).add(p)
    want: dict[tuple[int, int], int] = {}
    for start in range(n):
        frontier, dist = adj.get(start, set()), 1
        seen = dict.fromkeys(frontier, 1)
        while frontier:
            dist += 1
            nxt = set()
            for u in frontier:
                for p in adj.get(u, ()):
                    if p not in seen:
                        seen[p] = dist
                        nxt.add(p)
            frontier = nxt
        for anc, d in seen.items():
            want[(start, anc)] = d

    got = transitive_closure(child, parent).to_pandas()
    assert len(got) == len(want)
    assert {(int(r.node), int(r.anc)): int(r.d)
            for r in got.itertuples()} == want
    assert max(want.values()) >= 5  # non-trivial depth reached


def test_class_lift_matches_bruteforce(ray_session):
    """Exact integer lift must equal the set-arithmetic brute force:
    10^6·|turns(a)∩turns(b)|·|turns| // (|turns(a)|·|turns(b)|)."""
    from kgref.ops.kgraph import _direct_triples, class_lift

    tri = _direct_triples(SF).to_pandas()
    tri["turn"] = tri["conv_id"].astype(str) + "\x1f" + tri["turn_idx"].astype(str)
    turns_of: dict[str, set[str]] = {}
    for r in tri.itertuples():
        turns_of.setdefault(r.obj, set()).add(r.turn)
    total = len(set(tri["turn"]))
    want = {}
    from itertools import combinations
    for x, y in combinations(sorted(turns_of), 2):
        nab = len(turns_of[x] & turns_of[y])
        if nab:
            want[(x, y)] = (nab, (1_000_000 * nab * total)
                            // (len(turns_of[x]) * len(turns_of[y])))

    got = class_lift(SF).to_pandas()
    assert {(r.class_a, r.class_b): (int(r.n_ab), int(r.lift_ppm))
            for r in got.itertuples()} == want
    assert want and any(v[1] < 1_000_000 for v in want.values())


def test_disambiguate_spans_matches_pandas(ray_session):
    """Coherence vote (conv-level count desc, uri asc) must match a
    driver-side recomputation; only spans with >= 2 candidate classes
    appear, and the fixture's planted ambiguity ("spark" in DOC and
    ALT) must be exercised."""
    from kgref.ops.kgraph import _direct_triples, disambiguate_spans

    tri = _direct_triples(SF).to_pandas()
    votes = tri.groupby(["conv_id", "obj"]).size().to_dict()
    key = ["conv_id", "turn_idx", "from_1b", "to_1b"]
    cand = tri.drop_duplicates(key + ["obj"])
    want = {}
    for k, grp in cand.groupby(key):
        objs = sorted(grp["obj"])
        if len(objs) >= 2:
            best = max(objs, key=lambda o: (votes[(k[0], o)],
                                            [-ord(c) for c in o]))
            want[k] = (best, len(objs), votes[(k[0], best)])

    got = disambiguate_spans(SF).to_pandas()
    gk = {(r.conv_id, int(r.turn_idx), int(r.from_1b), int(r.to_1b)):
          (r.chosen_class, int(r.n_candidates), int(r.votes))
          for r in got.itertuples()}
    want = {(k[0], int(k[1]), int(k[2]), int(k[3])): v
            for k, v in want.items()}
    assert gk == want
    assert want  # the planted DOC#Spark / ALT#AltSpark ambiguity fires


def test_entity_components_same_as_resolution(ray_session):
    """Mapping-graph components must equal a driver union-find, labeled
    by min URI; the fixture's shared target (Join and HashJoin both map
    to ALT#Junction) must produce one 3-member entity."""
    from kgref.docdict import tables
    from kgref.ops.kgraph import entity_components

    mp = tables()["mappings"]
    edges = list(zip(mp.column("class_uri").to_pylist(),
                     mp.column("mapped_class_uri").to_pylist()))
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[str, str] = {}
    for u in parent:
        want[u] = find(u)

    got = entity_components(SF).to_pandas()
    assert {r.class_uri: r.entity_id for r in got.itertuples()} == want
    sizes = got.groupby("entity_id").size()
    assert sizes.max() >= 3  # the Join/HashJoin/Junction entity


def test_transitive_closure_multi_seed_small_graphs(ray_session):
    """Three deterministic seeds × 40-node sparse DAGs (including
    disconnected nodes and multi-parent diamonds) must all match the
    driver BFS — guards the relax kernel's empty-partition and
    pass-through paths across graph shapes."""
    from kgref.ops.closure import transitive_closure

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 40
        child_l, parent_l = [], []
        for c in range(n - 1):
            if rng.random() < 0.3:  # leave ~30% of nodes parentless
                continue
            for p in set(rng.integers(c + 1, n, size=2).tolist()):
                child_l.append(c)
                parent_l.append(p)
        if not child_l:
            continue
        adj: dict[int, set[int]] = {}
        for c, p in zip(child_l, parent_l):
            adj.setdefault(c, set()).add(p)
        want: dict[tuple[int, int], int] = {}
        for start in range(n):
            frontier, dist = set(adj.get(start, ())), 1
            seen = dict.fromkeys(frontier, 1)
            while frontier:
                dist += 1
                nxt = set()
                for u in frontier:
                    for p in adj.get(u, ()):
                        if p not in seen:
                            seen[p] = dist
                            nxt.add(p)
                frontier = nxt
            for anc, d in seen.items():
                want[(start, anc)] = d
        got = transitive_closure(
            np.array(child_l, np.int64),
            np.array(parent_l, np.int64)).to_pandas()
        assert {(int(r.node), int(r.anc)): int(r.d)
                for r in got.itertuples()} == want, f"seed {seed}"


def test_kgraph_cores_on_forced_large_edge_sets(ray_session):
    """r4 What's-wrong #1 done-criterion: the graph analytics must run
    with edge count ≫ node count and without any driver-side edge
    materialization — exercised through the int-edge seams
    (_pagerank_nodes / _triangles_nodes / _bfs_nodes /
    _components_nodes) over three random dense graphs (n=40,
    density 0.4 → E ≈ 312 ≈ 8n), each checked against a pure-numpy
    reimplementation of the same arithmetic."""
    from itertools import combinations

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kgref.ops.kgraph import (BFS_MAX_HOPS, PR_BASE, PR_DAMP_DEN,
                                  PR_DAMP_NUM, PR_ITERS, PR_SCALE,
                                  _bfs_nodes, _components_nodes,
                                  _pagerank_nodes, _triangles_nodes)

    for seed in (7, 19, 42):
        rng = np.random.default_rng(seed)
        nn = 40
        pairs = np.array(list(combinations(range(nn), 2)), np.int64)
        keep = rng.random(len(pairs)) < 0.4
        a, b = pairs[keep, 0], pairs[keep, 1]
        w = rng.integers(1, 9, int(keep.sum())).astype(np.int64)
        assert len(a) > 4 * nn  # edge count >> node count
        eds = rd.from_arrow(pa.Table.from_arrays(
            [pa.array(a), pa.array(b), pa.array(w)],
            names=["a", "b", "w"])).repartition(8).materialize()

        src, dst, ww = np.r_[a, b], np.r_[b, a], np.r_[w, w]
        wsum = np.zeros(nn, np.int64)
        np.add.at(wsum, src, ww)
        assert (wsum > 0).all()  # no isolated nodes at this density

        # --- pagerank
        p = np.full(nn, PR_SCALE, np.int64)
        for _ in range(PR_ITERS):
            contrib = (p[src] * ww) // wsum[src]
            s = np.zeros(nn, np.int64)
            np.add.at(s, dst, contrib)
            p = PR_BASE + (PR_DAMP_NUM * s) // PR_DAMP_DEN
        pdf = _pagerank_nodes(nn, eds).to_pandas()
        got_pr = np.zeros(nn, np.int64)
        got_pr[pdf["node"].to_numpy(np.int64)] = pdf["p"].to_numpy(np.int64)
        assert (got_pr == p).all(), f"pagerank seed {seed}"

        # --- triangles
        eset = set(zip(a.tolist(), b.tolist()))
        want_tri = np.zeros(nn, np.int64)
        for x, y, z in combinations(range(nn), 3):
            if ((x, y) in eset and (x, z) in eset and (y, z) in eset):
                want_tri[[x, y, z]] += 1
        tdf = _triangles_nodes(nn, eds).to_pandas()
        got_tri = np.zeros(nn, np.int64)
        np.add.at(got_tri, tdf["node"].to_numpy(np.int64),
                  tdf["c"].to_numpy(np.int64))
        assert (got_tri == want_tri).all(), f"triangles seed {seed}"

        # --- bounded-hop BFS from node 0
        INF = 10**9
        dist = np.full(nn, INF, np.int64)
        dist[0] = 0
        for _ in range(BFS_MAX_HOPS):
            nd = dist.copy()
            np.minimum.at(nd, dst, dist[src] + 1)
            dist = nd
        bdf = _bfs_nodes(eds, seed=0).to_pandas()
        got_d = np.full(nn, INF, np.int64)
        got_d[bdf["node"].to_numpy(np.int64)] = bdf["d"].to_numpy(np.int64)
        assert (got_d == dist).all(), f"bfs seed {seed}"

        # --- components (min reachable label)
        comp = np.arange(nn)
        for _ in range(nn):
            nc = comp.copy()
            np.minimum.at(nc, dst, comp[src])
            np.minimum.at(nc, src, comp[dst])
            if (nc == comp).all():
                break
            comp = nc
        cdf = _components_nodes(eds).to_pandas()
        got_c = np.full(nn, -1, np.int64)
        got_c[cdf["doc_id"].to_numpy(np.int64)] = (
            cdf["cluster_id"].to_numpy(np.int64))
        assert (got_c == comp).all(), f"components seed {seed}"


def test_class_semantic_sim_matches_bruteforce(ray_session):
    """LCA choice (min combined up-distance, then min URI) and path
    length must equal a dict-based brute force over the docdict
    closure; edges without a common ancestor are omitted."""
    from kgref.docdict import _closure
    from kgref.ops.kgraph import class_cooccurrence, class_semantic_sim

    anc: dict[str, dict[str, int]] = {}
    for a, b, d in _closure():
        anc.setdefault(a, {})[b] = d

    def full(u: str) -> dict[str, int]:
        m = dict(anc.get(u, {}))
        m[u] = 0
        return m

    edges = class_cooccurrence(SF).take_all()
    want = {}
    for r in edges:
        xa, xb = full(r["class_a"]), full(r["class_b"])
        cands = [(xa[c] + xb[c], c) for c in xa.keys() & xb.keys()]
        if cands:
            path, lca = min(cands)
            want[(r["class_a"], r["class_b"])] = (lca, path)

    got = class_semantic_sim(SF).to_pandas()
    assert {(r.class_a, r.class_b): (r.lca_uri, int(r.path_len))
            for r in got.itertuples()} == want
    assert want and len(want) < len(edges)  # both branches exercised


def test_ontology_coverage_audit(ray_session):
    """Per-ontology tallies must be internally consistent and agree
    with the dictionary class table and the direct triple volume."""
    from kgref.docdict import tables
    from kgref.ops.kgraph import _direct_triples, ontology_coverage

    got = ontology_coverage(SF).to_pandas().set_index("ontology")
    cls = tables()["classes"].to_pandas()
    per_ont = cls.groupby("ontology").size()
    assert set(got.index) == set(per_ont.index)
    assert (got["n_classes"] == per_ont[got.index]).all()
    assert (got["n_matched"] + got["n_unmatched"] == got["n_classes"]).all()
    tri = _direct_triples(SF).to_pandas()
    tri = tri[tri["pred"] == "annotated_with"]
    assert got["n_annotations"].sum() == len(tri)
    assert (got["n_matched"] > 0).all()


def test_class_proximity_matches_bruteforce(ray_session):
    """Pair counts and min gaps within the char window must equal an
    itertools brute force over the span list."""
    from collections import defaultdict
    from itertools import combinations

    from kgref.ops.kgraph import _PROX_WINDOW, _direct_triples, class_proximity

    tri = _direct_triples(SF).to_pandas()
    tri = tri[tri["pred"] == "annotated_with"]
    want: dict[tuple, list] = defaultdict(list)
    for _, g in tri.groupby(["conv_id", "turn_idx"]):
        spans = list(zip(g["from_1b"], g["to_1b"], g["obj"]))
        spans.sort()
        for (f1, t1, o1), (f2, t2, o2) in combinations(spans, 2):
            if o1 == o2:
                continue
            gap = max(f1, f2) - min(t1, t2) - 1
            if gap <= _PROX_WINDOW:
                want[(min(o1, o2), max(o1, o2))].append(gap)

    got = class_proximity(SF).to_pandas()
    assert {(r.class_a, r.class_b): (int(r.n_pairs), int(r.min_gap))
            for r in got.itertuples()} == \
        {k: (len(v), min(v)) for k, v in want.items()}
    assert want  # non-degenerate


def test_events_latest_per_key_matches_pandas(ray_session):
    """CDC compaction must pick exactly the max-(ts, event_id) row per
    (user, type), including across batch/partition boundaries (forced
    non-default partition count)."""
    import pyarrow.parquet as pq

    from kgref.ops.events import latest_per_key

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    want = (ev.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                           ascending=[True, True, False, False])
            .drop_duplicates(["user_id", "event_type"])
            [["user_id", "event_type", "event_id", "ts_us", "value"]]
            .sort_values(["user_id", "event_type"]).reset_index(drop=True))
    for parts in (None, 7):
        got = (latest_per_key(SF, n_parts=parts).to_pandas()
               .sort_values(["user_id", "event_type"])
               .reset_index(drop=True))
        assert got.equals(want)


def test_fold_m61_invariant_to_chunk_split(monkeypatch):
    """The r5 cache-sized block walk (m61._CHUNK_CHARS) must not change
    a single hash: force pathological chunk sizes (1 char — every
    string larger than a block; odd prime; huge) and compare against
    the unchunked result and the Horner scalar."""
    import kgref.ops.m61 as m61

    def horner(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * m61.FOLD_BASE + ord(ch)) % m61.FOLD_MOD
        return h

    texts = ["", "a", "chunk boundary " * 40, "\U0001F600" * 7,
             "z" * 1337, *(f"doc-{i}-{'x' * (i % 97)}" for i in range(300))]
    want = np.array([horner(t) for t in texts], dtype=np.uint64)
    for chunk in (1, 101, 1 << 30):
        monkeypatch.setattr(m61, "_CHUNK_CHARS", chunk)
        np.testing.assert_array_equal(m61.fold_m61_many(texts), want)


def test_annotation_density_covers_every_doc(ray_session):
    """Every document appears exactly once — zero-annotation docs too —
    and totals reconcile with the direct triple count."""
    import pyarrow.parquet as pq

    from kgref.ops.kgraph import _direct_triples, annotation_density

    got = annotation_density(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(got) == n_docs and got["doc_id"].nunique() == n_docs
    tri = _direct_triples(SF).to_pandas()
    assert got["n_annotations"].sum() == (tri["pred"] == "annotated_with").sum()
    assert (got["density_ppm"]
            == 1_000_000 * got["n_annotations"] // got["n_tokens"]).all()
    assert (got["n_tokens"] > 0).all()


def test_embed_gram_matches_bruteforce(ray_session):
    """The distributed combiner Gram matrix equals the single-matmul
    numpy result over the whole table, exactly (int64 fixed point)."""
    from kgref.ops.linalg import _FX, embed_gram

    got = (embed_gram(SF).to_pandas()
           .sort_values(["i", "j"]).reset_index(drop=True))
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    flat = emb.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    n = emb.num_rows
    d = len(flat) // n
    fx = np.floor(flat.astype(np.float64) * _FX + 0.5).astype(
        np.int64).reshape(n, d)
    g = fx.T @ fx
    iu, ju = np.triu_indices(d)
    assert len(got) == d * (d + 1) // 2
    np.testing.assert_array_equal(got["i"].to_numpy(), iu + 1)
    np.testing.assert_array_equal(got["j"].to_numpy(), ju + 1)
    np.testing.assert_array_equal(got["gram_fx"].to_numpy(), g[iu, ju])
    # symmetry of the source: the diagonal must dominate (PSD Gram)
    diag = got[got["i"] == got["j"]]["gram_fx"].to_numpy()
    assert (diag >= 0).all()


def test_bm25_topk_matches_bruteforce(ray_session):
    """Exact-integer BM25 vs a direct Python implementation of the
    same spec (k1=6/5, b=3/4, fixed-point idf, floor division)."""
    from collections import Counter

    from kgref.ops.bm25 import (N_QUERY_TERMS, TOP_K, _FX, bm25_topk)

    got = bm25_topk(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(docs)
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    total_len = sum(len(ts) for ts in toks.values())
    avgdl = int(np.floor(1000.0 * total_len / n_docs + 0.5))
    qterms = sorted((t for t, d in df.items() if 2 * d <= n_docs),
                    key=lambda t: (-df[t], t))[:N_QUERY_TERMS]
    scores = {}
    for did, ts in toks.items():
        tf = Counter(ts)
        s = 0
        for t in qterms:
            if t not in tf:
                continue
            idf = int(np.floor(
                _FX * np.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                + 0.5))
            s += ((idf * tf[t] * 22 * avgdl)
                  // (10 * avgdl * tf[t] + 3 * avgdl + 9000 * len(ts)))
        if s > 0:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    assert list(zip(got["doc_id"], got["score_fx"])) == want


def test_media_dhash_matches_seed_model(ray_session):
    """The real BMP/PPM decode → resize → dHash path equals a direct
    computation from the sample model (byte j = sha256(text)[j % 32]),
    and identical texts produce identical hashes."""
    import hashlib

    from kgref.ops.multimodal import media_dhash

    got = media_dhash(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    imgs = docs[docs["doc_id"] % 3 == 0]
    assert len(got) == len(imgs)
    by_text = {}
    for rec in imgs.itertuples():
        seed = np.frombuffer(hashlib.sha256(rec.text.encode()).digest(),
                             np.uint8).astype(np.int64)
        w, h = 16 + rec.doc_id % 16, 16 + rec.doc_id % 8
        yi, xi = (np.arange(8) * h) // 8, (np.arange(9) * w) // 9
        pos = ((yi[:, None] * w + xi[None, :])[..., None] * 3
               + np.arange(3)) % 32
        gray = seed[pos].sum(axis=2) // 3
        bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64)
        rows = (bits << np.arange(8)).sum(axis=1)
        hi = int((rows[:4] << (8 * np.arange(4))).sum())
        lo = int((rows[4:] << (8 * np.arange(4))).sum())
        assert (got.loc[rec.doc_id, "dhash_hi"],
                got.loc[rec.doc_id, "dhash_lo"]) == (hi, lo), rec.doc_id
        key = (rec.text, w, h)
        if key in by_text:
            assert by_text[key] == (hi, lo)
        by_text[key] = (hi, lo)
    assert (got[["dhash_hi", "dhash_lo"]] >= 0).all().all()
    assert (got[["dhash_hi", "dhash_lo"]] < 2**32).all().all()
