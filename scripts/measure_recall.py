"""Quantified recall for the probabilistic dedup/ANN paths vs their
exact siblings (VERDICT r2 task 5).

Ground truths are the exact operators already oracled by the driver:

- MinHash-LSH / SimHash recall on the *planted-dup regime*: the set of
  pairs `ngram_jaccard_pairs` reports with J >= 0.9 (near-identical
  docs — the population a 100-TB dedup must not miss).  LSH banding
  with 8 bands x 8 rows collides a J=0.9 pair in >=1 band w.p.
  1-(1-0.9^8)^8 ~ 0.999; the Manku chunk-pair SimHash buckets are
  lossless for hamming <= 6, so its misses are pairs whose signatures
  genuinely differ by > 6 bits.
- ANN-LSH recall: fraction of the exact `ann_topk` (query, neighbor)
  rows that `ann_topk_lsh` also reports.

Usage: python scripts/measure_recall.py [sf_dir]
Prints one JSON object; pytest asserts floors on the sf0.001 fixture
(tests/test_ops.py::test_probabilistic_recall_floors) and COVERAGE.md
records the sf0.01 numbers.
"""
import json
import sys

sys.path = [p for p in sys.path if p not in ("", "/tmp")]
sys.path.insert(0, "/root/repo")


def planted_pairs(sf_dir: str, j_floor: float = 0.9) -> set:
    from kgref.ops.dedup import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(sf_dir).to_pandas()
    df = df[df["jaccard"] >= j_floor]
    return set(zip(df["doc_a"], df["doc_b"]))


def measure(sf_dir: str) -> dict:
    from kgref.ops.dedup import minhash_lsh_pairs, simhash_pairs
    from kgref.ops.similarity import ann_topk, ann_topk_ivf, ann_topk_lsh

    want = planted_pairs(sf_dir)

    mh = minhash_lsh_pairs(sf_dir).to_pandas()
    mh_pairs = set(zip(mh["doc_a"], mh["doc_b"]))
    sh = simhash_pairs(sf_dir).to_pandas()
    sh_pairs = set(zip(sh["doc_a"], sh["doc_b"]))

    exact = ann_topk(sf_dir).to_pandas()
    lsh = ann_topk_lsh(sf_dir).to_pandas()
    ivf = ann_topk_ivf(sf_dir).to_pandas()
    exact_rows = set(zip(exact["query_id"], exact["neighbor_id"]))
    lsh_rows = set(zip(lsh["query_id"], lsh["neighbor_id"]))
    ivf_rows = set(zip(ivf["query_id"], ivf["neighbor_id"]))

    return {
        "sf_dir": sf_dir,
        "planted_pairs": len(want),
        "minhash_recall": (len(want & mh_pairs) / len(want)
                           if want else None),
        "simhash_recall": (len(want & sh_pairs) / len(want)
                           if want else None),
        "ann_exact_rows": len(exact_rows),
        "ann_lsh_recall": (len(exact_rows & lsh_rows) / len(exact_rows)
                           if exact_rows else None),
        "ann_ivf_recall": (len(exact_rows & ivf_rows) / len(exact_rows)
                           if exact_rows else None),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    out = measure(sys.argv[1] if len(sys.argv) > 1
                  else "/root/testdata/sf0.01")
    print(json.dumps(out))
    ray.shutdown()
