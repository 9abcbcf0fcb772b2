"""Batch-boundary robustness: the late-round operators must produce
IDENTICAL results when Ray splits the input into pathologically small
blocks (every per-batch partial/combiner crossing exercised) as with
the default block size.  Catches any kernel that silently assumes a
document's rows — or the whole corpus — arrive in one batch."""

import pandas as pd
import pytest
import ray

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(df.astype(str).itertuples(index=False, name=None))


@pytest.mark.parametrize("opname", [
    "embed_gram", "bm25_topk", "corpus_curation", "surprisal_filter",
    "dsir_weights", "bio_tags", "class_hits", "degree_histogram",
])
def test_tiny_blocks_change_nothing(ray_session, opname):
    from ray.data.context import DataContext

    import kgref.queries as q

    fn = q.queries()[opname]
    ctx = DataContext.get_current()
    default = ctx.target_max_block_size
    try:
        base = _canon(fn(SF).to_pandas())
        ctx.target_max_block_size = 16 * 1024  # 16 KiB blocks
        tiny = _canon(fn(SF).to_pandas())
    finally:
        ctx.target_max_block_size = default
    assert tiny == base
