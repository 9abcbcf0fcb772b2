"""Training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — first-class components alongside the
annotator (SURVEY.md §2), registered into the driver contract by
``kgref.queries``."""

from __future__ import annotations

from . import (
    bio,
    bm25,
    bpe,
    centroids,
    chunking,
    closure,
    clusters,
    contamination,
    curation,
    dedup,
    dialogue,
    dsir,
    dupspans,
    events,
    heavyhitters,
    incremental,
    invindex,
    kcore,
    kgraph,
    kgsplit,
    kmeans,
    linalg,
    linking,
    mixture,
    lm,
    metapath,
    multimodal,
    normalize,
    packing,
    pii,
    profile,
    quantiles,
    quantize,
    relational,
    sampling,
    selection,
    similarity,
    sketch,
    textstats,
    tfidf,
    topicshift,
    topk,
    vocab,
    walks,
)

_MODULES = (dedup, dupspans, normalize, sampling, similarity, textstats,
            multimodal,
            events, relational, vocab, packing, contamination, tfidf, pii,
            clusters, quantiles, chunking, topk, centroids, quantize, lm,
            sketch, heavyhitters, invindex, kgraph, kgsplit, mixture, closure,
            incremental, dialogue, topicshift, linking, kmeans, bpe, walks,
            profile, metapath, linalg, bm25, kcore, curation, selection,
            dsir, bio)


def register_queries(q: dict) -> None:
    for m in _MODULES:
        m.register(q)


def register_oracles(o: dict) -> None:
    for m in _MODULES:
        m.register({}, o)
