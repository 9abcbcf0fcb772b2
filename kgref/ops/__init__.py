"""Training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — first-class components alongside the
annotator (SURVEY.md §2), registered into the driver contract by
``kgref.queries``."""

from __future__ import annotations

from . import (
    dedup,
    events,
    multimodal,
    normalize,
    relational,
    sampling,
    similarity,
    textstats,
    vocab,
)


def register_queries(q: dict) -> None:
    dedup.register(q)
    normalize.register(q)
    sampling.register(q)
    similarity.register(q)
    textstats.register(q)
    multimodal.register(q)
    events.register(q)
    relational.register(q)
    vocab.register(q)


def register_oracles(o: dict) -> None:
    dedup.register({}, o)
    normalize.register({}, o)
    sampling.register({}, o)
    similarity.register({}, o)
    textstats.register({}, o)
    events.register({}, o)
    relational.register({}, o)
    vocab.register({}, o)
