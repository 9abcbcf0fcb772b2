"""Training-data-pipeline operators (dedup, similarity, text analysis,
multimodal) — registered into the driver contract by kgref.queries."""


def register_queries(q: dict) -> None:
    pass


def register_oracles(o: dict) -> None:
    pass
