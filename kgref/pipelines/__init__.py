from .annotate_pipeline import build_triples, run_pipeline

__all__ = ["build_triples", "run_pipeline"]
