from .annotate import AnnotateTriples, annotate_rows

__all__ = ["AnnotateTriples", "annotate_rows"]
