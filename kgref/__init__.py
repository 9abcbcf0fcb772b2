"""kgref — Ray-Data-native knowledge-graph construction engine.

From-scratch rebuild of the data-processing semantics of the public
``ontoportal-lirmm/ncbo_annotator`` (NCBO/BioPortal Annotator) as an
idiomatic Ray Data pipeline over Parquet transcript tables.  See
SURVEY.md for the blueprint; BASELINE.json for the authoritative spec.

NOTE: ``/root/reference`` was empty in every round so far (SURVEY.md §0);
reference citations in docstrings therefore use the public repository's
file layout (``ref:lib/ncbo_annotator.rb``) with the confidence tags
defined in SURVEY.md §0 instead of file:line into the mount.

This package never calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"
