"""Per-request serving path — the reference's headline API
``annotate(text, options)`` (SURVEY §3 E1, ref:lib/ncbo_annotator.rb
`NcboAnnotator#annotate` [M]) re-expressed in-process: the same fused
kernel the actor pool runs per batch (stages/annotate.annotate_rows),
applied to one text, nested into the reference-shape annotation
objects by the same serializer kernel the batch export uses
(stages/serialize._nest_bucket) — so a request served here is
bit-identical to the same turn flowing through the flagship pipeline
(pinned by test_serving_matches_pipeline).

No Ray: serving state is the process-local DictionaryState (the
reference keeps it in mgrep RAM + Redis; an actual service would wrap
``Annotator`` in whatever request framework it likes, one instance per
worker — exactly the actor-pool `__init__`/`__call__` split).
Per-options template registries are cached on the instance, the
actor-lifetime discipline."""

from __future__ import annotations

import json

from .schemas import AnnotateOptions


class Annotator:
    """One serving instance: dictionary + matcher state built once,
    reused across requests (ST1/ST2)."""

    def __init__(self, state=None):
        from . import docdict
        from .stages.annotate import TemplateRegistry, _resolve_state

        self.state = _resolve_state(state) if state is not None \
            else docdict.state()
        self.state.term_dictionary()  # build the matcher index now
        self._registries: dict[AnnotateOptions, TemplateRegistry] = {}

    def annotate(self, text: str,
                 options: AnnotateOptions | None = None) -> list[dict]:
        """Annotate ONE text → list of span dicts, each
        ``{from, to, text, direct[], hierarchy[], mappings[]}`` —
        the nested-export shape (stages/serialize)."""
        from .stages.annotate import TemplateRegistry, annotate_rows
        from .stages.serialize import _nest_bucket, decode_dictionary_columns

        opts = options or AnnotateOptions()
        reg = self._registries.get(opts)
        if reg is None:
            reg = self._registries[opts] = TemplateRegistry(self.state,
                                                            opts)
        t = annotate_rows(["conv-0"], [0], [text], self.state, opts,
                          registry=reg)
        if len(t) == 0:
            return []
        nested = _nest_bucket(decode_dictionary_columns(t).to_pandas())
        return json.loads(nested["json"].iloc[0])["spans"]


_DEFAULT: Annotator | None = None


def annotate(text: str,
             options: AnnotateOptions | None = None) -> list[dict]:
    """Module-level convenience mirroring the reference's entry point:
    builds one process-wide Annotator on first use."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Annotator()
    return _DEFAULT.annotate(text, options)
