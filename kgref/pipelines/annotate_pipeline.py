"""End-to-end flagship pipeline (SURVEY.md §3 E1, rebuild shape):

    read_parquet(transcripts)                    # pruned to 3 columns
      → [resume] filter_done_buckets             # skip finished buckets
      → map_batches(AnnotateTriples, actors)     # M1–M11, J1–J4, A4 fused
      → groupby(conv_id, salt).map_groups(...)   # THE shuffle (O1, U2, A2)
      → write_parquet(bucket=… dirs) + manifests # resumable sink

The reference's serving path is one synchronous request per text through
mgrep+Redis+SPARQL (ref:lib/ncbo_annotator.rb annotate [H]); here the
same semantics stream through Ray Data's executor with backpressure.
"""

from __future__ import annotations

import ray
import ray.data as rd

from .. import __version__
from ..schemas import AnnotateOptions, PipelineConfig
from ..sources.transcripts import read_transcripts
from ..stages.annotate import AnnotateTriples
from ..stages.materialize import (
    filter_done_buckets,
    hot_conversations,
    materialize_conversations,
)
from ..state.dictionary import DictionaryState


def build_triples(
    transcripts: rd.Dataset,
    state: "DictionaryState | ray.ObjectRef",
    opts: AnnotateOptions | None = None,
    cfg: PipelineConfig | None = None,
    recognizer: type = AnnotateTriples,
) -> rd.Dataset:
    """Lazy Dataset of TRIPLES rows.  ``state`` should be a ``ray.put``
    handle when called from a driver (one object-store copy, every actor
    reads it in __init__ — never re-shipped per batch).

    ``recognizer`` is the plugin surface (≙ the reference's
    ``Annotator.settings.supported_recognizers`` /
    ``enable_recognizer``, ref:lib/ncbo_annotator/recognizers/ [M],
    SURVEY.md §2.10): any callable class ``(state, opts)`` →
    ``__call__(pa.Table) -> pa.Table[TRIPLES]`` slots into the same
    actor-pool stage — swap the Aho–Corasick matcher for another
    recognizer without touching the pipeline."""
    cfg = cfg or PipelineConfig()
    opts = opts or cfg.options
    return transcripts.map_batches(
        recognizer,
        fn_constructor_args=(state, opts),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=cfg.annotate_concurrency,
        num_cpus=1,
    )


def _check_resume_compatible(out_dir: str, lineage: dict) -> None:
    """Refuse to resume into an out_dir produced under a different
    bucket count / option set / dictionary version: bucket numbering is
    crc32 % num_buckets, so skipping 'done' bucket ids from an
    incompatible run would silently drop or duplicate conversations."""
    import glob
    import json
    import os

    mfiles = glob.glob(os.path.join(out_dir, "_manifest", "bucket-*.json"))
    if not mfiles:
        return
    prev = json.load(open(sorted(mfiles)[0])).get("lineage", {})
    for key in ("num_buckets", "options_key", "dict_version"):
        if key in prev and prev[key] != lineage[key]:
            raise ValueError(
                f"resume mismatch in {out_dir}: existing manifests were "
                f"written with {key}={prev[key]!r}, this run uses "
                f"{lineage[key]!r}; use a fresh --out (or delete the old "
                f"output) — mixing would corrupt bucket assignment/"
                f"semantics")


def run_pipeline(
    transcripts_path: str | list[str],
    dict_dir: str,
    out_dir: str,
    opts: AnnotateOptions | None = None,
    cfg: PipelineConfig | None = None,
    recognizer: type = AnnotateTriples,
) -> dict:
    """Full job: returns the materialization metrics dict.

    Checkpointing: buckets are processed in ``cfg.waves`` sequential
    waves; a wave's bucket manifests land as soon as it finishes, so a
    crash loses at most the in-flight wave.  Rerunning with the same
    ``out_dir`` skips every manifested bucket BEFORE the annotate stage
    runs — both across reruns and across waves."""
    cfg = cfg or PipelineConfig()
    opts = opts or cfg.options

    state = DictionaryState.from_dir(dict_dir)
    state_ref = ray.put(state)

    lineage = {
        "input": transcripts_path if isinstance(transcripts_path, str)
        else list(transcripts_path),
        "dict_version": state.version,
        "code_version": __version__,
        "options_key": opts.key(),
        "num_buckets": cfg.num_buckets,
    }

    from ..stages.materialize import done_buckets, filter_to_buckets

    B = cfg.num_buckets
    _check_resume_compatible(out_dir, lineage)
    remaining = set(range(B)) - done_buckets(out_dir)
    if not remaining:
        return {"buckets": 0, "rows": 0, "wall_sec": 0.0}

    # O3 skew pre-pass on the cheap side (input conv_id column only),
    # scoped to the buckets this run will actually process — a resume
    # of 1 of 4096 buckets must not scan the full corpus here
    hot_input = read_transcripts(transcripts_path, columns=["conv_id"])
    if len(remaining) < B:
        hot_input = filter_to_buckets(hot_input, remaining, B)
    hot = hot_conversations(hot_input, cfg.hot_conv_rows)
    lineage["hot_convs"] = len(hot)

    waves = max(1, min(cfg.waves, B))
    totals = {"buckets": 0, "rows": 0, "wall_sec": 0.0}
    for w in range(waves):
        wave_buckets = {b for b in remaining if b % waves == w}
        if not wave_buckets:
            continue
        transcripts = read_transcripts(transcripts_path)
        if len(wave_buckets) < B:
            transcripts = filter_to_buckets(transcripts, wave_buckets, B)
        triples = build_triples(transcripts, state_ref, opts, cfg,
                                recognizer=recognizer)
        m = materialize_conversations(triples, out_dir, cfg, hot=hot,
                                      lineage=dict(lineage, wave=w),
                                      unscored=not opts.score)
        totals["buckets"] += m["buckets"]
        totals["rows"] += m["rows"]
        totals["wall_sec"] = round(totals["wall_sec"] + m["wall_sec"], 3)
    return totals
