"""Job entry point — the ``ray job submit`` surface (north_star:
"runs via ray job submit ... with checkpoint-based resumption").

    ray job submit -- python -m kgref.run \
        --transcripts /data/transcripts --dict /data/dict/v3 \
        --out /data/kg_out --hierarchy-levels 2 --expand-mappings \
        --num-buckets 4096

On a cluster the script connects to the existing Ray runtime (RAY_ADDRESS
set by the job server); standalone it starts a local session.  Rerunning
with the same --out resumes: buckets listed in ``_manifest/`` are skipped
before the annotate stage runs (kgref.stages.materialize).

This module is the ONLY library-adjacent code that may call ray.init —
the library itself never does (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="kgref.run",
                                description=__doc__.split("\n")[0])
    p.add_argument("--transcripts", required=True,
                   help="parquet path(s) of the transcripts table")
    p.add_argument("--dict", required=True, dest="dict_dir",
                   help="dictionary snapshot dir (classes/labels/… parquet)")
    p.add_argument("--out", required=True, help="output dir (resumable)")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--waves", type=int, default=1,
                   help="checkpoint waves: crash loses at most 1/waves")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--concurrency", type=int, default=0,
                   help="annotate actor pool size (0 = cpus-2)")
    p.add_argument("--min-term-size", type=int, default=0)
    p.add_argument("--no-synonyms", action="store_true")
    p.add_argument("--no-stop-words", action="store_true")
    p.add_argument("--exclude-numbers", action="store_true")
    p.add_argument("--longest-only", action="store_true")
    p.add_argument("--subword", action="store_true",
                   help="allow sub-token matches (mgrep longword=N); "
                        "whole-word matching is the default")
    p.add_argument("--ontologies", default="",
                   help="comma-separated ontology acronyms filter")
    p.add_argument("--semantic-types", default="")
    p.add_argument("--hierarchy-levels", type=int, default=0)
    p.add_argument("--expand-mappings", action="store_true")
    p.add_argument("--score", default="", choices=["", "old", "cvalue",
                                                   "cvalueh"])
    p.add_argument("--score-threshold", type=float, default=0.0)
    p.add_argument("--recognizer", default="index",
                   choices=["index", "regex", "stat", "lemma"],
                   help="raw-match engine (§2.10 plugin): token-window/"
                        "AC index (default), regex scanner, statistical "
                        "BIO tagger, or lemmatization-based matcher "
                        "(Annotator+ lemma mode)")
    p.add_argument("--context-flags", action="store_true",
                   help="compute ConText clinical-context columns "
                        "(negated / experiencer / temporality — the "
                        "Annotator+ clinical-context feature) in the "
                        "annotate pass; index engine only")
    p.add_argument("--hot-conv-rows", type=int, default=50_000)
    p.add_argument("--salt-chunk", type=int, default=8_192)
    p.add_argument("--emit-jsonl", action="store_true",
                   help="also export the reference-shape NESTED "
                        "annotation objects as per-bucket JSONL under "
                        "<out>/jsonl/ (stages.serialize)")
    p.add_argument("--emit-ntriples", action="store_true",
                   help="also export the triples as W3C N-Triples "
                        "(per-bucket .nt shards under <out>/ntriples/, "
                        "RDF-toolchain-consumable; stages.serialize)")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)  # RAY_ADDRESS drives cluster vs local

    from .pipelines.annotate_pipeline import run_pipeline
    from .schemas import AnnotateOptions, PipelineConfig

    opts = AnnotateOptions(
        whole_word_only=not args.subword,
        with_synonyms=not args.no_synonyms,
        min_term_size=args.min_term_size,
        use_stop_words=not args.no_stop_words,
        exclude_numbers=args.exclude_numbers,
        longest_only=args.longest_only,
        ontologies=tuple(o for o in args.ontologies.split(",") if o),
        semantic_types=tuple(s for s in args.semantic_types.split(",") if s),
        expand_hierarchy_levels=args.hierarchy_levels,
        expand_mappings=args.expand_mappings,
        score=args.score,
        score_threshold=args.score_threshold,
    )
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    cfg = PipelineConfig(
        dict_dir=args.dict_dir,
        out_dir=args.out,
        num_buckets=args.num_buckets,
        waves=args.waves,
        batch_size=args.batch_size,
        annotate_concurrency=args.concurrency or max(2, ncpu - 2),
        hot_conv_rows=args.hot_conv_rows,
        salt_chunk=args.salt_chunk,
        options=opts,
    )
    from .stages.annotate import (AnnotateTriples, LemmaAnnotateTriples,
                                  RegexAnnotateTriples,
                                  StatisticalAnnotateTriples)

    recognizer = {"index": AnnotateTriples,
                  "regex": RegexAnnotateTriples,
                  "stat": StatisticalAnnotateTriples,
                  "lemma": LemmaAnnotateTriples}[args.recognizer]
    if args.context_flags:
        if args.recognizer != "index":
            raise SystemExit("--context-flags requires the index engine")
        from .ops.context import ContextAnnotateTriples

        recognizer = ContextAnnotateTriples
    metrics = run_pipeline(args.transcripts, args.dict_dir, args.out, opts,
                           cfg, recognizer=recognizer)
    if args.emit_jsonl or args.emit_ntriples:
        import os

        from .pipelines.annotate_pipeline import build_triples
        from .sources.transcripts import read_transcripts
        from .state.dictionary import DictionaryState

        state_ref = ray.put(DictionaryState.from_dir(args.dict_dir))

        def fresh_triples():
            return build_triples(read_transcripts(args.transcripts),
                                 state_ref, opts, cfg,
                                 recognizer=recognizer)

        if args.emit_jsonl:
            from .stages.serialize import write_annotations_jsonl

            metrics["jsonl_lines"] = write_annotations_jsonl(
                fresh_triples(), os.path.join(args.out, "jsonl"),
                num_buckets=args.num_buckets)
        if args.emit_ntriples:
            from .stages.serialize import write_ntriples

            metrics["ntriples_lines"] = write_ntriples(
                fresh_triples(), os.path.join(args.out, "ntriples"),
                num_buckets=args.num_buckets)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
