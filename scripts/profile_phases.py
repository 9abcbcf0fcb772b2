"""Per-phase wall decomposition of the flagship pipeline (VERDICT r2
task 7): attribute the full-pipeline 8→32-CPU scaling gap to annotate
vs exchange vs sink instead of the untested "single-node disk" story.

Legs — each a FRESH process on the identical replicated sf0.1 input
(REP=64, the regime where the gap was observed):

  annotate   build_triples → count()          matcher+expansion only
             (count() is fine on a map_batches output; it is only
             grouped outputs it distorts — see _order notes)
  shuffle    + salt/bucket + groupby(bucket, salt).map_groups(sort+
             dedup) → FLAT parquet write (zstd, no partition_cols,
             no finalize) — the real sink consumer, minus the
             partitioned-write machinery
  full       materialize_conversations: partitioned zstd write +
             atomic bucket renames + 128 manifests; reports its own
             pipeline_write_sec / finalize_sec split

Attribution (bounds, not exact walls — Ray pipelines the stages):
  exchange+dedup+flat-write ≈ shuffle − annotate
  partitioned-write overhead ≈ full.pipeline_write − shuffle
  driver finalize             = full.finalize (measured exactly)

Usage:
  python scripts/profile_phases.py            # all legs × {8, 32} CPUs
  python scripts/profile_phases.py --leg annotate --cpus 8   # one leg

Prints one JSON line per leg, then a summary JSON with per-phase
deltas and per-phase scaling ratios.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("GRAFT_BENCH_REP", "64"))


def run_leg(leg: str, cpus: int) -> dict:
    sys.path.insert(0, REPO)
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        from bench import _replicated_transcripts

        from kgref import docdict
        from kgref.pipelines.annotate_pipeline import build_triples
        from kgref.schemas import AnnotateOptions, PipelineConfig

        from bench import _sized

        rep = 1 if leg == "floor" else REP
        # size to the LEG's rep, not the env REP: the floor leg used to
        # run 5k rows through REP=64-sized 32-row batches, 30 actors and
        # 128 blocks — measuring over-provisioning, not fixed overhead
        batch, conc, blocks = _sized(SF_DIR, rep, cpus)
        cfg = PipelineConfig(
            num_buckets=128,
            batch_size=batch,
            annotate_concurrency=conc,
            options=AnnotateOptions(expand_hierarchy_levels=2,
                                    expand_mappings=True),
        )
        t0 = time.time()
        triples = build_triples(
            _replicated_transcripts(SF_DIR, rep, num_blocks=blocks),
            ray.put(docdict.state()), cfg.options, cfg)
        extra: dict = {}
        if leg == "floor":
            # REP=1 full pipeline ≈ the fixed, parallelism-independent
            # overhead: session init, read+plan, actor-pool startup,
            # per-actor dictionary/automaton build, sink setup.  The
            # variable compute at REP=1 is ~1/64 of the REP=64 job.
            import shutil

            from kgref.stages.materialize import materialize_conversations

            out = "/tmp/kgref_profile_floor"
            shutil.rmtree(out, ignore_errors=True)
            m = materialize_conversations(triples, out, cfg,
                                          lineage={"profile": True},
                                          unscored=True)
            n = m["rows"]
        elif leg == "annotate":
            n = triples.count()
        elif leg == "shuffle":
            import shutil

            from kgref.stages.materialize import (add_bucket_column,
                                                  add_salt_column,
                                                  _order_dedup_bucket)

            out = "/tmp/kgref_profile_flat"
            shutil.rmtree(out, ignore_errors=True)
            salted = add_salt_column(
                triples.drop_columns(["subj", "score"]), {}, cfg.salt_chunk)
            salted = salted.map_batches(
                lambda b: add_bucket_column(b, cfg.num_buckets),
                batch_format="pyarrow")
            grouped = salted.groupby(["bucket", "salt"]).map_groups(
                lambda t: _order_dedup_bucket(t, None),
                batch_format="pyarrow")
            grouped.drop_columns(["salt"]).write_parquet(
                out, compression="zstd")
            import pyarrow.parquet as pq

            n = sum(pq.read_metadata(os.path.join(out, f)).num_rows
                    for f in os.listdir(out) if f.endswith(".parquet"))
        elif leg == "full":
            import shutil

            from kgref.stages.materialize import materialize_conversations

            out = "/tmp/kgref_profile_full"
            shutil.rmtree(out, ignore_errors=True)
            m = materialize_conversations(triples, out, cfg,
                                          lineage={"profile": True},
                                          unscored=True)
            n = m["rows"]
            extra = {"pipeline_write_sec": m["pipeline_write_sec"],
                     "finalize_sec": m["finalize_sec"]}
        else:
            raise SystemExit(f"unknown leg {leg}")
        wall = round(time.time() - t0, 3)
        return {"leg": leg, "cpus": cpus, "sec": wall, "rows": int(n),
                "rep": rep, **extra}
    finally:
        ray.shutdown()


def _child(leg: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--leg", leg, "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=REPO)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"leg {leg}@{cpus} failed rc={out.returncode}:\n"
                           f"{out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    print(json.dumps(r), flush=True)
    return r


def main() -> None:
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_leg(leg, cpus)))
        return
    try:
        load1 = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        load1 = -1.0
    res: dict[int, dict[str, dict]] = {}
    # pair the CPU settings per leg (back-to-back) so each ratio samples
    # ONE load window, like bench.py --scaling does
    for leg in ("floor", "annotate", "shuffle", "full"):
        for cpus in (8, 32):
            res.setdefault(cpus, {})[leg] = _child(leg, cpus)

    def phases(r: dict[str, dict]) -> dict:
        ann = r["annotate"]["sec"]
        shf = r["shuffle"]["sec"]
        pw = r["full"]["pipeline_write_sec"]
        return {
            "floor_sec": r["floor"]["sec"],
            "annotate_sec": ann,
            "exchange_dedup_flatwrite_sec": round(shf - ann, 3),
            "partitioned_write_overhead_sec": round(pw - shf, 3),
            "finalize_sec": r["full"]["finalize_sec"],
            "full_sec": r["full"]["sec"],
        }

    p8, p32 = phases(res[8]), phases(res[32])
    summary = {
        "metric": "phase_profile",
        "rep": REP,
        "sf": SF_DIR,
        "loadavg_at_start": load1,
        "cpus8": p8,
        "cpus32": p32,
        # per-phase 8→32 scaling ratio: t8 / (4 * t32); 1.0 = perfect
        "phase_efficiency": {
            k: round(p8[k] / (4 * p32[k]), 3) if p32[k] > 0 else None
            for k in p8
        },
        # efficiency of the VARIABLE part of the full pipeline: the
        # REP=1 floor is parallelism-independent overhead (session,
        # plan, actor startup, per-actor dictionary build) that a long
        # job amortizes away — subtract it from both legs
        "full_efficiency_minus_floor": round(
            (p8["full_sec"] - p8["floor_sec"])
            / (4 * (p32["full_sec"] - p32["floor_sec"])), 3)
        if p32["full_sec"] > p32["floor_sec"] else None,
        "legs": res,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
