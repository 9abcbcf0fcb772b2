"""Benchmark runner (driver contract + local feedback loop).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...}

The default mode runs the suite ``$GRAFT_BENCH_REPEATS`` (3) times,
each repeat in a fresh Ray session (``num_cpus = $RAY_GRAFT_CPUS`` or
32), and reports per-query MEDIANS with raw repeats attached — single
runs flip ±50% under this shared host's neighbor load.  ``--once``
runs a single pass (the old behavior) for quick local iteration.

``--scaling`` runs the headline annotate pipeline twice in FRESH
subprocesses (num_cpus=8 then 32) on the same input and reports both
throughputs plus efficiency = T8 / (4 * T32) — the sandbox stand-in for
the north_rule's N→4N cluster-size criterion (SURVEY.md §4).

``--colocate`` is the companion control: solo 8-CPU leg, FOUR
concurrent 8-CPU legs (same hardware occupancy as one 32-CPU job,
zero cross-job coordination), solo 32-CPU leg.  It decomposes the
single-node 8→32 ratio into framework coordination cost (kept on a
real cluster) vs shared-memory-bus co-residency cost (removed by 4
real nodes); see BASELINE.md "co-residency control".

The annotate headline replicates the documents-as-transcripts input
REPLICATE× (deterministic conv_id prefixes) so wall time is dominated by
pipeline compute, not session startup; reported turns/sec is measured
over the replicated row count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# default REP matches the BASELINE.md-recorded configuration (REP=64)
# so driver-visible BENCH_rN numbers are comparable round-over-round and
# to the recorded baseline (fixed overheads amortized identically)
REPLICATE = int(os.environ.get("GRAFT_BENCH_REP", "64"))
SCALING_REP = 512  # big job for the N-vs-4N evidence: fixed overheads amortize
SCALING_REP_FULL = 64
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _replicated_transcripts(sf_dir: str, rep: int, num_blocks: int = 128):
    import pyarrow as pa

    from kgref.sources.transcripts import documents_as_transcripts

    # documents.parquet is a single one-row-group file: the parquet
    # reader cannot split it, so an override on the read still yields ONE
    # block and would starve the actor pool.  Split explicitly (cheap:
    # input is tiny; replication multiplies AFTER the split).
    ds = documents_as_transcripts(sf_dir).repartition(num_blocks)

    def replicate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for i in range(rep):
            conv = pc.binary_join_element_wise(
                pa.array([f"r{i}-"] * len(batch)), batch.column("conv_id"), "")
            parts.append(pa.Table.from_arrays(
                [conv, batch.column("turn_idx"), batch.column("text")],
                names=["conv_id", "turn_idx", "text"]))
        return pa.concat_tables(parts)

    return ds.map_batches(replicate, batch_format="pyarrow")


def _sized(sf_dir: str, rep: int, num_cpus: int) -> tuple[int, int, int]:
    """(batch_size, annotate_concurrency, num_blocks) sized to the JOB,
    not the machine: batch_size targets ~1024 post-replication turns
    per matcher task, the actor pool is capped at the number of tasks
    the input actually yields, and the input split never exceeds the
    task count by more than 2x.  Right-sizing is what kills the REP=1
    'fixed floor' that ANTI-scaled in the r2/r3 phase tables — a 5k-row
    job used to spawn 30 actors for 5 batches and 128 input blocks of
    39 rows (round-4 attribution: per-worker spawn+import is the floor,
    NOT per-actor dictionary build, which measures in microseconds).
    At REP>=64 every value is identical to the old fixed config."""
    import math

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    batch = max(32, 1024 // rep)
    n_tasks = max(1, math.ceil(n_docs / batch))
    conc = max(2, min(num_cpus - 2, n_tasks))
    return batch, conc, min(128, 2 * n_tasks)


def bench_annotate(sf_dir: str, num_cpus: int) -> dict:
    """Flagship: replicated transcripts → actor-pool annotate (hier2 +
    mappings) → salted conv groupby → partitioned parquet + manifests."""
    import shutil

    import ray

    from kgref import docdict
    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.schemas import AnnotateOptions, PipelineConfig
    from kgref.stages.materialize import materialize_conversations

    import pyarrow.parquet as pq

    # unique per process: --colocate-full runs four of these concurrently
    out_dir = f"/tmp/kgref_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    batch, conc, blocks = _sized(sf_dir, REPLICATE, num_cpus)
    cfg = PipelineConfig(
        num_buckets=128,
        # batch_size counts INPUT rows of the fused stage = pre-replication
        # docs; divide by REPLICATE so each actor task still processes
        # ~1024 turns (otherwise the whole corpus bundles into ~5 tasks).
        # Fixed-size pool (an autoscaling (2, N) pool spends half of a
        # short run below capacity) but capped at the job's task count.
        batch_size=batch,
        annotate_concurrency=conc,
        options=AnnotateOptions(expand_hierarchy_levels=2,
                                expand_mappings=True),
    )
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_turns = n_docs * REPLICATE

    stage = os.environ.get("KGREF_BENCH_STAGE", "full")
    xbytes = None
    t0 = time.time()
    try:  # always reclaim the pid-suffixed out_dir (ADVICE r4)
        triples = build_triples(
            _replicated_transcripts(sf_dir, REPLICATE, num_blocks=blocks),
            ray.put(docdict.state()), cfg.options, cfg)
        if stage == "annotate":
            # the BASELINE metric is turns ANNOTATED/sec: stream the
            # matcher stage to a count consumer, no sink
            n_triples = triples.count()
        else:
            metrics = materialize_conversations(
                triples, out_dir, cfg, lineage={"bench": True},
                unscored=not cfg.options.score)
            n_triples = metrics["rows"]
            xbytes = metrics.get("exchange_bytes")
        wall = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = {"sec": round(wall, 3), "turns": n_turns,
           "triples": n_triples, "stage": stage,
           "turns_per_sec": round(n_turns / wall, 1)}
    if xbytes is not None:
        # bytes through THE shuffle (manifest roll-up) — the quantity a
        # real cluster moves over the network; see BASELINE.md
        out["exchange_bytes"] = int(xbytes)
    return out


def bench_annotate_scored(sf_dir: str, num_cpus: int) -> dict:
    """Scored flagship config (A4 cvalue) over the same replicated
    input, annotate stage only — tracks the vectorized scored fan-out
    (VERDICT r2 task 4) round-over-round next to the unscored headline."""
    import ray

    from kgref import docdict
    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.schemas import AnnotateOptions, PipelineConfig

    import pyarrow.parquet as pq

    batch, conc, blocks = _sized(sf_dir, REPLICATE, num_cpus)
    cfg = PipelineConfig(
        num_buckets=128,
        batch_size=batch,
        annotate_concurrency=conc,
        options=AnnotateOptions(expand_hierarchy_levels=2,
                                expand_mappings=True, score="cvalue"),
    )
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_turns = n_docs * REPLICATE
    t0 = time.time()
    triples = build_triples(
        _replicated_transcripts(sf_dir, REPLICATE, num_blocks=blocks),
        ray.put(docdict.state()), cfg.options, cfg)
    n_triples = triples.count()
    wall = time.time() - t0
    return {"sec": round(wall, 3), "turns": n_turns,
            "triples": n_triples, "stage": "annotate",
            "turns_per_sec": round(n_turns / wall, 1)}


def bench_query(fn, sf_dir: str) -> dict:
    t0 = time.time()
    res = fn(sf_dir)
    import ray.data as rd

    n = res.count() if isinstance(res, rd.Dataset) else len(res)
    return {"sec": round(time.time() - t0, 3), "rows": int(n)}


def run_suite(sf_dir: str, num_cpus: int, headline_only: bool = False) -> dict:
    import ray

    obj_gb = os.environ.get("GRAFT_OBJ_STORE_GB")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=(int(float(obj_gb) * 2**30)
                                  if obj_gb else None))
    try:
        queries: dict[str, dict] = {}
        ann = bench_annotate(sf_dir, num_cpus)
        queries["annotate_flagship"] = ann
        if not headline_only:
            queries["annotate_scored_cvalue"] = bench_annotate_scored(
                sf_dir, num_cpus)
            from kgref.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
            from kgref.ops.similarity import ann_topk, embedding_dup_pairs
            from kgref.ops.textstats import quality_score, token_stats

            queries["dedup_minhash_lsh"] = bench_query(minhash_lsh_pairs,
                                                       sf_dir)
            queries["dedup_ngram_jaccard"] = bench_query(ngram_jaccard_pairs,
                                                         sf_dir)
            queries["ann_topk"] = bench_query(ann_topk, sf_dir)
            queries["dedup_embedding"] = bench_query(embedding_dup_pairs,
                                                     sf_dir)
            queries["token_stats"] = bench_query(token_stats, sf_dir)
            queries["quality_score"] = bench_query(quality_score, sf_dir)
        total = round(sum(q["sec"] for q in queries.values()), 3)
        return {
            "metric": "bench_total_sec",
            "value": total,
            "unit": "sec",
            "queries": {k: v["sec"] for k, v in queries.items()},
            "detail": queries,
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "annotate_turns_per_sec": ann["turns_per_sec"],
        }
    finally:
        ray.shutdown()


BENCH_REPEATS = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))


def run_suite_median(sf_dir: str, num_cpus: int,
                     repeats: int = BENCH_REPEATS) -> dict:
    """Default driver entry: the whole suite ``repeats`` times, each in a
    FRESH Ray session, reporting per-query MEDIANS with the raw repeats
    attached.  Single runs on this shared host flip ±50% under neighbor
    load; medians keep one noisy window from moving headline numbers
    (round-2 demand)."""
    import statistics

    runs = [run_suite(sf_dir, num_cpus) for _ in range(repeats)]
    med_q = {k: round(statistics.median(r["queries"][k] for r in runs), 3)
             for k in runs[0]["queries"]}
    detail = {}
    for k in med_q:
        d = dict(runs[0]["detail"][k])  # row counts etc. from run 1
        d["sec"] = med_q[k]
        d["repeats_sec"] = [r["queries"][k] for r in runs]
        if "turns_per_sec" in d:
            d["turns_per_sec"] = round(statistics.median(
                r["detail"][k]["turns_per_sec"] for r in runs), 1)
        detail[k] = d
    out = {
        "metric": "bench_total_sec",
        "value": round(sum(med_q.values()), 3),
        "unit": "sec",
        "estimator": f"per-query median of {repeats} fresh-session runs",
        "queries": med_q,
        "detail": detail,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "annotate_turns_per_sec":
            detail["annotate_flagship"]["turns_per_sec"],
    }
    # attach the committed one-window scaling-criterion record (produced
    # by `bench.py --criterion`, a ~20-min settle-gated window that
    # cannot run inside this timing suite without polluting it): the
    # raw 8→32 pair, framework_ratio, colocate_penalty and the
    # flagship's exchange-byte roll-up, all from ONE load regime
    here = os.path.dirname(os.path.abspath(__file__))
    reps = []
    for tag in ("", "b", "c", "d", "e", "f"):
        crit_path = os.path.join(here, f"SCALING_r05{tag}.json")
        if os.path.exists(crit_path):
            with open(crit_path) as fh:
                reps.append(json.load(fh))
    if reps:
        out["scaling_criterion_recorded"] = reps[0]
        out["scaling_criterion_replicates"] = {
            "n": len(reps),
            "raw_8_to_32_efficiency":
                [r["raw_single_node_8_to_32_efficiency"] for r in reps],
            "framework_ratio":
                [r["framework_ratio_solo32_over_quad8"] for r in reps],
            "median_raw_8_to_32_efficiency": round(statistics.median(
                r["raw_single_node_8_to_32_efficiency"] for r in reps), 3),
            "median_framework_ratio": round(statistics.median(
                r["framework_ratio_solo32_over_quad8"] for r in reps), 3),
        }
    return out


SCALING_TRIALS = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
# a pair only counts as CLEAN if the 1-min loadavg sampled right before
# EACH leg (while this bench is idle, so ~all of it is neighbor load) is
# at or below this; r3 lost seven criterion runs to undetected neighbor
# saturation (loadavg 10–28 from outside the container)
SCALING_LOAD_MAX = float(os.environ.get("GRAFT_SCALING_LOAD_MAX", "4"))
SCALING_MAX_ATTEMPTS = int(os.environ.get("GRAFT_SCALING_MAX_ATTEMPTS", "8"))
# seconds to wait (sampling every 10 s) for the 1-min loadavg to decay
# below the gate before a leg starts: the first round-4 criterion run
# showed the 32-CPU leg's pre-load reading is dominated by exponential
# DECAY RESIDUE of this bench's own just-finished 8-CPU leg (~160 s at
# 8 procs drives loadavg toward 8; one instant later it still reads ~5),
# so without a settle the gate can never mark a pair clean even on an
# idle host
SCALING_SETTLE_S = float(os.environ.get("GRAFT_SCALING_SETTLE_S", "150"))


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _settle() -> None:
    deadline = time.monotonic() + SCALING_SETTLE_S
    while time.monotonic() < deadline and _loadavg1() > SCALING_LOAD_MAX:
        time.sleep(10)


# proportional object-store budget per leg (ADVICE r4: only the quad8
# legs used to be capped at 8 GB while solo legs ran Ray's default 30%
# of host RAM — an asymmetric memory configuration biasing the ratio);
# now EVERY criterion/scaling/colocate leg gets 1 GB per CPU
OBJ_GB_PER_CPU = float(os.environ.get("GRAFT_OBJ_GB_PER_CPU", "1"))


def _leg_env(sf_dir: str, cpus: int, stage: str, rep: int) -> dict:
    return dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
                GRAFT_BENCH_REP=str(rep), KGREF_BENCH_STAGE=stage,
                GRAFT_OBJ_STORE_GB=str(OBJ_GB_PER_CPU * cpus))


def _one_trial(sf_dir: str, cpus: int, stage: str = "annotate",
               rep: int = SCALING_REP) -> dict:
    env = _leg_env(sf_dir, cpus, stage, rep)
    _settle()
    pre_load = _loadavg1()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--headline-json"],
        env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench child (cpus={cpus}, stage={stage}) failed with "
            f"rc={out.returncode}; stderr tail:\n{out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    r["pre_load"] = pre_load
    return r


def _run_quad(sf_dir: str, stage: str, rep: int) -> tuple[list[dict], float]:
    """FOUR concurrent 8-CPU legs.  Child stdout/stderr go to temp
    FILES, not pipes (ADVICE r4: a child emitting >64 KB of stderr
    blocked mid-run behind a sequential communicate(), breaking the
    'four concurrent jobs' premise), and stragglers are killed in a
    finally block if any child fails."""
    import tempfile

    env = _leg_env(sf_dir, 8, stage, rep)
    procs = []
    t0 = time.time()
    try:
        for _ in range(4):
            out_f = tempfile.TemporaryFile(mode="w+")
            err_f = tempfile.TemporaryFile(mode="w+")
            procs.append((subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-json"],
                env=env, stdout=out_f, stderr=err_f,
                cwd=os.path.dirname(os.path.abspath(__file__))),
                out_f, err_f))
        for p, _o, _e in procs:
            p.wait()
        wall = time.time() - t0
        quad = []
        for p, out_f, err_f in procs:
            out_f.seek(0)
            lines = [ln for ln in out_f.read().splitlines()
                     if ln.startswith("{")]
            if p.returncode != 0 or not lines:
                err_f.seek(0)
                raise RuntimeError(f"colocate child rc={p.returncode}; "
                                   f"stderr tail:\n{err_f.read()[-2000:]}")
            quad.append(json.loads(lines[-1]))
        return quad, wall
    finally:
        for p, out_f, err_f in procs:
            if p.poll() is None:
                p.kill()
            out_f.close()
            err_f.close()


def run_scaling(sf_dir: str) -> dict:
    """Same headline job, fresh processes, 8 vs 32 CPUs.

    The sandbox host is SHARED (neighbor load average 8–26 from outside
    this container; single-setting trial variance measured at ~50%), so
    trials run as back-to-back (8, 32) PAIRS: each pair samples one load
    window and yields one efficiency estimate r32/(4·r8).  The headline
    value is the MEDIAN pair — under symmetric noise a max-statistic is
    positively biased, the median is not; best and all pairs are
    reported as secondary fields for transparency."""
    pairs = []
    clean = []
    attempts = 0
    # keep sampling load windows until SCALING_TRIALS pairs are CLEAN
    # (pre-leg neighbor load <= SCALING_LOAD_MAX on both legs) or the
    # attempt budget runs out; every pair is recorded either way
    while len(clean) < SCALING_TRIALS and attempts < SCALING_MAX_ATTEMPTS:
        attempts += 1
        r8 = _one_trial(sf_dir, 8)
        r32 = _one_trial(sf_dir, 32)
        p = {
            "cpus8_turns_per_sec": r8["annotate_turns_per_sec"],
            "cpus32_turns_per_sec": r32["annotate_turns_per_sec"],
            "cpus8_sec": r8["value"],
            "cpus32_sec": r32["value"],
            "pre_load_8": r8["pre_load"],
            "pre_load_32": r32["pre_load"],
            "clean": (r8["pre_load"] <= SCALING_LOAD_MAX
                      and r32["pre_load"] <= SCALING_LOAD_MAX),
            "efficiency": round(r32["annotate_turns_per_sec"]
                                / (4 * r8["annotate_turns_per_sec"]), 3),
        }
        pairs.append(p)
        if p["clean"]:
            clean.append(p)
    scored = clean if clean else pairs  # all-dirty window: flag, don't die
    ranked = sorted(scored, key=lambda p: p["efficiency"])
    median = ranked[len(ranked) // 2]
    best = ranked[-1]
    # one full-pipeline pair (annotate + conv shuffle + resumable sink)
    # for transparency: on ONE node the sink/shuffle share disk + memory
    # bandwidth that a real 4N-node cluster multiplies, so the pipeline
    # ratio here is a lower bound
    f8 = _one_trial(sf_dir, 8, stage="full", rep=SCALING_REP_FULL)
    f32 = _one_trial(sf_dir, 32, stage="full", rep=SCALING_REP_FULL)
    full_eff = round(f32["annotate_turns_per_sec"]
                     / (4 * f8["annotate_turns_per_sec"]), 3)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": median["efficiency"],
        "unit": "ratio",
        "estimator": (f"median of {len(scored)} "
                      f"{'clean' if clean else 'DIRTY'} pairs "
                      f"(load<= {SCALING_LOAD_MAX} gate, "
                      f"{attempts} attempts)"),
        "clean_pairs": len(clean),
        "queries": {"annotate_cpus8_sec": median["cpus8_sec"],
                    "annotate_cpus32_sec": median["cpus32_sec"]},
        "turns_per_sec": {"cpus8": median["cpus8_turns_per_sec"],
                          "cpus32": median["cpus32_turns_per_sec"]},
        "best_pair_efficiency": best["efficiency"],
        "all_pairs": pairs,
        "full_pipeline": {"cpus8_turns_per_sec": f8["annotate_turns_per_sec"],
                          "cpus32_turns_per_sec": f32["annotate_turns_per_sec"],
                          "efficiency": full_eff,
                          "pre_load_8": f8["pre_load"],
                          "pre_load_32": f32["pre_load"],
                          "replicate": SCALING_REP_FULL},
        "scaling_rep": SCALING_REP,
        "sf": sf_dir,
        "num_cpus": 32,
    }


def run_colocate(sf_dir: str, stage: str = "annotate",
                 rep: int = SCALING_REP) -> dict:
    """Co-residency control for the N→4N-NODE criterion on a ONE-node
    sandbox.  The single-node 8→32-CPU ratio confounds two different
    losses: (a) framework coordination cost of pooling 4× the workers
    under one driver — a loss a real cluster KEEPS — and (b) sharing
    one node's memory bus / L3 / object store between 4× the compute —
    a loss a real 4-node cluster REMOVES (each node brings its own
    bus).  Three measurements in one load window separate them:

      solo8   — one 8-CPU job, rest of the node idle (per-node rate a
                real cluster would see on every node);
      quad8   — FOUR concurrent 8-CPU jobs, fresh processes, same
                input (the same hardware occupancy as one 32-CPU job,
                but with zero cross-job Ray coordination);
      solo32  — one 32-CPU job.

    framework_ratio = solo32 / aggregate(quad8): <1 means the pooled
    job pays coordination cost on identical hardware occupancy — the
    only component a multi-node run keeps.  colocate_penalty =
    aggregate(quad8) / (4·solo8): the pure hardware-sharing cost that
    vanishes when the four jobs live on four nodes.  Implied 4-node
    efficiency = framework_ratio (hardware term → 1 across nodes)."""
    r8 = _one_trial(sf_dir, 8, stage=stage, rep=rep)  # settles itself

    _settle()
    pre_quad = _loadavg1()
    quad, quad_wall = _run_quad(sf_dir, stage, rep)
    rates = [q["annotate_turns_per_sec"] for q in quad]
    agg = sum(rates)

    r32 = _one_trial(sf_dir, 32, stage=stage, rep=rep)

    framework = r32["annotate_turns_per_sec"] / agg
    colocate = agg / (4 * r8["annotate_turns_per_sec"])
    return {
        "metric": f"colocate_control_8x4_vs_32_{stage}",
        "stage": stage,
        "value": round(framework, 3),
        "unit": "ratio",
        "solo8_turns_per_sec": r8["annotate_turns_per_sec"],
        "quad8_turns_per_sec_each": [round(r, 1) for r in rates],
        "quad8_aggregate_turns_per_sec": round(agg, 1),
        "quad8_wall_sec": round(quad_wall, 3),
        "solo32_turns_per_sec": r32["annotate_turns_per_sec"],
        "framework_ratio_solo32_over_quad8": round(framework, 3),
        "colocate_penalty_quad8_over_4xsolo8": round(colocate, 3),
        "single_node_8_to_32_efficiency": round(
            r32["annotate_turns_per_sec"]
            / (4 * r8["annotate_turns_per_sec"]), 3),
        "pre_load": {"solo8": r8["pre_load"], "quad8": pre_quad,
                     "solo32": r32["pre_load"]},
        "obj_store_gb_per_cpu": OBJ_GB_PER_CPU,
        "scaling_rep": rep,
        "sf": sf_dir,
    }


def run_criterion(sf_dir: str, rep: int = SCALING_REP) -> dict:
    """VERDICT r4 Next #7: ONE settle-gated window producing the full
    scaling-criterion triple so the raw pair, the co-residency
    decomposition, and the exchange-byte accounting all describe the
    same load regime:

      1. solo8 → quad8 → solo32 annotate legs, back to back (each leg
         waits for the 1-min loadavg to decay below the gate first):
         raw single-node 8→32 efficiency, framework_ratio
         (solo32 / Σquad8 — the only loss a real 4-node cluster keeps),
         colocate_penalty (Σquad8 / 4·solo8 — the shared-memory-bus
         loss 4 real nodes remove by construction).
      2. One full-pipeline 32-CPU leg in the same window reporting
         ``exchange_bytes`` — the manifest roll-up of bytes through THE
         shuffle, i.e. the volume a real cluster would move over the
         network (partially addressing the unmeasured-cross-node-
         network caveat: the exchange is measured, the wire isn't).
    """
    r8 = _one_trial(sf_dir, 8, rep=rep)
    _settle()
    pre_quad = _loadavg1()
    quad, quad_wall = _run_quad(sf_dir, "annotate", rep)
    rates = [q["annotate_turns_per_sec"] for q in quad]
    agg = sum(rates)
    r32 = _one_trial(sf_dir, 32, rep=rep)
    f32 = _one_trial(sf_dir, 32, stage="full", rep=SCALING_REP_FULL)
    fdet = f32.get("detail", {}).get("annotate_flagship", {})
    raw = r32["annotate_turns_per_sec"] / (4 * r8["annotate_turns_per_sec"])
    framework = r32["annotate_turns_per_sec"] / agg
    loads = [r8["pre_load"], pre_quad, r32["pre_load"], f32["pre_load"]]
    return {
        "metric": "scaling_criterion_window",
        "value": round(framework, 3),
        "unit": "ratio",
        "estimator": ("framework_ratio solo32/sum(quad8) — the implied "
                      "4-node efficiency (hardware-sharing term -> 1 "
                      "across real nodes); raw pair and decomposition "
                      "from the SAME settle-gated window"),
        "clean": all(ld <= SCALING_LOAD_MAX for ld in loads),
        "pre_load": {"solo8": r8["pre_load"], "quad8": pre_quad,
                     "solo32": r32["pre_load"], "full32": f32["pre_load"]},
        "raw_single_node_8_to_32_efficiency": round(raw, 3),
        "framework_ratio_solo32_over_quad8": round(framework, 3),
        "colocate_penalty_quad8_over_4xsolo8": round(
            agg / (4 * r8["annotate_turns_per_sec"]), 3),
        "turns_per_sec": {"cpus8": r8["annotate_turns_per_sec"],
                          "cpus32": r32["annotate_turns_per_sec"],
                          "quad8_each": [round(r, 1) for r in rates],
                          "quad8_aggregate": round(agg, 1)},
        "quad8_wall_sec": round(quad_wall, 3),
        "full_pipeline_32": {
            "sec": f32["value"],
            "turns_per_sec": f32["annotate_turns_per_sec"],
            "exchange_bytes": fdet.get("exchange_bytes"),
            "triples": fdet.get("triples"),
            "replicate": SCALING_REP_FULL},
        "obj_store_gb_per_cpu": OBJ_GB_PER_CPU,
        "scaling_rep": rep,
        "sf": sf_dir,
        "num_cpus": 32,
    }


if __name__ == "__main__":
    if "--criterion" in sys.argv:
        print(json.dumps(run_criterion(SF_DIR)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--colocate-full" in sys.argv:
        print(json.dumps(run_colocate(SF_DIR, stage="full",
                                      rep=SCALING_REP_FULL)))
    elif "--colocate" in sys.argv:
        print(json.dumps(run_colocate(SF_DIR)))
    elif "--headline-json" in sys.argv:
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS, headline_only=True)))
    elif "--once" in sys.argv:
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS)))
    else:
        print(json.dumps(run_suite_median(SF_DIR, NUM_CPUS)))
