"""VERDICT r01 item 10: demonstrate the 4096-bucket / multi-wave
checkpoint-resume at the largest local scale (sf0.1 × 512 = 2.56M
turns → ~285M triples) with kill/resume timing.

Phases (each in a FRESH process so the kill is a real process death):
  1. prepare: write the replicated transcripts as splittable parquet
  2. run1: run_pipeline(num_buckets=4096, waves=NW); SIGKILLed from the
     parent after KILL_AFTER_S — manifests written by completed waves
     survive, the in-flight wave is lost
  3. resume: same out_dir — finished buckets are filtered out BEFORE
     the annotate stage; must complete the remaining buckets only
  4. verify: all 4096 manifests present; manifest row sum equals the
     independently-known triple count (REP-scaled from the benched
     REP=64 run); spot-read one bucket for ordering

Usage: python scripts/resume_demo.py [rep] [kill_after_s]
Writes a JSON summary line; records go to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 512
KILL_AFTER_S = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
IN_DIR = f"/tmp/kgref_resume_in_rep{REP}"
OUT_DIR = f"/tmp/kgref_resume_out_rep{REP}"
NUM_BUCKETS = 4096
WAVES = 8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD_TEMPLATE = r"""
import sys, os, time, json
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
phase = {phase!r}
if phase == "prepare":
    os.environ["GRAFT_BENCH_REP"] = str({rep})
    from bench import _replicated_transcripts
    ds = _replicated_transcripts({sf_dir!r}, {rep})
    ds.write_parquet({in_dir!r})
    print(json.dumps({{"phase": "prepare", "rows": "written"}}))
else:
    from kgref.pipelines.annotate_pipeline import run_pipeline
    from kgref.schemas import AnnotateOptions, PipelineConfig
    cfg = PipelineConfig(num_buckets={num_buckets}, waves={waves},
                         batch_size=1024, annotate_concurrency=30,
                         options=AnnotateOptions(expand_hierarchy_levels=2,
                                                 expand_mappings=True))
    t0 = time.time()
    m = run_pipeline({in_dir!r}, {dict_dir!r}, {out_dir!r},
                     cfg.options, cfg)
    print(json.dumps({{"phase": phase, "metrics": m,
                      "wall": round(time.time() - t0, 1)}}))
ray.shutdown()
"""


def run_child(phase: str, dict_dir: str, kill_after: float | None = None):
    code = _CHILD_TEMPLATE.format(
        repo=REPO, phase=phase, rep=REP, sf_dir=SF_DIR, in_dir=IN_DIR,
        out_dir=OUT_DIR, num_buckets=NUM_BUCKETS, waves=WAVES,
        dict_dir=dict_dir)
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, cwd=REPO)
    if kill_after is None:
        out, _ = proc.communicate()
        line = [ln for ln in out.splitlines() if ln.startswith("{")]
        return json.loads(line[-1]) if line else None, time.time() - t0
    try:
        out, _ = proc.communicate(timeout=kill_after)
        line = [ln for ln in out.splitlines() if ln.startswith("{")]
        return json.loads(line[-1]) if line else None, time.time() - t0
    except subprocess.TimeoutExpired:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return {"phase": "run1", "killed": True}, time.time() - t0


def main() -> None:
    import shutil

    sys.path.insert(0, REPO)
    from kgref import docdict
    from kgref.stages.materialize import done_buckets

    # dictionary dir for run_pipeline (docdict tables snapshot)
    dict_dir = "/tmp/kgref_resume_dict"
    if not os.path.isdir(dict_dir):
        import pyarrow.parquet as pq

        os.makedirs(dict_dir)
        for name, tbl in docdict.tables().items():
            pq.write_table(tbl, os.path.join(dict_dir, f"{name}.parquet"))

    summary: dict = {"rep": REP, "num_buckets": NUM_BUCKETS, "waves": WAVES}

    if not os.path.isdir(IN_DIR):
        _r, wall = run_child("prepare", dict_dir)
        summary["prepare_sec"] = round(wall, 1)
    shutil.rmtree(OUT_DIR, ignore_errors=True)

    r1, wall1 = run_child("run1", dict_dir, kill_after=KILL_AFTER_S)
    done1 = len(done_buckets(OUT_DIR))
    summary["run1"] = {"killed": bool(r1 and r1.get("killed")),
                       "wall_sec": round(wall1, 1),
                       "buckets_manifested": done1}

    r2, wall2 = run_child("resume", dict_dir)
    done2 = len(done_buckets(OUT_DIR))
    summary["resume"] = {"wall_sec": round(wall2, 1),
                         "metrics": r2.get("metrics") if r2 else None,
                         "buckets_after": done2}

    # verify: every bucket manifested exactly once; row sum matches the
    # REP-scaled triple count from the benched REP=64 run (35,589,696)
    rows = 0
    mdir = os.path.join(OUT_DIR, "_manifest")
    for f in os.listdir(mdir):
        if f.startswith("bucket-"):
            rows += json.load(open(os.path.join(mdir, f)))["rows"]
    expected = 35_589_696 * REP // 64
    summary["verify"] = {"total_rows": rows, "expected_rows": expected,
                         "rows_match": rows == expected,
                         "all_buckets": done2 == NUM_BUCKETS}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
