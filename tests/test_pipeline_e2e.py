"""End-to-end pipeline test on the seed-42 fixtures: read → annotate
actors → shuffle → partitioned write, then golden P/R, stable ordering,
and checkpoint-resume (SURVEY.md §5 rebuild plan items 5–7)."""

import glob
import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from kgref.pipelines.annotate_pipeline import run_pipeline
from kgref.schemas import AnnotateOptions, PipelineConfig
from kgref.stages.materialize import bucket_of, done_buckets

OPTS = AnnotateOptions(expand_hierarchy_levels=999, expand_mappings=True,
                       longest_only=True, min_term_size=4)  # in goldens (§4)
CFG = PipelineConfig(num_buckets=8, batch_size=512, annotate_concurrency=2,
                     hot_conv_rows=100, salt_chunk=50,
                     options=OPTS)


def read_output(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")))
    assert files, "no output files written"
    return pq.read_table(files)


def triple_set(t):
    return set(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                   t.column("obj").to_pylist(), t.column("match_type").to_pylist(),
                   t.column("distance").to_pylist()))


@pytest.fixture(scope="module")
def run(ray_session, fixture_bundle, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("e2e_out"))
    metrics = run_pipeline(fixture_bundle["transcripts_dir"],
                           fixture_bundle["dict_dir"], out_dir, OPTS, CFG)
    return out_dir, metrics


def test_pr_vs_golden_is_1(run, fixture_bundle):
    out_dir, metrics = run
    got = triple_set(read_output(out_dir))
    golden = pq.read_table(fixture_bundle["golden_path"])
    want = triple_set(golden.filter(pc.equal(golden["options_key"], OPTS.key())))
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} extra={list(got - want)[:3]} "
        f"missing={list(want - got)[:3]}"
    )
    assert metrics["rows"] == len(want)


def test_stable_turn_ordering_within_files(run):
    out_dir, _ = run
    for f in glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")):
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "from_1b"])
        last = {}
        for cid, ti, fr in zip(t.column("conv_id").to_pylist(),
                               t.column("turn_idx").to_pylist(),
                               t.column("from_1b").to_pylist()):
            if cid in last:
                assert (ti, fr) >= last[cid], f"order regression in {f} for {cid}"
            last[cid] = (ti, fr)


def test_bucket_assignment_is_deterministic(run):
    out_dir, _ = run
    for d in glob.glob(os.path.join(out_dir, "bucket=*")):
        bid = int(os.path.basename(d).split("=")[1])
        t = pq.read_table(glob.glob(os.path.join(d, "*.parquet")),
                          columns=["conv_id"])
        for cid in set(t.column("conv_id").to_pylist()):
            assert bucket_of(cid, CFG.num_buckets) == bid


def test_manifests_carry_lineage_and_metrics(run):
    out_dir, metrics = run
    mfiles = glob.glob(os.path.join(out_dir, "_manifest", "bucket-*.json"))
    assert len(mfiles) == metrics["buckets"]
    total = 0
    for mf in mfiles:
        m = json.load(open(mf))
        assert m["lineage"]["dict_version"] == "v1"
        assert m["lineage"]["options_key"] == OPTS.key()
        assert m["rows"] > 0 and m["num_convs"] > 0
        total += m["rows"]
    assert total == metrics["rows"]


def test_resume_skips_done_and_rebuilds_missing(run, fixture_bundle):
    out_dir, first = run
    before = triple_set(read_output(out_dir))
    done_before = done_buckets(out_dir)
    # simulate a failed bucket: remove its data + manifest
    victim = sorted(done_before)[0]
    shutil.rmtree(os.path.join(out_dir, f"bucket={victim:04d}"))
    os.remove(os.path.join(out_dir, "_manifest", f"bucket-{victim}.json"))

    metrics2 = run_pipeline(fixture_bundle["transcripts_dir"],
                            fixture_bundle["dict_dir"], out_dir, OPTS, CFG)
    # only the victim bucket was reprocessed
    assert metrics2["buckets"] == 1
    assert done_buckets(out_dir) == done_before
    after = triple_set(read_output(out_dir))
    assert after == before  # byte-identical semantics: same triple set


def test_salting_was_exercised(run, fixture_bundle):
    # fixture has hot convs (200-400 turns) above the 100-turn threshold;
    # their output must still be correctly ordered (covered above) and
    # present in full
    out_dir, _ = run
    t = read_output(out_dir)
    counts = {}
    for cid in t.column("conv_id").to_pylist():
        counts[cid] = counts.get(cid, 0) + 1
    assert max(counts.values()) > 100  # a hot conv produced >100 triples


def test_waves_produce_identical_output(run, fixture_bundle,
                                        tmp_path_factory):
    """cfg.waves=4 (checkpoint granularity) yields the same triple set
    as the single-wave run, with per-wave lineage in the manifests."""
    import dataclasses

    out_dir, _ = run
    want = triple_set(read_output(out_dir))
    wave_out = str(tmp_path_factory.mktemp("e2e_waves"))
    cfg = dataclasses.replace(CFG, waves=4)
    metrics = run_pipeline(fixture_bundle["transcripts_dir"],
                           fixture_bundle["dict_dir"], wave_out, OPTS, cfg)
    assert metrics["buckets"] == CFG.num_buckets
    assert triple_set(read_output(wave_out)) == want
    waves_seen = set()
    for mf in glob.glob(os.path.join(wave_out, "_manifest", "bucket-*.json")):
        waves_seen.add(json.load(open(mf))["lineage"]["wave"])
    assert waves_seen == {0, 1, 2, 3}


def test_resume_rejects_incompatible_config(run, fixture_bundle):
    out_dir, _ = run
    import dataclasses

    with pytest.raises(ValueError, match="resume mismatch"):
        run_pipeline(fixture_bundle["transcripts_dir"],
                     fixture_bundle["dict_dir"], out_dir, OPTS,
                     dataclasses.replace(CFG, num_buckets=16))
    with pytest.raises(ValueError, match="resume mismatch"):
        run_pipeline(fixture_bundle["transcripts_dir"],
                     fixture_bundle["dict_dir"], out_dir,
                     AnnotateOptions(min_term_size=9), CFG)


def test_stale_staging_from_crash_does_not_duplicate(run, fixture_bundle,
                                                     tmp_path_factory):
    """A crashed run's partial _staging files must not be merged into
    finalized buckets on the next run."""
    out_dir, _ = run
    want = triple_set(read_output(out_dir))
    crash_out = str(tmp_path_factory.mktemp("e2e_crash"))
    # simulate a crash remnant: stale parquet in staging for bucket 0
    stale = os.path.join(crash_out, "_staging", "bucket=0")
    os.makedirs(stale)
    first = glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet"))[0]
    shutil.copy(first, os.path.join(stale, "stale-leftover.parquet"))
    run_pipeline(fixture_bundle["transcripts_dir"],
                 fixture_bundle["dict_dir"], crash_out, OPTS, CFG)
    assert triple_set(read_output(crash_out)) == want


def test_recognizer_plugin_swaps_engine(ray_session, fixture_bundle):
    """build_triples(recognizer=RegexAnnotateTriples) must produce the
    exact triple set of the default AC/token-window recognizer — the
    plugin surface is live, not vestigial."""
    import ray

    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.sources.transcripts import read_transcripts
    from kgref.stages.annotate import RegexAnnotateTriples
    from kgref.state.dictionary import DictionaryState

    state_ref = ray.put(DictionaryState.from_dir(fixture_bundle["dict_dir"]))
    cfg = PipelineConfig(batch_size=512, annotate_concurrency=2)

    import pyarrow as pa

    from kgref.stages.annotate import AnnotateTriples

    def collect(recognizer):
        ds = read_transcripts(fixture_bundle["transcripts_dir"])
        t = build_triples(ds, state_ref, OPTS, cfg, recognizer=recognizer)
        return triple_set(pa.Table.from_pylist(t.take_all()))

    default = collect(recognizer=AnnotateTriples)
    regex = collect(recognizer=RegexAnnotateTriples)
    assert default and default == regex


def test_jsonl_source_feeds_the_pipeline(ray_session, fixture_bundle,
                                         tmp_path_factory):
    """A JSONL export of the fixture transcripts must produce the same
    triples as the parquet source."""
    import json as _json

    import pyarrow as pa
    import ray

    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.sources.transcripts import (
        read_transcripts,
        read_transcripts_jsonl,
    )
    from kgref.state.dictionary import DictionaryState

    src = pq.read_table(sorted(glob.glob(
        fixture_bundle["transcripts_dir"] + "/*.parquet")))
    jdir = tmp_path_factory.mktemp("jsonl")
    with open(jdir / "t.jsonl", "w") as fh:
        for row in src.to_pylist():
            fh.write(_json.dumps({k: row[k] for k in
                                  ("conv_id", "turn_idx", "text")}) + "\n")

    state_ref = ray.put(DictionaryState.from_dir(fixture_bundle["dict_dir"]))
    cfg = PipelineConfig(batch_size=512, annotate_concurrency=2)

    def collect(ds):
        t = build_triples(ds, state_ref, OPTS, cfg)
        return triple_set(pa.Table.from_pylist(t.take_all()))

    a = collect(read_transcripts(fixture_bundle["transcripts_dir"]))
    b = collect(read_transcripts_jsonl(str(jdir / "t.jsonl")))
    assert a and a == b


def test_csv_source_feeds_the_pipeline(ray_session, fixture_bundle,
                                       tmp_path_factory):
    """A CSV export of the fixture transcripts must produce the same
    triples as the parquet source (and pin column types: a turn_idx
    column must come back int even when every value parses as text)."""
    import csv as _csv

    import pyarrow as pa
    import ray

    from kgref.pipelines.annotate_pipeline import build_triples
    from kgref.sources.transcripts import (
        read_transcripts,
        read_transcripts_csv,
    )
    from kgref.state.dictionary import DictionaryState

    src = pq.read_table(sorted(glob.glob(
        fixture_bundle["transcripts_dir"] + "/*.parquet")))
    cdir = tmp_path_factory.mktemp("csv")
    with open(cdir / "t.csv", "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["conv_id", "turn_idx", "text", "extra_col"])
        for row in src.to_pylist():
            w.writerow([row["conv_id"], row["turn_idx"], row["text"], "x"])

    ds = read_transcripts_csv(str(cdir / "t.csv"))
    sch = ds.schema()
    assert set(sch.names) == {"conv_id", "turn_idx", "text"}  # projected
    assert sch.base_schema.field("turn_idx").type == pa.int32()

    state_ref = ray.put(DictionaryState.from_dir(fixture_bundle["dict_dir"]))
    cfg = PipelineConfig(batch_size=512, annotate_concurrency=2)

    def collect(d):
        t = build_triples(d, state_ref, OPTS, cfg)
        return triple_set(pa.Table.from_pylist(t.take_all()))

    a = collect(read_transcripts(fixture_bundle["transcripts_dir"]))
    b = collect(ds)
    assert a and a == b
