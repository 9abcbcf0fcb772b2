"""Local simulation of the driver's correctness gate: run every
queries() entry via Ray AND its oracle_sql() via DuckDB on the same
sf dir, compare row count, sorted-column schema, and an
order-insensitive value hash.  Usage:

    python scripts/check_oracle_parity.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, ".")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as e
    from kgref.queries import SF_TABLES

    con = duckdb.connect()
    for t in SF_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if filt and filt not in name:
            continue
        t0 = time.time()
        got = to_pandas(fn(sf_dir))
        ray_s = time.time() - t0
        if name not in os_:
            print(f"  {name:28s} rows-only: {len(got):7d} rows "
                  f"({ray_s:.1f}s ray)")
            continue
        want = con.execute(os_[name]).fetchdf()
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got.columns) == sorted(want.columns)
        gh, wh = value_hash(got), value_hash(want)
        ok = ok_rows and ok_schema and gh == wh
        status = "OK " if ok else "FAIL"
        print(f"  {name:28s} {status} rows {len(got)}/{len(want)} "
              f"hash {gh}/{wh} ({ray_s:.1f}s ray)")
        if not ok:
            failures += 1
            if not ok_schema:
                print(f"    ray cols:  {sorted(got.columns)}")
                print(f"    sql cols:  {sorted(want.columns)}")
            else:
                g = got[sorted(got.columns)].astype(str)
                w = want[sorted(want.columns)].astype(str)
                gs = set(map(tuple, g.itertuples(index=False, name=None)))
                ws = set(map(tuple, w.itertuples(index=False, name=None)))
                print(f"    only-ray ({len(gs - ws)}): "
                      f"{sorted(gs - ws)[:2]}")
                print(f"    only-sql ({len(ws - gs)}): "
                      f"{sorted(ws - gs)[:2]}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
