"""Cross-document linking and corpus-drift analytics over the triples.

``conv_related`` is the KG-construction "related documents" operator:
conversations that share distinct annotated entities are link
candidates for cross-document coreference / thread merging.  Naively
this is a self-join of (conv, class) on class — O(df²) pairs per
class — so the operator df-filters first (classes present in more than
``max_conv_df`` conversations are stop-entities and excluded, the
standard similarity-join df-threshold), bounding per-class fan-out at
``max_conv_df``² and making the pair stage's output size a designed
quantity rather than a corpus accident.

Scale shape (100 TB story):
- per-batch partial dedup of (class, conv) shrinks the exchange to
  distinct combos per batch;
- ONE all-to-all on a coarse ``part = crc32(class) % n_parts`` key
  (class URIs dictionary-encoded, conv ids re-derived as int64 — the
  exchange moves ints and dict codes, never text);
- all rows of one class land in one partition, so the in-partition
  dedup, the df filter (run length == global document frequency) and
  the pair generation (``pairs_in_runs``) are all globally exact;
- pair counts combine per-partition before the final (conv_a, conv_b)
  Sum groupby, whose input is pair-dimension sized.

``class_drift`` is the corpus-snapshot monitoring aggregate: per
class, annotation counts in two halves of the corpus (even- vs
odd-numbered conversations — a deterministic stand-in for consecutive
snapshots) plus the second half's share in exact ppm.  One combiner
pass, one class-dimension groupby.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MIN_SHARED = 2      # pairs must share at least this many distinct classes
MAX_CONV_DF = 40    # stop-entity threshold: classes in more convs drop out
_N_PARTS = 64       # coarse partitions for the class-key exchange


def _triples(sf_dir: str):
    from ..queries import _annotate_ds
    from ..schemas import AnnotateOptions

    return _annotate_ds(sf_dir, AnnotateOptions())


def _conv_num(conv_id: pa.ChunkedArray | pa.Array) -> pa.Array:
    """'conv-<n>' -> int64 n (the arithmetic class_by_lang uses)."""
    s = pc.utf8_slice_codeunits(pc.cast(conv_id, pa.string()), 5, 2**31 - 1)
    return pc.cast(s, pa.int64())


def _class_part(obj: pa.Array, n_parts: int) -> pa.Array:
    """crc32 over dictionary uniques (classes repeat heavily per block):
    one Python call per UNIQUE class, not per row."""
    enc = obj.combine_chunks() if isinstance(obj, pa.ChunkedArray) else obj
    if not pa.types.is_dictionary(enc.type):
        enc = enc.dictionary_encode()
    lut = pa.array([zlib.crc32(u.encode()) % n_parts
                    for u in enc.dictionary.to_pylist()], pa.int32())
    return lut.take(enc.indices)


def related_kernel(df: pd.DataFrame, min_shared: int,
                   max_conv_df: int) -> pd.DataFrame:
    """One coarse partition: exact dedup, df filter, pair generation,
    partial pair counts.  All rows of a class are in this partition, so
    each run length IS the class's global document frequency."""
    from .pairs import pairs_in_runs

    sub = df.drop_duplicates(["obj", "conv"])
    codes, _ = pd.factorize(sub["obj"], sort=False)
    conv = sub["conv"].to_numpy(np.int64)
    order = np.lexsort((conv, codes))
    k = codes[order].astype(np.int64)
    c = conv[order]
    if len(k):
        counts = np.bincount(k)
        dfk = counts[k]
        keep = (dfk >= 2) & (dfk <= max_conv_df)
        ia, ib = pairs_in_runs(k[keep], None)
        ck = c[keep]
        conv_a, conv_b = ck[ia], ck[ib]  # run sorted asc -> a < b strict
    else:
        conv_a = conv_b = np.empty(0, np.int64)
    out = (pd.DataFrame({"conv_a": conv_a, "conv_b": conv_b})
           .groupby(["conv_a", "conv_b"], sort=False)
           .size().reset_index(name="n"))
    out["n"] = out["n"].astype("int64")
    return out


def conv_related(sf_dir: str, min_shared: int = MIN_SHARED,
                 max_conv_df: int = MAX_CONV_DF):
    """(conv_a, conv_b, n_shared) with conv_a < conv_b: conversation
    pairs sharing >= min_shared distinct annotated classes, stop-entity
    classes (document frequency > max_conv_df) excluded."""
    from ray.data.aggregate import Sum

    def to_keyed(t: pa.Table) -> pa.Table:
        keyed = pa.Table.from_arrays(
            [t.column("obj"), _conv_num(t.column("conv_id"))],
            names=["obj", "conv"])
        # partial dedup: the exchange carries distinct combos per batch
        keyed = pa.TableGroupBy(keyed, ["obj", "conv"]).aggregate([])
        return keyed.append_column(
            "part", _class_part(keyed.column("obj"), _N_PARTS))

    pairs = (_triples(sf_dir)
             .map_batches(to_keyed, batch_format="pyarrow")
             .groupby("part")
             .map_groups(lambda df: related_kernel(
                 df.drop(columns=["part"]), min_shared, max_conv_df),
                 batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_shared"),
                                         pa.scalar(min_shared, pa.int64())))

    return (pairs.groupby(["conv_a", "conv_b"])
            .aggregate(Sum("n", alias_name="n_shared"))
            .map_batches(finish, batch_format="pyarrow"))


def conv_related_sql(min_shared: int = MIN_SHARED,
                     max_conv_df: int = MAX_CONV_DF) -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
cp AS (SELECT DISTINCT CAST(substr(conv_id, 6) AS BIGINT) AS conv, obj
       FROM tri WHERE pred = 'annotated_with'),
elig AS (SELECT obj FROM cp GROUP BY obj
         HAVING count(*) BETWEEN 2 AND {max_conv_df}),
p AS (SELECT a.conv AS conv_a, b.conv AS conv_b
      FROM cp a JOIN cp b ON a.obj = b.obj AND a.conv < b.conv
      JOIN elig e ON e.obj = a.obj)
SELECT conv_a, conv_b, CAST(count(*) AS BIGINT) AS n_shared
FROM p GROUP BY conv_a, conv_b HAVING count(*) >= {min_shared}
"""


def class_drift(sf_dir: str):
    """(class_uri, n_a, n_b, share_b_ppm): direct-annotation counts in
    even- vs odd-numbered conversations plus the odd half's share in
    exact parts-per-million (10^6 * n_b // (n_a + n_b)) — the
    snapshot-over-snapshot drift report a production annotation
    pipeline runs after every dictionary or corpus refresh."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        half = (df["conv_id"].str.slice(5).astype(np.int64) % 2).to_numpy()
        g = (pd.DataFrame({"class_uri": df["obj"].to_numpy(), "b": half})
             .groupby("class_uri", sort=False)["b"]
             .agg(["size", "sum"]).reset_index())
        g["n_a"] = (g["size"] - g["sum"]).astype("int64")
        g["n_b"] = g["sum"].astype("int64")
        return g[["class_uri", "n_a", "n_b"]]

    agg = (_triples(sf_dir)
           .map_batches(partial, batch_format="pandas")
           .groupby("class_uri")
           .aggregate(Sum("n_a", alias_name="n_a"),
                      Sum("n_b", alias_name="n_b")))

    I64 = 2**63 - 1

    def finish(t: pa.Table) -> pa.Table:
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb = t.column("n_b").to_numpy(zero_copy_only=False)
        share = np.empty(len(na), np.int64)
        ok = nb <= I64 // 1_000_000  # exact int64 guard (class_lift shape)
        oki = np.flatnonzero(ok)
        share[oki] = (1_000_000 * nb[oki]) // (na[oki] + nb[oki])
        for i in np.flatnonzero(~ok):  # Python-int exactness past 9.2e12
            share[i] = (1_000_000 * int(nb[i])) // (int(na[i]) + int(nb[i]))
        return pa.Table.from_arrays(
            [t.column("class_uri"), t.column("n_a"), t.column("n_b"),
             pa.array(share)],
            names=["class_uri", "n_a", "n_b", "share_b_ppm"])

    return agg.map_batches(finish, batch_format="pyarrow")


def class_drift_sql() -> str:
    from ..queries import annotate_oracle_sql
    from ..schemas import AnnotateOptions

    tri = annotate_oracle_sql(AnnotateOptions())
    return f"""
WITH tri AS ({tri}),
k AS (SELECT obj, CAST(substr(conv_id, 6) AS BIGINT) % 2 AS half
      FROM tri WHERE pred = 'annotated_with')
SELECT obj AS class_uri,
       CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST((1000000 * sum(CASE WHEN half = 1 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS share_b_ppm
FROM k GROUP BY obj
"""


def register(q: dict, o: dict | None = None) -> None:
    q["conv_related"] = conv_related
    q["class_drift"] = class_drift
    if o is not None:
        o["conv_related"] = conv_related_sql()
        o["class_drift"] = class_drift_sql()
