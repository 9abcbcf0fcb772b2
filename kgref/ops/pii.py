"""PII detection + redaction — a standard compliance stage of a
training-data pipeline: find emails / phone numbers / IPv4 addresses
and replace them with typed placeholders, reporting per-doc counts.

Scale shape: a pure map — one ``map_batches`` over Arrow batches, all
work in RE2 kernels (``count_substring_regex`` /
``replace_substring_regex``), no Python per row, no shuffle, no state.
At 100 TB this stage is embarrassingly parallel and I/O-bound.

Oracle parity: Arrow and DuckDB both compile these patterns with RE2,
so counts and replacements agree byte-for-byte.  The documents corpus
contains no organic PII, so the gate query plants it deterministically
from ``doc_id`` (modular conditions vary the counts per row) with the
SAME expression on the SQL side — every kernel is exercised, including
the zero-match rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# applied in this order on both sides (email first: its domain part
# would otherwise be partially eaten by the IP pattern)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_RULES = (("email", EMAIL_RE, "[EMAIL]"),
          ("phone", PHONE_RE, "[PHONE]"),
          ("ip", IP_RE, "[IP]"))


def redact_batch(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Count then redact each PII class; returns the redacted column
    plus one int32 count column per class."""
    out: dict[str, pa.Array] = {}
    x = col
    for name, pat, repl in _RULES:
        out[f"n_{name}s"] = pc.cast(pc.count_substring_regex(x, pat),
                                    pa.int32())
        x = pc.replace_substring_regex(x, pattern=pat, replacement=repl)
    out["text_redacted"] = x
    return out


def redact_pii(sf_dir: str):
    """Gate query: plant PII deterministically from doc_id (email on
    doc_id%3==0, phone on %4==0, ip on %5==0), then count + redact."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def run(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        did_s = pc.cast(did, pa.string())
        empty = pa.array([""] * len(batch), pa.string())

        def mod(m: int) -> pa.Array:
            # nonneg int64 modulo via truncating int division (no mod
            # kernel in this Arrow build)
            return pc.subtract(did, pc.multiply(pc.divide(did, m), m))

        def piece(m: int, parts: list) -> pa.Array:
            frag = pc.binary_join_element_wise(*parts, "")
            return pc.if_else(pc.equal(mod(m), 0), frag, empty)

        email = piece(3, [pa.array([" reach me at user"] * len(batch)),
                          did_s, pa.array(["@example.com"] * len(batch))])
        phone = piece(4, [pa.array([" call 555-123-"] * len(batch)),
                          pc.utf8_lpad(pc.cast(mod(10000), pa.string()),
                                       4, "0"), empty])
        ip = piece(5, [pa.array([" from 192.168."] * len(batch)),
                       pc.cast(mod(256), pa.string()),
                       pc.binary_join_element_wise(
                           pa.array(["."] * len(batch)),
                           pc.cast(mod(100), pa.string()), "")])
        dirty = pc.binary_join_element_wise(
            batch.column("text"), email, phone, ip, "")

        cols = redact_batch(dirty)
        return pa.Table.from_arrays(
            [did, cols["text_redacted"], cols["n_emails"],
             cols["n_phones"], cols["n_ips"]],
            names=["doc_id", "text_redacted", "n_emails", "n_phones",
                   "n_ips"])

    return ds.map_batches(run, batch_format="pyarrow")


def redact_pii_sql() -> str:
    email, phone, ip = EMAIL_RE, PHONE_RE, IP_RE
    return f"""
WITH dirty AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' reach me at user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)
                 ELSE '' END AS t
  FROM documents),
c1 AS (SELECT doc_id, t,
              CAST(len(regexp_extract_all(t, '{email}')) AS INTEGER) AS n_emails,
              regexp_replace(t, '{email}', '[EMAIL]', 'g') AS t1
       FROM dirty),
c2 AS (SELECT doc_id, n_emails,
              CAST(len(regexp_extract_all(t1, '{phone}')) AS INTEGER) AS n_phones,
              regexp_replace(t1, '{phone}', '[PHONE]', 'g') AS t2
       FROM c1)
SELECT doc_id,
       regexp_replace(t2, '{ip}', '[IP]', 'g') AS text_redacted,
       n_emails, n_phones,
       CAST(len(regexp_extract_all(t2, '{ip}')) AS INTEGER) AS n_ips
FROM c2
"""


def register(q: dict, o: dict | None = None) -> None:
    q["redact_pii"] = redact_pii
    if o is not None:
        o["redact_pii"] = redact_pii_sql()
