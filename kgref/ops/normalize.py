"""Text normalization — the canonical first stage of a training-data
pipeline: Unicode NFC, case fold to lowercase, whitespace collapse,
edge trim.  Pure Arrow C kernels (``utf8_normalize`` / ``utf8_lower`` /
``replace_substring_regex`` / ``utf8_trim_whitespace``) in one
``map_batches`` — no Python per row, no shuffle.

The gate query normalizes a deterministically "messied" view of the
documents table (uppercased, doubled spaces, edge padding — the same
expression on the SQL side) and must recover byte-identical clean text,
so the oracle exercises every kernel rather than passing on an
already-clean corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _nfc(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """True NFC composition.  Arrow 16's ``utf8_normalize(form='NFC')``
    does NOT compose (measured: 'e'+U+0301 comes back decomposed,
    diverging from DuckDB's nfc_normalize), so: vectorized ASCII check
    (byte length == char length ⇒ NFC-invariant), then the Python
    unicodedata fallback runs ONLY over the non-ASCII rows of the batch
    (take by mask + replace_with_mask scatter) — a mixed batch pays
    Python cost proportional to its non-ASCII rows, not its size."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    non_ascii = pc.fill_null(
        pc.not_equal(pc.binary_length(col), pc.utf8_length(col)), False)
    if not pc.any(non_ascii).as_py():  # all-ASCII batch: NFC-invariant
        return col
    import unicodedata

    sub = col.filter(non_ascii)
    fixed = pa.array([unicodedata.normalize("NFC", s)
                      for s in sub.to_pylist()], pa.string())
    return pc.replace_with_mask(col, non_ascii, fixed)


def normalize_batch(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """NFC → lower → collapse \\s+ → trim; Arrow kernels except the
    non-ASCII NFC fallback (see _nfc)."""
    x = pc.utf8_lower(_nfc(col))
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


def normalize_docs(sf_dir: str):
    """Gate query: messy = '  ' || upper(text) with doubled spaces,
    normalized back — output must equal the original text."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        messy = pc.binary_join_element_wise(
            pa.array(["  "] * len(batch)),
            pc.replace_substring(pc.utf8_upper(batch.column("text")),
                                 pattern=" ", replacement="   "),
            pa.array([" "] * len(batch)), "")
        return pa.Table.from_arrays(
            [batch.column("doc_id"), normalize_batch(messy)],
            names=["doc_id", "text_norm"])

    return ds.map_batches(norm, batch_format="pyarrow")


def normalize_docs_sql() -> str:
    return r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(
           '  ' || replace(upper(text), ' ', '   ') || ' ')),
           '\s+', ' ', 'g')) AS text_norm
FROM documents
"""


def register(q: dict, o: dict | None = None) -> None:
    q["normalize_docs"] = normalize_docs
    if o is not None:
        o["normalize_docs"] = normalize_docs_sql()
