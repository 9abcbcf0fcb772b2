"""Input sources (SURVEY.md §2.1).

The reference's input source is a single request string per ``annotate``
call; the corpus-scale equivalent is a Parquet table of transcripts
(BASELINE.json input_hint).  Reads always prune to the columns a stage
needs — the annotate path needs only (conv_id, turn_idx, text)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

ANNOTATE_COLUMNS = ["conv_id", "turn_idx", "text"]


def read_transcripts(path: str | list[str], *, columns: list[str] | None = None,
                     override_num_blocks: int | None = None) -> rd.Dataset:
    return rd.read_parquet(
        path,
        columns=columns or ANNOTATE_COLUMNS,
        override_num_blocks=override_num_blocks,
    )


def read_transcripts_jsonl(path: str | list[str], *,
                           columns: list[str] | None = None) -> rd.Dataset:
    """JSON-lines transcripts source (one turn object per line) — the
    common log-export shape.  Projection happens right after parse
    (JSON readers cannot push projection into the file), so only the
    annotate columns flow downstream."""
    ds = rd.read_json(path)
    keep = columns or ANNOTATE_COLUMNS

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(keep)

    return ds.map_batches(project, batch_format="pyarrow")


def read_transcripts_csv(path: str | list[str], *,
                         columns: list[str] | None = None) -> rd.Dataset:
    """CSV transcripts source — the spreadsheet/export shape.  Arrow's
    CSV reader pushes the projection into the parse (include_columns),
    so unneeded columns never materialize; types are pinned rather than
    inferred (a turn_idx column of all '0's must not come back as
    string on one shard and int on another)."""
    from pyarrow import csv as pacsv

    keep = columns or ANNOTATE_COLUMNS
    return rd.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            include_columns=keep,
            column_types={"conv_id": pa.string(),
                          "turn_idx": pa.int32(),
                          "text": pa.string()}),
    )


def documents_as_transcripts(sf_dir: str, *, turns_per_conv: int = 16,
                             override_num_blocks: int | None = None,
                             digit_suffix_mod: int | None = None) -> rd.Dataset:
    """Adapter: the driver's ``documents`` table viewed as transcripts.

    Deterministic, order-independent mapping — conv/turn derive from
    doc_id alone: conv_id = f'conv-{doc_id // turns_per_conv}' (UNPADDED
    — the SQL oracles concatenate the same way), turn_idx =
    doc_id % turns_per_conv.  Used by bench/demo runs so the
    flagship pipeline exercises the exact input_hint shape without
    synthesizing external data.

    ``digit_suffix_mod=m`` appends ``' ' || doc_id % m`` to each text —
    the documents vocabulary is digit-free ([a-z ]), so this gives the
    exclude_numbers (M6) gate queries a digit-bearing corpus derived
    purely from the driver's own table (same expression in SQL)."""

    def to_turns(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_id = batch.column("doc_id")
        conv_num = pc.divide(doc_id, turns_per_conv)
        conv_id = pc.binary_join_element_wise(
            pa.array(["conv-"] * len(batch)),
            pc.cast(conv_num, pa.string()),
            "",
        )
        turn_idx = pc.cast(pc.subtract(doc_id, pc.multiply(conv_num, turns_per_conv)),
                           pa.int32())
        text = batch.column("text")
        if digit_suffix_mod is not None:
            text = pc.binary_join_element_wise(
                text,
                pc.cast(pc.subtract(
                    doc_id, pc.multiply(pc.divide(doc_id, digit_suffix_mod),
                                        digit_suffix_mod)), pa.string()),
                " ",
            )
        return pa.Table.from_arrays(
            [conv_id, turn_idx, text],
            names=["conv_id", "turn_idx", "text"],
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(to_turns, batch_format="pyarrow")
