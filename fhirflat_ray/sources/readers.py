"""Input sources: parquet (primary), NDJSON bulk, CSV — all as Ray Datasets.

The NDJSON path mirrors the reference's bulk import
(/root/reference/fhirflat/resources/base.py:299-320): newline-delimited JSON
records parsed per batch, then cast to the declared schema. The CSV path
mirrors ``create_dictionary``'s ``pd.read_csv``
(/root/reference/fhirflat/ingest.py:306-307).
"""

from __future__ import annotations

import pyarrow as pa


def read_parquet_table(paths, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns)


def read_ndjson_transcripts(paths, schema: pa.Schema | None = None):
    """NDJSON → transcript Dataset with the canonical schema applied.

    ``ray.data.read_json`` handles NDJSON natively (one file fragment per
    block); the cast stage normalizes inferred types (int64 → int32 turn_idx,
    strings → timestamps) so downstream codecs see the canonical layout.
    """
    import ray.data as rd

    from fhirflat_ray.schema import TRANSCRIPT_SCHEMA

    schema = schema or TRANSCRIPT_SCHEMA

    def cast(batch: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            arr = batch.column(f.name)
            if arr.type != f.type:
                # Arrow casts ISO-8601 strings to timestamp directly; all
                # other mismatches (int64→int32 etc.) are plain casts
                arr = arr.cast(f.type)
            cols.append(arr)
        return pa.Table.from_arrays(
            [c.combine_chunks() for c in cols], schema=schema
        )

    # file_extensions=None: accept .ndjson/.jsonl/extension-less bulk files
    return rd.read_json(paths, file_extensions=None).map_batches(
        cast, batch_format="pyarrow"
    )


def read_csv_table(paths, columns: list[str] | None = None):
    import ray.data as rd

    ds = rd.read_csv(paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_errors_csv(errors_ds, dest_dir: str) -> None:
    """Error rows → CSV directory (the ``*_errors.csv`` analogue,
    /root/reference/fhirflat/ingest.py:572-575)."""
    errors_ds.write_csv(dest_dir)
