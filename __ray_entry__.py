"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library code it calls) touches ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship transcript encode→decode round trip on sf0.001.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 coverage map lives in
  ``fhirflat_ray/pipelines/queries.py``).
- ``oracle_sql()``: matching DuckDB SQL with identical column names;
  heuristic/hash-construction ops are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the transcript
    table from events, encode it to segments, decode it back, return the
    decoded Dataset (bit-identical to the built table)."""
    from fhirflat_ray.pipelines.queries import transcript_roundtrip

    return transcript_roundtrip("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from fhirflat_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fhirflat_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
