"""Remote mapping-sheet fetch (SURVEY S4).

Semantics mirror the reference's Google-Sheets mapping download
(/root/reference/fhirflat/ingest.py:496-507): a sheet id expands to the
CSV export URL ``https://docs.google.com/spreadsheets/d/{id}/export?
format=csv``, the index tab is a CSV keyed by a ``Resources`` column with
``Resource Type`` and ``Sheet ID`` columns, and each resource's mapping
tab is the same export URL with ``&gid={sheet_id}`` appended.

Local analogue: when the index source is a filesystem path (or ``file://``
URL) each ``Sheet ID`` value is read as a sibling filename next to the
index CSV, so a mapping pack can be shipped as a plain directory and
fetched through the identical code path.

Scale/shape notes (100 TB discipline): mapping packs are tiny side inputs
(hundreds of rows). They are fetched ONCE on the driver and handed to the
engine as pandas frames that the mapping stages broadcast via ``ray.put``
(see ``apply_mapping_long``) — a fetch never happens inside a Ray task.
``download_mapping_pack`` writes atomically (tmp + rename) so an
interrupted download is simply re-run.
"""

from __future__ import annotations

import io
import json
import os
import urllib.error
import urllib.request

import pandas as pd

GOOGLE_SHEET_EXPORT = (
    "https://docs.google.com/spreadsheets/d/{sheet_id}/export?format=csv"
)


class MappingFetchError(RuntimeError):
    """A mapping CSV could not be fetched (bad URL, no network, missing file)."""


def sheet_export_url(sheet_id: str, gid: str | int | None = None) -> str:
    """CSV export URL for a Google Sheet, optionally pinned to one tab —
    the reference's ``sheet_link`` / ``sheet_link + f"&gid={i}"`` pair
    (/root/reference/fhirflat/ingest.py:496-507)."""
    url = GOOGLE_SHEET_EXPORT.format(sheet_id=sheet_id)
    if gid is not None:
        url += f"&gid={gid}"
    return url


def fetch_bytes(source: str, timeout: float = 30.0) -> bytes:
    """Read ``source`` as bytes: ``http(s)://`` / ``file://`` URL or a
    local filesystem path. Network failures raise :class:`MappingFetchError`
    with a hint that sandboxed hosts must use local paths or loopback URLs."""
    if "://" in source:
        try:
            with urllib.request.urlopen(source, timeout=timeout) as resp:  # noqa: S310
                return resp.read()
        except (urllib.error.URLError, OSError, ValueError) as exc:
            raise MappingFetchError(
                f"could not fetch mapping CSV from {source!r}: {exc}. "
                "If this host has no external network, pass a local path, "
                "file:// URL, or loopback http:// URL instead."
            ) from exc
    try:
        with open(source, "rb") as fh:
            return fh.read()
    except OSError as exc:
        raise MappingFetchError(
            f"could not read mapping CSV at {source!r}: {exc}"
        ) from exc


def fetch_csv(source: str, timeout: float = 30.0, **read_csv_kwargs) -> pd.DataFrame:
    """Fetch ``source`` and parse it as CSV (the ``pd.read_csv(sheet_link)``
    analogue, /root/reference/fhirflat/ingest.py:500)."""
    return pd.read_csv(io.BytesIO(fetch_bytes(source, timeout)), **read_csv_kwargs)


def _is_local(source: str) -> bool:
    return "://" not in source or source.startswith("file://")


def _local_path(source: str) -> str:
    return source[len("file://") :] if source.startswith("file://") else source


def _check_component(value: str, what: str) -> str:
    """Reject index-CSV values that would escape the pack directory when
    used as a path component (the index is REMOTE input — a crafted
    ``Resources`` or ``Sheet ID`` value must not become '../…')."""
    s = str(value)
    if not s or s != os.path.basename(s) or s in (".", ".."):
        raise MappingFetchError(
            f"mapping index {what} {s!r} is not a safe filename component"
        )
    return s


def _tab_source(index_source: str, gid) -> str:
    """Per-resource tab address: ``gid`` query parameter for URL sources,
    sibling filename for local packs."""
    if _is_local(index_source):
        return os.path.join(
            os.path.dirname(_local_path(index_source)),
            _check_component(gid, "Sheet ID"),
        )
    sep = "&" if "?" in index_source else "?"
    return f"{index_source}{sep}gid={gid}"


def fetch_mapping_index(
    index_source: str, timeout: float = 30.0
) -> tuple[dict[str, str], dict[str, object]]:
    """Read the index tab → (``types``, ``gids``): resource name to mapping
    type ("one-to-one"/"one-to-many") and to its tab id. Mirrors the
    reference's strict index/type zip and ``Sheet ID`` lookup
    (/root/reference/fhirflat/ingest.py:500-506)."""
    # parse first, then check columns explicitly — inferring a missing
    # 'Resources' column from read_csv's ValueError misdiagnosed ragged /
    # malformed CSVs (which raise ValueError for unrelated reasons)
    df = fetch_csv(index_source, timeout=timeout, header=0)
    if "Resources" not in df.columns:
        raise MappingFetchError(
            f"mapping index {index_source!r} is missing the 'Resources' column "
            f"(found {list(df.columns)})"
        )
    df = df.set_index("Resources")
    for col in ("Resource Type", "Sheet ID"):
        if col not in df.columns:
            raise MappingFetchError(
                f"mapping index {index_source!r} is missing the {col!r} column "
                f"(found {list(df.columns)})"
            )
    if not df.index.is_unique:
        dupes = df.index[df.index.duplicated()].unique().tolist()
        raise MappingFetchError(
            f"mapping index {index_source!r} lists resources more than once: {dupes}"
        )
    types = dict(zip(df.index, df["Resource Type"], strict=True))
    gids = {r: df.loc[r, "Sheet ID"] for r in types}
    return types, gids


def fetch_mappings(
    sheet_id: str | None = None,
    *,
    index_source: str | None = None,
    timeout: float = 30.0,
) -> tuple[dict[str, pd.DataFrame], dict[str, str]]:
    """Full S4 fetch: ``(mappings, types)`` where ``mappings[resource]`` is
    that resource's mapping table as a DataFrame, ready for the broadcast
    mapping stages (``apply_mapping_long``). Exactly one of ``sheet_id``
    (Google-Sheets id) or ``index_source`` (any URL/path) must be given —
    the reference's ``mapping_files_types``-or-``sheet_id`` contract
    (/root/reference/fhirflat/ingest.py:480-481)."""
    if (sheet_id is None) == (index_source is None):
        raise TypeError("provide exactly one of sheet_id or index_source")
    base = sheet_export_url(sheet_id) if sheet_id is not None else index_source
    types, gids = fetch_mapping_index(base, timeout=timeout)
    mappings = {
        r: fetch_csv(_tab_source(base, gid), timeout=timeout)
        for r, gid in gids.items()
    }
    return mappings, types


def download_mapping_pack(
    dest_dir: str,
    sheet_id: str | None = None,
    *,
    index_source: str | None = None,
    timeout: float = 30.0,
) -> dict[str, str]:
    """Fetch every mapping tab and persist ``{resource}.csv`` plus a
    ``types.json`` sidecar under ``dest_dir`` (atomic per file). Returns
    resource → written CSV path; the paths feed the existing local
    mapping-file entry points, so a fetched pack and a hand-authored pack
    are indistinguishable downstream."""
    mappings, types = fetch_mappings(
        sheet_id, index_source=index_source, timeout=timeout
    )
    os.makedirs(dest_dir, exist_ok=True)
    paths: dict[str, str] = {}
    for resource, df in mappings.items():
        name = _check_component(resource, "resource name")
        path = os.path.join(dest_dir, f"{name}.csv")
        tmp = f"{path}.tmp-{os.getpid()}"  # pid-suffixed: concurrent fetches
        df.to_csv(tmp, index=False)  # into one dest never interleave writes
        os.replace(tmp, path)
        paths[resource] = path
    tpath = os.path.join(dest_dir, "types.json")
    tmp = f"{tpath}.tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(types, fh, indent=1, sort_keys=True)
    os.replace(tmp, tpath)
    return paths
